package graft

import graft.operators.{Graph, Pipeline, Relational, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round12OpsSpec extends AnyFunSuite {
  import TestSpark._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("text_adaptive_filter: plain-Scala histogram-threshold replay, ≥75% kept everywhere") {
    val corpus = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[String]("text")))
    def scorePpm(text: String): Long = {
      val toks = text.split(' ')
      val n = toks.length.toLong
      val u = toks.distinct.length.toLong
      if (n >= 50) u * 1000000L / n else u * 20000L
    }
    val bySource = corpus.groupBy(_._2)
    val want = bySource.map { case (src, ds) =>
      val scored = ds.map(d => (d._1, scorePpm(d._3)))
      val n = scored.length.toLong
      val sorted = scored.map(_._2).sorted
      // smallest score whose cumulative count covers ceil(n/4)
      val thr = sorted.zipWithIndex.collectFirst {
        case (s, i) if (i + 1) * 4 >= n => s
      }.get
      val kept = scored.filter(_._2 >= thr)
      src -> ((thr, n, kept.length.toLong, kept.map(_._1).sum))
    }
    val rows = TextAnalysis.textAdaptiveFilter(spark, sf).collect()
    assert(rows.length == bySource.size)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val (thr, n, nKept, idSum) = want(src)
      assert(r.getAs[Long]("threshold_ppm") == thr, s"$src threshold")
      assert(r.getAs[Long]("n_total") == n, s"$src n_total")
      assert(r.getAs[Long]("n_kept") == nKept, s"$src n_kept")
      assert(r.getAs[Long]("kept_id_sum") == idSum, s"$src kept_id_sum")
      // the gate drops AT MOST a quartile (ties at the cut survive)
      val share = r.getAs[Long]("kept_share_ppm")
      assert(share >= 750000L && share <= 1000000L, s"$src share=$share")
      // split-division share replay
      val wantShare = (nKept * 1000 / n) * 1000 + (nKept * 1000 % n) * 1000 / n
      assert(share == wantShare, s"$src share algebra")
    }
  }

  test("sample_curriculum: bucketed-offset positions equal the naive global sort") {
    val corpus = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    def band(text: String): Long = {
      val toks = text.split(' ')
      val n = toks.length.toLong
      val u = toks.distinct.length.toLong
      val ppm = if (n >= 50) u * 1000000L / n else u * 20000L
      9L - math.min(9L, ppm / 100000L)
    }
    // the naive formulation the distributed plan must reproduce exactly
    val want = corpus
      .map { case (id, text) => (id, band(text), md5hex(s"$id:curriculum")) }
      .sortBy { case (id, b, h) => (b, h, id) }
      .zipWithIndex
      .map { case ((id, b, _), i) => id -> ((b, i + 1L, i.toLong / 64)) }
      .toMap
    val rows = Pipeline.sampleCurriculum(spark, sf).collect()
    assert(rows.length == corpus.length, "every document gets a position")
    rows.foreach { r =>
      val (b, pos, shard) = want(r.getAs[Long]("doc_id"))
      assert(r.getAs[Long]("band") == b)
      assert(r.getAs[Long]("global_pos") == pos)
      assert(r.getAs[Long]("shard") == shard)
    }
    // curriculum invariants: contiguous positions, band monotone along them
    val byPos = rows.sortBy(_.getAs[Long]("global_pos"))
    assert(byPos.map(_.getAs[Long]("global_pos")).toSeq == (1L to corpus.length).toSeq)
    val bands = byPos.map(_.getAs[Long]("band")).toSeq
    assert(bands == bands.sorted, "training order must never regress to an easier band")
  }

  test("q_join_card: sketch replay, AGM upper bound, split-division ppm") {
    val counts = GraftSession.table(spark, sf, "events")
      .select(col("user_id")).collect().map(_.getAs[Long]("user_id"))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val exact = BigInt(counts.values.map(c => c * c).sum)
    val byBucket = counts.toSeq
      .groupBy { case (u, _) =>
        java.lang.Long.parseLong(md5hex(s"$u:joincard").take(8), 16) % 256
      }
      .view.mapValues(_.map(_._2).sum).toMap
    val est = byBucket.values.map(nb => BigInt(nb) * BigInt(nb)).sum
    val r = Relational.qJoinCard(spark, sf).collect().head
    assert(r.getAs[Long]("n_keys") == counts.size.toLong)
    assert(r.getAs[Long]("n_buckets") == byBucket.size.toLong)
    // pair counts are decimal-exact STRINGs (DECIMAL(38,0) parquet
    // materializes as object(Decimal) vs DuckDB's float64 under the
    // driver's pandas hash; a string is identical in both engines)
    assert(r.schema("exact_pairs").dataType == org.apache.spark.sql.types.StringType)
    assert(r.schema("est_pairs").dataType == org.apache.spark.sql.types.StringType)
    assert(BigInt(r.getAs[String]("exact_pairs")) == exact)
    assert(BigInt(r.getAs[String]("est_pairs")) == est)
    // the bucketed product can only merge keys, never split them
    assert(est >= exact, "sketch must upper-bound the true join size")
    val wantPpm = ((est * 1000 / exact) * 1000 + (est * 1000 % exact) * 1000 / exact - 1000000).toLong
    assert(r.getAs[Long]("over_ppm") == wantPpm)
  }

  test("q_neighborhood: plain-Scala FM register propagation replays every round") {
    val o = GraftSession.table(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val l = GraftSession.table(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val pairs = o.join(l, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("c"), r.getAs[Long]("s")))
    val adj = (pairs.map(p => p._1 -> p._2) ++ pairs.map(p => p._2 -> p._1))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    def init(v: Long): Long = {
      val h = java.lang.Long.parseLong(md5hex(s"$v:anf").take(8), 16)
      if (h == 0L) 1L << 32 else h & -h
    }
    var reg: Map[Long, Long] = adj.keys.map(v => v -> init(v)).toMap
    def estRow(t: Int): (Long, Long) = {
      val sum2b = reg.valuesIterator.map(r => (r + 1) & ~r).sum
      (sum2b, (sum2b / 77351) * 100000 + (sum2b % 77351) * 100000 / 77351)
    }
    var want = Vector(estRow(0))
    for (_ <- 1 to 4) {
      reg = reg.map { case (v, r) =>
        v -> adj(v).foldLeft(r)((acc, w) => acc | reg(w))
      }
      want :+= estRow(want.length)
    }
    val rows = Graph.qNeighborhood(spark, sf).collect().sortBy(_.getAs[Int]("t"))
    assert(rows.length == 5)
    rows.zipWithIndex.foreach { case (r, t) =>
      assert(r.getAs[Int]("t") == t)
      assert(r.getAs[Long]("sum_2b") == want(t)._1, s"round $t register sum")
      assert(r.getAs[Long]("est_reach") == want(t)._2, s"round $t estimate")
    }
    // neighborhoods only grow: N(t) is monotone until the graph saturates
    val ests = rows.map(_.getAs[Long]("est_reach")).toSeq
    assert(ests == ests.sorted, "neighborhood function must be non-decreasing")
    assert(ests.last > ests.head, "4 hops must reach beyond the nodes themselves")
  }

  test("q_wmedian: plain-Scala weighted-quartile replay, quartiles ordered") {
    val li = GraftSession.table(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("qty"),
        (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[Long]("qty"), r.getAs[Long]("cents")))
    val want = li.groupBy(_._1).map { case (flag, rows) =>
      val hist = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
      val tot = hist.map(_._2).sum
      val cums = hist.map(_._1).zip(hist.scanLeft(0L)(_ + _._2).tail)
      def pick(num: Long, den: Long): Long =
        cums.collectFirst { case (q, c) if c * den >= tot * num => q }.get
      flag -> ((tot, pick(1, 4), pick(1, 2), pick(3, 4)))
    }
    val rows = Relational.qWmedian(spark, sf).collect()
    assert(rows.length == want.size)
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val (tot, p25, p50, p75) = want(flag)
      assert(r.getAs[Long]("total_cents") == tot, s"$flag total")
      assert(r.getAs[Long]("wp25") == p25, s"$flag wp25")
      assert(r.getAs[Long]("wp50") == p50, s"$flag wp50")
      assert(r.getAs[Long]("wp75") == p75, s"$flag wp75")
      assert(p25 <= p50 && p50 <= p75, s"$flag quartiles must be ordered")
    }
  }

  test("q_clustering: coefficients replay from q_triangles' counts and plain-Scala degrees") {
    def asL(r: org.apache.spark.sql.Row, c: String): Long = r.getAs[Number](c).longValue()
    val triCounts = Graph.qTriangles(spark, sf).collect()
      .map(r => asL(r, "nationkey") -> asL(r, "n_triangles")).toMap
    // plain-Scala degree replay on the same deduped trade-graph edges
    val o = GraftSession.table(spark, sf, "orders").select(col("o_orderkey"), col("o_custkey"))
    val l = GraftSession.table(spark, sf, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val c = GraftSession.table(spark, sf, "customer").select(col("c_custkey"), col("c_nationkey"))
    val s = GraftSession.table(spark, sf, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val edges = o.join(l, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .select(least(col("c_nationkey"), col("s_nationkey")).as("u"),
        greatest(col("c_nationkey"), col("s_nationkey")).as("v"))
      .distinct().collect()
      .map(r => (asL(r, "u"), asL(r, "v")))
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rows = Graph.qClustering(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(asL(_, "nationkey")).toSet == deg.filter(_._2 >= 2).keySet)
    rows.foreach { r =>
      val v = asL(r, "nationkey")
      val d = deg(v)
      val tri = triCounts.getOrElse(v, 0L)
      assert(asL(r, "deg") == d, s"node $v degree")
      assert(asL(r, "n_tri") == tri, s"node $v triangles")
      val cc = asL(r, "cc_ppm")
      assert(cc == 2 * tri * 1000000 / (d * (d - 1)), s"node $v cc")
      assert(cc >= 0 && cc <= 1000000, s"node $v cc out of range")
    }
  }
}
