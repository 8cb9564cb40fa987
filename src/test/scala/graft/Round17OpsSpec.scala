package graft

import graft.operators.{TableFormat, VectorOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 pins: the vector-index delete path (`ann_delete` +
  * [[VectorOps.annIvfLive]]) — the shrink half of IVF maintenance
  * next to `ann_incremental`'s grow half.
  */
class Round17OpsSpec extends AnyFunSuite {
  import TestSpark._

  private val sf = "/root/testdata/sf0.001"
  private def corpus = GraftSession.table(spark, sf, "embeddings")
    .select(col("vec_id").as("id"), col("embedding"))

  test("ann_delete: per-list conservation, ppm/flag arithmetic, determinism") {
    val e = corpus
    val nTotal = e.count()
    val nDead = e.filter(col("id") % 7 === 3).count()
    assert(nDead > 0 && nDead < nTotal)
    val rep = VectorOps.annDelete(spark, sf).collect()
    assert(rep.map(_.getAs[Long]("n_total")).sum == nTotal, "every vector lands in exactly one list")
    assert(rep.map(_.getAs[Long]("n_deleted")).sum == nDead, "every tombstone is accounted once")
    rep.foreach { r =>
      val (t, d, l) = (r.getAs[Long]("n_total"), r.getAs[Long]("n_deleted"), r.getAs[Long]("n_live"))
      val ppm = r.getAs[Long]("deleted_ppm")
      assert(l == t - d)
      assert(ppm == d * 1000000L / t, "floor-division ppm")
      assert(r.getAs[Boolean]("compact") == (ppm >= 300000L), "30% dead-fraction trigger")
    }
    val again = VectorOps.annDelete(spark, sf).collect()
    assert(rep.map(_.toSeq.toVector).toVector == again.map(_.toSeq.toVector).toVector,
      "frozen-quantizer report is deterministic")
  }

  test("tombstone-aware read: no corpse surfaces; undeleted queries keep recall; empty tombstones = plain index") {
    val e = corpus
    val tomb = e.select(col("id")).filter(col("id") % 7 === 3)
    // quantizer frozen on the FULL corpus (the production state at
    // delete time: centroids were trained before the rows died)
    val cs = VectorOps.kmeansCentroids(e, 16)
    val queries = e.filter(col("id") < 30 && !(col("id") % 7 === 3))
    val got = VectorOps.annIvfLive(e, tomb, queries, 5, cs).collect()
    assert(got.nonEmpty)
    assert(!got.exists(_.getAs[Long]("neighbor_id") % 7 == 3),
      "a tombstoned vector must never surface in query results")

    // recall on undeleted queries vs exact brute force over the LIVE
    // corpus — the suite-wide 0.7 floor the other indexes pin
    val live = e.join(tomb, Seq("id"), "left_anti")
    val truth = VectorOps.annBruteforce(live, queries, 5)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = got.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .count(truth.contains)
    assert(hits.toDouble / truth.size >= 0.7,
      s"recall@5 after deletes: $hits/${truth.size}")

    // the anti-join read path is a no-op under an empty tombstone set
    val none = tomb.filter(lit(false))
    val a = VectorOps.annIvfLive(e, none, queries, 5, cs).collect().map(_.toSeq.toVector).toSet
    val b = VectorOps.annIvf(e, queries, 5, 8, cs).collect().map(_.toSeq.toVector).toSet
    assert(a == b, "empty tombstones must reproduce the plain index read exactly")
  }

  test("ann_ivf_indexed: partition-pruned list read, results equal the inline IVF under the same frozen centroids") {
    val e = corpus
    val (lists, cents) = VectorOps.ivfIndexTable(spark, sf)
    // the artifact is physically partitioned by list
    val scratch = graft.sources.Ingest.scratchDir(spark)
    val dirKey = java.security.MessageDigest.getInstance("SHA-256")
      .digest(sf.getBytes("UTF-8")).take(12).map("%02x".format(_)).mkString
    val listDirs = new java.io.File(s"$scratch/ivf_index_16_$dirKey/lists")
      .listFiles().map(_.getName).filter(_.startsWith("centroid_id="))
    assert(listDirs.length == cents.count(), "one directory per inverted list")

    val got = VectorOps.annIvfIndexed(spark, sf)
    // the probed-list IN predicate must land as a STATIC partition
    // filter (INSET) on the lists scan — the read is the probed
    // fraction of the index, not the corpus. A 1-query 4-probe batch
    // must prune to at most 4 of the 16 list directories.
    def listScanFilters(df: org.apache.spark.sql.DataFrame): String = {
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val ls = s.linesIterator.toVector
      ls.zipWithIndex.collect {
        case (l, i) if l.contains("PartitionFilters") &&
          ls.take(i).reverse.find(_.contains("Location")).exists(_.contains("/lists")) => l
      }.mkString("\n")
    }
    val narrow = VectorOps.annIvfIndexed(spark, sf, e.filter(col("id") === 0), 5, 4)
    val nf = listScanFilters(narrow)
    // Spark renders a small set as `IN (a,b,...)`, a large one as
    // `INSET a, b, ...` — accept either, then count the values
    val inset =
      "\\bIN \\(([^)]*)\\)".r.findFirstMatchIn(nf)
        .map(_.group(1).split(",").count(t => t.trim.nonEmpty && t.trim.forall(_.isDigit)))
        .orElse("INSET ([^\\]]*)".r.findFirstMatchIn(nf)
          .map(_.group(1).split(", ").count(t => t.nonEmpty && t.forall(_.isDigit))))
        .getOrElse(-1)
    assert(inset >= 1 && inset <= 4, s"1-query 4-probe batch must read <= 4 lists, got $inset:\n$nf")

    // same frozen centroids → identical candidates → identical top-k
    val queries = e.filter(col("id") < 20)
    val want = VectorOps.annIvf(e, queries, 5, 8, cents)
      .collect().map(_.toSeq.toVector).toVector
    assert(got.collect().map(_.toSeq.toVector).toVector == want,
      "indexed read must equal the inline IVF bit-for-bit")
    assert(lists.count() == e.count(), "every vector in exactly one list")
  }

  test("multimodal_afp: a planted time-shifted copy matches at the exact frame offset; unrelated audio does not") {
    import spark.implicits._
    // doc ids ≡ 1 (mod 3) are 'aud'. Base: 12 frames of varied bytes.
    // Copy: the SAME bytes prepended with exactly 2 frames of padding —
    // every landmark shifts by 2 frames, so the offset histogram piles
    // up at base−copy = −2. Unrelated: disjoint content.
    val base = (0 until 768).map(i => ('a' + (i * 7 + i * i % 13) % 26).toChar).mkString
    val copy = (" " * (2 * graft.multimodal.Multimodal.AfpFrameSamples)) + base
    val other = (0 until 768).map(i => ('A' + (i * 11 + 3) % 26).toChar).mkString
    val df = Seq((1L, base, "s"), (4L, copy, "s"), (7L, other, "s"))
      .toDF("doc_id", "text", "source")
    val tmp = java.nio.file.Files.createTempDirectory("afp").toString
    try {
      df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val rows = graft.multimodal.Multimodal.multimodalAfp(spark, tmp).collect()
      val hit = rows.find(r => r.getAs[Long]("doc_a") == 1L && r.getAs[Long]("doc_b") == 4L)
      assert(hit.isDefined, s"planted copy must match: ${rows.toSeq}")
      assert(hit.get.getAs[Long]("best_offset") == -2L,
        "offset histogram must recover the exact 2-frame shift")
      assert(hit.get.getAs[Long]("n_aligned") >= 10L,
        "most of the copy's landmarks align at the true offset")
      assert(!rows.exists(r => r.getAs[Long]("doc_b") == 7L || r.getAs[Long]("doc_a") == 7L),
        "unrelated audio must not reach the aligned threshold")
    } finally {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles).foreach(_.foreach(rm)); p.delete(): Unit
      }
      rm(new java.io.File(tmp))
    }
  }

  test("emb_hubness: histogram replays exactly from the graph artifact and covers every vector") {
    val n = corpus.count()
    val g = VectorOps.knnGraphTable(spark, sf).collect()
      .map(r => r.getAs[Long]("neighbor_id"))
    val indeg = g.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val wantBands = indeg.values.groupBy(d => math.min(d, 10L)).view.mapValues(_.size.toLong).toMap
    val zero = n - indeg.size
    val rep = VectorOps.embHubness(spark, sf).collect()
      .map(r => r.getAs[Long]("band") -> r.getAs[Long]("n_nodes")).toMap
    wantBands.foreach { case (b, c) => assert(rep(b) == c, s"band $b") }
    if (zero > 0) assert(rep(0L) == zero, "unreferenced vectors are the 0 band")
    assert(rep.values.sum == n, "every vector is in exactly one band")
  }

  test("q_bitemporal: the two time axes are independent (retroactive corrections and effective-dated deletes)") {
    import org.apache.spark.sql.functions.{col, floor, lit}
    val rows = graft.operators.TableFormat.qBitemporal(spark, sf).collect()
      .map(r => (r.getAs[Long]("tx_asof"), r.getAs[Long]("valid_asof")) ->
        (r.getAs[Long]("n_live"), r.getAs[Long]("sum_cents"))).toMap
    val o = GraftSession.table(spark, sf, "orders")
      .select(col("o_orderkey").as("key"),
        floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("cents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val base = o.map(_._2).sum
    val corr = o.filter(_._1 % 7 == 0).map(t => t._2 / 10).sum
    val delSum = o.filter(_._1 % 11 == 0)
      .map(t => t._2 + (if (t._1 % 7 == 0) t._2 / 10 else 0L)).sum
    val n = o.length.toLong
    val nDel = o.count(_._1 % 11 == 0).toLong
    // T=20: correction commit not yet visible (tx axis)
    assert(rows((20L, 20L)) == (n, base))
    // T=40, V=10: commit visible but world-time precedes its validity
    assert(rows((40L, 10L)) == (n, base))
    // T=40, V=20: correction applies
    assert(rows((40L, 20L)) == (n, base + corr))
    // T=60, V=20: delete commit visible but effective only from day 40
    assert(rows((60L, 20L)) == (n, base + corr))
    // T=60, V=45: deletes hide their keys (corrected cents where both hit)
    assert(rows((60L, 45L)) == (n - nDel, base + corr - delSum))
  }

  test("q_dp_counts: exact mechanism replay, zero-clamp, geometric-difference noise, seed sensitivity") {
    import org.apache.spark.sql.functions.{col, count, lit}
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    // trailing-zero count of a 28-bit field, capped at 28 by the OR
    def geo(v: Long): Long = {
      val x = (v % 268435456L) | 268435456L
      (63 - java.lang.Long.numberOfLeadingZeros(x & -x)).toLong
    }
    def noise(seed: String, key: String): Long = {
      val h = java.lang.Long.parseLong(md5hex(seed + "|" + key).take(15), 16)
      geo(h) - geo(h / 268435456L)
    }
    // full mechanism replay against the released table (test seed)
    val truth = GraftSession.table(spark, sf, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getAs[Long]("n")).toMap
    val rel = graft.operators.Relational.qDpCounts(spark, sf).collect()
    assert(rel.length == truth.size)
    rel.foreach { r =>
      val k = (r.getInt(0), r.getString(1))
      val want = math.max(truth(k) + noise("dpseed1", s"${k._1}|${k._2}"), 0L)
      assert(r.getAs[Long]("n_noisy") == want, s"mechanism replay diverges for $k")
    }
    // the mechanism is the TRUE two-sided geometric(alpha=1/2),
    // P(z) = (1/3)2^-|z| (difference of two iid geometric(1/2)
    // draws): over many keys P(noise=0) -> 1/3, E|noise| -> 4/3,
    // signs balanced. P(0)=1/3 is the load-bearing check — the old
    // sign-bit construction had P(0)=1/2 and only satisfied eps=ln 4.
    val ns = (0 until 20000).map(i => noise("dpseed1", s"k$i"))
    val p0 = ns.count(_ == 0).toDouble / ns.size
    assert(math.abs(p0 - 1.0 / 3) < 0.02, s"P(noise=0) = $p0")
    val meanAbs = ns.map(math.abs).sum.toDouble / ns.size
    assert(math.abs(meanAbs - 4.0 / 3) < 0.05, s"E|noise| = $meanAbs")
    val pPos = ns.count(_ > 0).toDouble / ns.filter(_ != 0).size
    assert(math.abs(pPos - 0.5) < 0.03, s"sign balance = $pPos")
    // adjacent-output ratio: for every z in the observable range,
    // count(z)/count(z+1) must hover near 2, never near 4 — the
    // distributional form of the eps = ln 2 claim
    val byZ = ns.groupBy(identity).view.mapValues(_.size.toDouble).toMap
    (-2 to 1).foreach { z =>
      val ratio = byZ(z.toLong) / byZ(z.toLong + 1)
      val want = if (z >= 0) 2.0 else 0.5
      assert(math.abs(ratio / want - 1.0) < 0.2, s"P($z)/P(${z + 1}) = $ratio, want ~$want")
    }
    // seed sensitivity: a different seed changes the draw for at
    // least one group; the same seed replays bit-exactly
    val again = graft.operators.Relational.qDpCounts(spark, sf).collect()
    assert(rel.map(_.toString).sorted.sameElements(again.map(_.toString).sorted),
      "same seed must replay exactly")
    val other = graft.operators.Relational.qDpCountsSeeded(spark, sf, "release-2026-08").collect()
    val a = rel.map(r => ((r.getInt(0), r.getString(1)), r.getAs[Long]("n_noisy"))).toMap
    val diffs = other.count(r => a((r.getInt(0), r.getString(1))) != r.getAs[Long]("n_noisy"))
    assert(diffs > 0, "a different seed must change the released noise")
  }

  test("q_compact_exec: payload conserved, one file per bin, files are sorted contiguous key ranges") {
    val rep = TableFormat.qCompactExec(spark, sf).collect()
    // the exec op's own 64 KB consolidation target (qCompactPlan's
    // 1000-byte demo target would mean one file per document)
    val plan = TableFormat.compactPlanOn(
      GraftSession.table(spark, sf, "documents")
        .select(col("source"), col("doc_id"), col("n_chars").as("bytes")),
      65536L).collect()

    // the executed layout must reproduce the plan bin-for-bin:
    // same (source, bin) set, same counts/bytes/key ranges
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("source"), r.getAs[Long]("bin"))
    val planBy = plan.map(r => key(r) ->
      (r.getAs[Long]("n_files"), r.getAs[Long]("bin_bytes"),
        r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc"))).toMap
    assert(rep.length == plan.length, "file count = bin count")
    rep.foreach { r =>
      assert(r.getAs[Long]("n_phys_files") == 1L, s"bin ${key(r)} spans multiple files")
      val p = planBy(key(r))
      assert((r.getAs[Long]("n_docs"), r.getAs[Long]("bin_bytes"),
        r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc")) == p,
        s"bin ${key(r)} diverged from the plan")
    }
    // non-overlapping contiguous ranges per source
    rep.groupBy(_.getAs[String]("source")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("bin"))
      sorted.sliding(2).foreach {
        case Array(a2, b2) =>
          assert(a2.getAs[Long]("last_doc") < b2.getAs[Long]("first_doc"),
            "key ranges must not overlap across output files")
        case _ => ()
      }
    }

    // payload conservation + within-file clustering, read from the
    // actual rewritten files
    val out = {
      // same deterministic path the op writes (scratch + dir hash)
      val scratch = graft.sources.Ingest.scratchDir(spark)
      s"$scratch/documents_compacted_${Integer.toHexString(sf.hashCode)}"
    }
    val orig = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), md5(col("text")).as("h"))
    val back = spark.read.parquet(out).select(col("doc_id"), md5(col("text")).as("h"))
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty,
      "compaction must conserve every payload byte")
    val files = spark.read.parquet(out)
      .select(input_file_name().as("f"), col("doc_id")).collect()
      .groupBy(_.getString(0)).values
    files.foreach { rows =>
      val ids = rows.map(_.getLong(1)).toVector
      assert(ids == ids.sorted, "within-file doc_id order must survive (clustering preserved)")
    }
  }
}
