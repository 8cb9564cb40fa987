package graft

import graft.operators.{Pipeline, Relational, TableFormat}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round9OpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // ----------------------------------------------------- pipeline_lineage

  test("pipeline_lineage partitions the corpus and its kept row equals pipeline_e2e") {
    val lineage = Pipeline.pipelineLineage(spark, sf).collect()
      .map(r => r.getAs[String]("disposition") -> r.getAs[Long]("n_docs")).toMap
    val corpus = GraftSession.table(spark, sf, "documents").count()
    assert(lineage.values.sum == corpus,
      s"dispositions must partition the corpus: ${lineage.values.sum} vs $corpus")
    val kept = lineage.getOrElse("5_kept:kept", 0L)
    assert(kept == Pipeline.pipelineE2e(spark, sf).count(),
      "the 5_kept row must equal the e2e survivor count")
    // every disposition label belongs to a known stage
    assert(lineage.keys.forall(d => d.matches("^[1-5]_(filter|dedup|decontam|sample|kept):.*")))
    // stages are reachable on this corpus: at least filter drops + kept
    assert(lineage.keys.exists(_.startsWith("1_filter:")) && kept > 0)
  }

  // -------------------------------------------------------- q_time_travel

  test("q_time_travel equals a plain-Scala commit-log replay at sf0.001") {
    val base = GraftSession.table(spark, sf, "orders")
      .select(col("o_orderkey"), floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .as[(Long, Long)].collect().toMap
    def snapshot(v: Int): (Long, Long) = {
      val live = base.keys.filter(k => v < 3 || k % 11 != 0)
      val cents = live.toSeq.map { k =>
        val c = base(k)
        if (v >= 2 && k % 7 == 0) c + c / 10 else c
      }
      (live.size.toLong, cents.sum)
    }
    val got = TableFormat.qTimeTravel(spark, sf).collect()
      .map(r => r.getAs[Long]("version") -> ((r.getAs[Long]("n_live"), r.getAs[Long]("sum_cents"))))
      .toMap
    assert(got.keySet == Set(1L, 2L, 3L))
    (1 to 3).foreach(v => assert(got(v.toLong) == snapshot(v), s"version $v"))
    // v3 must show the deletes, v2 the re-pricing
    assert(got(3L)._1 < got(1L)._1 && got(2L)._2 > got(1L)._2)
  }

  // --------------------------------------------------------- q_snapshot_diff

  test("q_snapshot_diff applied to the v1 state reproduces the v3 snapshot") {
    val diff = TableFormat.qSnapshotDiff(spark, sf).collect()
      .map(r => r.getAs[String]("change") ->
        ((r.getAs[Long]("n_keys"), r.getAs[Long]("cents_delta")))).toMap
    val tt = TableFormat.qTimeTravel(spark, sf).collect()
      .map(r => r.getAs[Long]("version") ->
        ((r.getAs[Long]("n_live"), r.getAs[Long]("sum_cents")))).toMap
    // incremental-consumer contract: v1 + diff = v3
    val deleted = diff.getOrElse("deleted", (0L, 0L))
    val inserted = diff.getOrElse("inserted", (0L, 0L))
    assert(tt(1L)._1 - deleted._1 + inserted._1 == tt(3L)._1)
    assert(tt(1L)._2 + diff.values.map(_._2).sum == tt(3L)._2)
    // this log never inserts new keys after v1
    assert(inserted._1 == 0L)
    assert(diff.contains("updated") && diff.contains("deleted") && diff.contains("unchanged"))
  }

  // ------------------------------------------------------------ lake_gc_plan

  test("lake_gc_plan equals a plain-Scala refcount replay at sf0.001") {
    import graft.operators.LakeOps
    val docsRows = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val byHash = docsRows.groupBy(d => md5hex(d._2))
    val blobs = byHash.map { case (h, xs) =>
      val minId = xs.map(_._1).min
      (h, xs.head._2, minId % 7 != 0)
    }.toSeq
    def slices(t: String): Seq[String] = {
      val n = math.max((t.length - 1) / 256, 0) + 1
      (0 until n).map(i => t.slice(i * 256, i * 256 + 256))
    }
    val refs = blobs.flatMap { case (_, t, live) => slices(t).map(s => (md5hex(s), s, live)) }
    val rc = refs.groupBy(_._1).map { case (ch, xs) =>
      (ch, xs.head._2.getBytes("UTF-8").length.toLong, xs.count(_._3))
    }
    val want = Map(
      "a_live_blobs" -> ((blobs.count(_._3).toLong,
        blobs.filter(_._3).map(_._2.getBytes("UTF-8").length.toLong).sum)),
      "b_tombstoned_blobs" -> ((blobs.count(!_._3).toLong,
        blobs.filterNot(_._3).map(_._2.getBytes("UTF-8").length.toLong).sum)),
      "c_retained_chunks" -> ((rc.count(_._3 > 0).toLong,
        rc.filter(_._3 > 0).map(_._2).sum)),
      "d_reclaimable_chunks" -> ((rc.count(_._3 == 0).toLong,
        rc.filter(_._3 == 0).map(_._2).sum)),
    )
    val got = LakeOps.lakeGcPlan(spark, sf).collect()
      .map(r => r.getAs[String]("status") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("bytes")))).toMap
    assert(got == want)
    // gc must never reclaim a chunk a live blob still references
    assert(got("c_retained_chunks")._1 > 0 && got("a_live_blobs")._1 > 0)
  }

  // ------------------------------------------------------------ q_zonemap

  test("q_zonemap pruning is lossless and the stats cover the table") {
    val rows = TableFormat.qZonemap(spark, sf).collect()
    val orders = GraftSession.table(spark, sf, "orders")
    assert(rows.map(_.getAs[Long]("n_rows")).sum == orders.count())
    // a pruned zone must contain zero matching rows (stats never lie)
    rows.filter(_.getAs[Boolean]("pruned")).foreach { r =>
      assert(r.getAs[Long]("n_matching") == 0L, s"pruned zone ${r.getAs[Long]("zone_id")}")
    }
    // the audit total equals the predicate's true selectivity
    val d1 = orders.agg(max(expr("unix_micros(o_orderdate) DIV 86400000000"))).head.getLong(0)
    val exact = orders
      .filter(expr(s"unix_micros(o_orderdate) DIV 86400000000 >= ${d1 - 90}"))
      .count()
    assert(rows.map(_.getAs[Long]("n_matching")).sum == exact)
    rows.foreach(r => assert(r.getAs[Long]("min_day") <= r.getAs[Long]("max_day")))
  }

  // ---------------------------------------------------------------- q_cms

  test("q_cms equals a plain-Scala count-min replay and never underestimates") {
    val users = GraftSession.table(spark, sf, "events")
      .select(col("user_id")).as[Long].collect()
    val cells = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
    def bucket(r: Long, u: Long): Long = {
      val h = java.lang.Long.parseLong(md5hex(s"$r:$u").take(8), 16)
      ((h % TableFormat.CmsWidth) + TableFormat.CmsWidth) % TableFormat.CmsWidth
    }
    for (u <- users; r <- 0L until TableFormat.CmsDepth.toLong)
      cells((r, bucket(r, u))) = cells.getOrElse((r, bucket(r, u)), 0L) + 1
    val trueN = users.groupBy(identity).map { case (u, xs) => u -> xs.length.toLong }
    val top = trueN.toSeq.sortBy { case (u, n) => (-n, u) }.take(20)
    val got = TableFormat.qCms(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("true_n"), r.getAs[Long]("est_n"), r.getAs[Long]("overestimate"))))
      .toMap
    assert(got.keySet == top.map(_._1).toSet)
    top.foreach { case (u, n) =>
      val est = (0L until TableFormat.CmsDepth.toLong).map(r => cells((r, bucket(r, u)))).min
      assert(got(u) == ((n, est, est - n)), s"user $u")
      assert(est >= n, "CMS must never underestimate")
      // one-sided error bound: a cell holds at most the full stream
      assert(est - n <= users.length.toLong)
    }
  }

  // ------------------------------------------------------------ q_lateness

  test("q_lateness equals a plain-Scala running-high-watermark replay") {
    val ev = GraftSession.table(spark, sf, "events")
      .select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("us"))
      .as[(String, Long, Long)].collect()
    val want = ev.groupBy(_._1).map { case (t, xs) =>
      val inArrival = xs.sortBy(_._2)
      var high = Long.MinValue
      val lates = inArrival.map { case (_, _, us) =>
        high = math.max(high, us); high - us
      }
      val n = lates.length.toLong
      val sorted = lates.sorted
      val p99 = sorted(((99 * n + 99) / 100).toInt - 1)
      t -> ((n, lates.count(_ > 0).toLong, p99, sorted.last))
    }
    val got = Relational.qLateness(spark, sf).collect().map { r =>
      r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("n_late"),
          r.getAs[Long]("p99_late_us"), r.getAs[Long]("max_late_us")))
    }.toMap
    assert(got == want)
    // the watermark ordering the audit exists to report
    got.values.foreach { case (n, nLate, p99, mx) =>
      assert(p99 <= mx && nLate <= n && p99 >= 0)
    }
  }

  // --------------------------------------------------------- dedup_profile

  test("dedup_profile equals a plain-Scala cluster-size histogram replay") {
    import graft.operators.Dedup
    val texts = GraftSession.table(spark, sf, "documents")
      .select(col("text")).as[String].collect()
    val clusters = texts.groupBy(identity).toSeq.map { case (t, xs) =>
      (xs.length.toLong, t.getBytes("UTF-8").length.toLong)
    }
    val want = clusters.groupBy(_._1).map { case (s, xs) =>
      s -> ((xs.length.toLong, s * xs.length, xs.map(x => (s - 1) * x._2).sum))
    }
    val got = Dedup.dedupProfile(spark, sf).collect()
      .map(r => r.getAs[Long]("cluster_size") ->
        ((r.getAs[Long]("n_clusters"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("reclaimable_bytes")))).toMap
    assert(got == want)
    // the histogram partitions the corpus
    assert(got.values.map(_._2).sum == texts.length.toLong)
    // singleton clusters reclaim nothing
    got.get(1L).foreach { case (_, _, bytes) => assert(bytes == 0L) }
  }

  // ----------------------------------------------------------------- q_ppr

  test("personalizedPageRank: hand graph, teleport returns only to the seed") {
    import graft.operators.Graph
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 2L)).toDF("src", "dst")
    val out = Graph.personalizedPageRank(edges, Seq(1L), iterations = 2, scale = 1000000L)
      .collect().map(r => r.getAs[Long]("node_id") -> r.getAs[Long]("mass")).toMap
    // m1: 1 -> 150000 (teleport only), 2 -> 850000, 3 -> 0
    // m2: 1 -> 150000 + (85*850000/100)/1 = 872500; 2 -> (85*150000/100)/1
    //     = 127500; 3 -> 0 (no in-edges, not a seed)
    assert(out == Map(1L -> 872500L, 2L -> 127500L, 3L -> 0L))
  }

  test("q_ppr concentrates mass at the seed cohort") {
    import graft.operators.Graph
    val rows = Graph.qPpr(spark, sf).collect()
    val byId = rows.map(r => r.getAs[Long]("node_id") -> r.getAs[Long]("mass")).toMap
    val seeds = Seq(2L, 4L, 6L).filter(byId.contains)
    assert(seeds.nonEmpty)
    // every seed holds at least its teleport mass; total mass is positive
    seeds.foreach(s => assert(byId(s) >= 150000000000L))
    assert(rows.map(_.getAs[Long]("mass")).sum > 0)
  }

  // --------------------------------------------------------------- q_chisq

  test("q_chisq equals a plain-Scala contingency replay with exact micro-quantization") {
    val rows = GraftSession.table(spark, sf, "orders")
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .as[(String, String)].collect()
    val n = rows.length.toLong
    val cells = rows.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val rN = rows.groupBy(_._1).map { case (k, xs) => k -> xs.length.toLong }
    val cN = rows.groupBy(_._2).map { case (k, xs) => k -> xs.length.toLong }
    val want = cells.map { case ((s, p), o) =>
      val num = BigInt(o * n - rN(s) * cN(p))
      val contrib = math.floor((num * num).toDouble * 1000000.0 /
        (n.toDouble * rN(s) * cN(p))).toLong
      val expected = math.floor(rN(s).toDouble * cN(p) * 1000000.0 / n).toLong
      (s, p) -> ((o, expected, contrib))
    }
    val got = Relational.qChisq(spark, sf).collect()
      .map(r => (r.getAs[String]("status"), r.getAs[String]("prio")) ->
        ((r.getAs[Long]("o_n"), r.getAs[Long]("expected_micro"),
          r.getAs[Long]("chisq_contrib_micro")))).toMap
    assert(got == want)
    // the observed counts partition the table
    assert(got.values.map(_._1).sum == n)
  }

  // ---------------------------------------------------- q_csv_roundtrip

  test("q_csv_roundtrip preserves the flat projection exactly") {
    val direct = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), md5(col("text")).as("m"), col("n_chars"))
      .as[(Long, String, Long)].collect().toSet
    val rt = sources.Ingest.qCsvRoundtrip(spark, sf)
      .select(col("doc_id"), col("text_md5"), col("n_chars"))
      .as[(Long, String, Long)].collect().toSet
    assert(rt == direct)
  }

  // ------------------------------------------------------- q_txn_conflict

  test("q_txn_conflict equals a plain-Scala write-set intersection replay") {
    val base = GraftSession.table(spark, sf, "orders")
      .select(col("o_orderkey"), floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .as[(Long, Long)].collect()
    def cls(k: Long): Option[String] =
      if (k % 77 == 0) Some("conflict")
      else if (k % 7 == 0) Some("a_only")
      else if (k % 11 == 0) Some("b_only")
      else None
    val want = base.flatMap { case (k, c) => cls(k).map(v => (v, c)) }
      .groupBy(_._1).map { case (v, xs) => v -> ((xs.length.toLong, xs.map(_._2).sum)) }
    val got = TableFormat.qTxnConflict(spark, sf).collect()
      .map(r => r.getAs[String]("verdict") ->
        ((r.getAs[Long]("n_keys"), r.getAs[Long]("cents_at_stake")))).toMap
    assert(got == want)
    assert(got.contains("conflict"), "the %77 overlap must exist at this scale")
  }

  // -------------------------------------------------------------- q_drift

  test("q_drift equals a plain-Scala two-halves replay") {
    val rows = GraftSession.table(spark, sf, "orders")
      .select(col("o_orderstatus"), col("o_orderpriority"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
        expr("unix_micros(o_orderdate) DIV 86400000000").as("day"))
      .as[(String, String, Long, Long)].collect()
    val mid = (rows.map(_._4).min + rows.map(_._4).max) / 2
    val halves = rows.groupBy(r => if (r._4 <= mid) "old" else "new")
    def stats(h: Seq[(String, String, Long, Long)]): Map[String, Long] = {
      def cat(vs: Seq[String], p: String): Map[String, Long] = {
        val cnt = vs.groupBy(identity).map(_._2.length.toLong)
        Map(s"${p}_ndv" -> cnt.size.toLong,
          s"${p}_top_share_ppm" -> cnt.max * 1000000L / vs.length)
      }
      cat(h.map(_._1), "status") ++ cat(h.map(_._2), "prio") ++ Map(
        "cents_mean" -> h.map(_._3).sum / h.length,
        "cents_min" -> h.map(_._3).min,
        "cents_max" -> h.map(_._3).max)
    }
    val old = stats(halves("old")); val nw = stats(halves("new"))
    val got = Relational.qDrift(spark, sf).collect()
      .map(r => r.getAs[String]("metric") ->
        ((r.getAs[Long]("old_v"), r.getAs[Long]("new_v"), r.getAs[Boolean]("drift")))).toMap
    assert(got.keySet == old.keySet)
    old.keySet.foreach { m =>
      assert(got(m)._1 == old(m) && got(m)._2 == nw(m), s"metric $m")
      assert(got(m)._3 == (math.abs(nw(m) - old(m)) * 10 > math.abs(old(m))), s"flag $m")
    }
  }

  // -------------------------------------------------------------- q_kcore

  test("kcorePeel: a triangle survives 2-core peeling, its pendant does not") {
    import graft.operators.Graph
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val edges = pairs.toDF("src", "dst")
      .unionAll(pairs.map(_.swap).toDF("src", "dst"))
    val out = Graph.kcorePeel(edges, k = 2, rounds = 2).collect()
      .map(r => r.getAs[Long]("round") ->
        ((r.getAs[Long]("nodes_remaining"), r.getAs[Long]("directed_edges_remaining")))).toMap
    // round 1 removes the pendant node 4 (degree 1); the triangle is
    // stable thereafter
    assert(out(1L) == ((3L, 6L)))
    assert(out(2L) == ((3L, 6L)))
  }

  // ------------------------------------------------------- emb_matryoshka

  test("emb_matryoshka: full-dim recall is exactly 1.0 and every prefix is sane") {
    import graft.operators.VectorOps
    val rows = VectorOps.embMatryoshka(spark, sf).collect()
      .map(r => r.getAs[Int]("dim") ->
        ((r.getAs[Long]("hits"), r.getAs[Long]("recall_ppm")))).toMap
    assert(rows.keySet == VectorOps.MatryoshkaDims.toSet)
    assert(rows(64) == ((100L, 1000000L)), "the full prefix IS the reference ranking")
    rows.values.foreach { case (h, ppm) =>
      assert(h >= 0 && h <= 100 && ppm == h * 1000000L / 100)
    }
    // more dims, more signal: recall is nondecreasing in the prefix
    // length on this corpus (uniform-information synthetic embeddings
    // keep absolute recall low — 9/15/26/100 hits at sf0.001 — which
    // is itself the point of the audit: these vectors do NOT truncate
    // well, unlike MRL-trained ones)
    val byDim = graft.operators.VectorOps.MatryoshkaDims.map(d => rows(d)._1)
    assert(byDim == byDim.sorted, s"recall not monotone in prefix dims: $byDim")
    assert(rows(32)._1 > rows(8)._1, "a 4x longer prefix must beat the short one here")
  }

  // ---------------------------------------------------- text_vocab_growth

  test("text_vocab_growth equals a plain-Scala Heaps-curve replay") {
    import graft.operators.TextAnalysis
    val docsRows = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val B = TextAnalysis.VocabGrowthBucket
    val toks = docsRows.flatMap { case (id, t) => t.split(" ", -1).map(w => (id, w)) }
    val firstDoc = toks.groupBy(_._2).map { case (_, xs) => xs.map(_._1).min }
    val cps = toks.map(t => (t._1 / B + 1) * B).distinct.sorted
    val want = cps.map { c =>
      val vocab = firstDoc.count(fd => (fd / B + 1) * B <= c).toLong
      val newT = firstDoc.count(fd => (fd / B + 1) * B == c).toLong
      val nTok = toks.count(t => (t._1 / B + 1) * B <= c).toLong
      c -> ((vocab, newT, nTok))
    }.toMap
    val got = TextAnalysis.textVocabGrowth(spark, sf).collect()
      .map(r => r.getAs[Long]("checkpoint") ->
        ((r.getAs[Long]("vocab_size"), r.getAs[Long]("new_terms"), r.getAs[Long]("n_tokens"))))
      .toMap
    assert(got == want)
    // Heaps sanity: vocabulary growth is monotone and ends at the
    // corpus distinct-term count
    val ordered = got.toSeq.sortBy(_._1).map(_._2._1)
    assert(ordered == ordered.sorted)
    assert(ordered.last == firstDoc.size.toLong)
  }

  // ----------------------------------------------------- q_jsonl_roundtrip

  test("q_jsonl_roundtrip preserves every document byte-exactly") {
    val direct = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), md5(col("text")).as("m"))
      .as[(Long, String)].collect().toMap
    val rt = sources.Ingest.qJsonlRoundtrip(spark, sf)
      .select(col("doc_id"), col("text_md5")).as[(Long, String)].collect().toMap
    assert(rt == direct)
  }
}
