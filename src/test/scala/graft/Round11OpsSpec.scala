package graft

import graft.multimodal.Multimodal
import graft.operators.{Relational, TableFormat}
import graft.sources.Ingest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round11OpsSpec extends AnyFunSuite {
  import TestSpark._

  private def cents(x: Double): Long =
    math.floor(x * 100 + 0.5).toLong

  test("multimodal_e2e: disposition stages conserve the ingest corpus per kind") {
    val rows = Multimodal.multimodalE2e(spark, sf).collect()
      .map(r => (r.getAs[String]("stage"), r.getAs[String]("kind")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_bytes")))).toMap
    val stages = rows.keys.map(_._1).toSet
    assert(stages == Set("ingest", "exact_dup", "phash_dup", "too_small", "survivor"),
      s"every pipeline stage must fire on the dirty corpus: $stages")
    for (kind <- Seq("img", "aud", "vid")) {
      val (inDocs, inBytes) = rows(("ingest", kind))
      val disp = rows.filterKeys(k => k._2 == kind && k._1 != "ingest").values
      assert(disp.map(_._1).sum == inDocs, s"$kind: disposition docs must sum to ingest")
      assert(disp.map(_._2).sum == inBytes, s"$kind: disposition bytes must sum to ingest")
      // the planted copies guarantee both dedup stages fire per kind
      assert(rows(("exact_dup", kind))._1 > 0 && rows(("phash_dup", kind))._1 > 0)
      assert(rows(("survivor", kind))._1 > rows(("phash_dup", kind))._1,
        s"$kind: survivors should dominate on this corpus")
    }
  }

  test("q_funnel_window: depth never exceeds the unbounded funnel, lags obey the windows") {
    val DayUs = 86400000000L
    val bounded = Relational.qFunnelWindow(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("depth"), Option(r.getAs[java.lang.Long]("click_lag_us")).map(_.longValue),
          Option(r.getAs[java.lang.Long]("purchase_lag_us")).map(_.longValue)))).toMap
    val unbounded = Relational.qFunnel(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("depth")).toMap
    assert(bounded.keySet == unbounded.keySet, "both funnels start from the same view cohort")
    var strictly = 0
    bounded.foreach { case (u, (d, clag, plag)) =>
      assert(d <= unbounded(u), s"user $u: conversion window must never ADD conversions")
      if (d < unbounded(u)) strictly += 1
      clag.foreach(l => assert(l > 0 && l <= 3 * DayUs, s"user $u click lag $l outside window"))
      plag.foreach(l => assert(l > 0 && l <= 7 * DayUs, s"user $u purchase lag $l outside window"))
      if (plag.isDefined) assert(clag.isDefined, s"user $u purchased without a windowed click")
    }
    assert(strictly > 0, "the window should disqualify at least one late conversion on this corpus")
  }

  // ---------------------------------------------------- q_schema_evolution

  test("q_schema_evolution: merged read null-fills pre-column generations exactly") {
    val rows = Ingest.qSchemaEvolution(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("gen")).toSeq == Seq(1, 2, 3))
    val byGen = rows.map(r => r.getAs[Int]("gen") -> r).toMap

    // replay the generation rules straight from orders
    val o = GraftSession.table(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => (r.getAs[Long]("o_orderkey"), cents(r.getAs[Double]("o_totalprice"))))
    for (g <- 1 to 3) {
      val mine = o.filter { case (k, _) => k % 3 == g - 1 }
      val r = byGen(g)
      assert(r.getAs[Long]("n_rows") == mine.length.toLong, s"gen $g n_rows")
      assert(r.getAs[Long]("sum_cents") == mine.map(_._2).sum, s"gen $g sum_cents")
      // a column added in gen N reads back all-NULL for gens < N —
      // and NEVER null once it exists
      assert(r.getAs[Long]("n_disc_null") == (if (g == 1) mine.length.toLong else 0L))
      assert(r.getAs[Long]("n_channel_null") == (if (g < 3) mine.length.toLong else 0L))
      val wantDisc = if (g == 1) 0L else mine.map(_._2 / 20).sum
      assert(r.getAs[Long]("sum_disc") == wantDisc, s"gen $g sum_disc")
      val wantWeb = if (g < 3) 0L else mine.count(_._1 % 2 == 0).toLong
      assert(r.getAs[Long]("n_web") == wantWeb, s"gen $g n_web")
    }
  }

  // ----------------------------------------------------- q_delete_vectors

  test("q_delete_vectors: suppressed rows are hidden, not lost, and the DV applies positionally") {
    val rows = TableFormat.qDeleteVectors(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("file_id")).toSeq == (0L to 7L))

    val o = GraftSession.table(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_totalprice")).collect()
      .map(r => (r.getAs[Long]("o_orderkey"), cents(r.getAs[Double]("o_totalprice"))))
    // replay: file assignment + positional rank + the two delete rules
    val byFile = o.groupBy(_._1 % 8)
    val expect = byFile.map { case (fid, xs) =>
      val ranked = xs.sortBy(_._1).zipWithIndex.map { case ((k, c), i) => (k, c, i + 1L) }
      val deleted = ranked.filter { case (k, _, pos) => k % 13 == 0 || (fid == 3 && pos <= 10) }
      val live = ranked.filterNot { case (k, _, pos) => k % 13 == 0 || (fid == 3 && pos <= 10) }
      fid -> (live.length.toLong, deleted.length.toLong, live.map(_._2).sum)
    }
    rows.foreach { r =>
      val (nLive, nDel, liveCents) = expect(r.getAs[Long]("file_id"))
      assert(r.getAs[Long]("n_live") == nLive)
      assert(r.getAs[Long]("n_deleted") == nDel)
      assert(r.getAs[Long]("live_cents") == liveCents)
    }
    // conservation: live + deleted = base, per file and in total
    val totBase = o.length.toLong
    assert(rows.map(r => r.getAs[Long]("n_live") + r.getAs[Long]("n_deleted")).sum == totBase)
    // the positional rule actually bit: file 3 lost at least its 10 head positions
    assert(expect(3L)._2 >= 10L)
  }

  test("q_delete_vectors read side broadcasts the DV (no shuffle added to the consumer)") {
    val plan = TableFormat.qDeleteVectors(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected a broadcast anti join in:\n$plan")
  }

  // ----------------------------------------------------------- q_seqmine

  test("q_seqmine equals a plain-Scala first-before-last replay at sf0.001") {
    val ev = GraftSession.table(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"), r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val users = ev.map(_._1).distinct.length.toLong
    val support = scala.collection.mutable.Map.empty[(String, String), Long]
    ev.groupBy(_._1).foreach { case (_, xs) =>
      val ordered = xs.sortBy(x => (x._2, x._3)).map(_._4)
      val spans = ordered.zipWithIndex.groupBy(_._1).map { case (t, occ) =>
        t -> (occ.map(_._2).min, occ.map(_._2).max)
      }
      for ((a, (fa, _)) <- spans; (b, (_, lb)) <- spans if fa < lb)
        support((a, b)) = support.getOrElse((a, b), 0L) + 1L
    }
    val want = support.toMap.filter { case (_, s) => s * 1000000L / users >= 10000L }
    val got = Relational.qSeqmine(spark, sf).collect()
      .map(r => (r.getAs[String]("a"), r.getAs[String]("b")) ->
        (r.getAs[Long]("support"), r.getAs[Long]("share_ppm"))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (k, (s, ppm)) =>
      assert(want(k) == s, s"support mismatch for $k")
      assert(ppm == s * 1000000L / users)
    }
    // a→b and b→a are independent claims; at least one asymmetric or
    // self pattern should exist in real event data
    assert(got.nonEmpty)
  }

  test("q_seqmine sees non-adjacent patterns q_markov misses") {
    import spark.implicits._
    // user 1: a x b — a→b holds with a gap (markov's adjacent pairs
    // are only a→x and x→b); user 2 noise so the 1%-share gate keeps
    // all patterns of user 1 (2 users → each pattern = 50% share)
    val df = Seq(
      (1L, 1000L, 1L, "a"), (1L, 2000L, 2L, "x"), (1L, 3000L, 3L, "b"),
      (2L, 1000L, 4L, "x"),
    ).toDF("user_id", "us", "event_id", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"), col("event_id"), col("event_type"))
    val tmp = java.nio.file.Files.createTempDirectory("seqmine").toString
    df.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    try {
      val got = Relational.qSeqmine(spark, tmp).collect()
        .map(r => (r.getAs[String]("a"), r.getAs[String]("b"))).toSet
      assert(got.contains(("a", "b")), s"gapped pattern missing from $got")
      assert(!got.contains(("b", "a")), "order must matter")
      assert(!got.contains(("a", "a")), "no self pattern without recurrence")
    } finally {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles).foreach(_.foreach(rm)); p.delete(): Unit
      }
      rm(new java.io.File(tmp))
    }
  }

  // -------------------------------------------------------------- q_dwell

  test("q_dwell equals a plain-Scala gap-attribution replay at sf0.001") {
    val ev = GraftSession.table(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"), r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val gaps = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val s = xs.sortBy(x => (x._2, x._3))
      s.zip(s.tail).map { case (a, b) => (a._4, b._2 - a._2) }
    }
    val want = gaps.groupBy(_._1).map { case (t, g) =>
      val ds = g.map(_._2)
      t -> (ds.length.toLong, ds.sum, ds.max, ds.sum / ds.length)
    }
    val got = Relational.qDwell(spark, sf).collect()
      .map(r => r.getAs[String]("state") ->
        (r.getAs[Long]("n_intervals"), r.getAs[Long]("total_us"),
          r.getAs[Long]("max_us"), r.getAs[Long]("mean_us"))).toMap
    assert(got == want)
    // every gap is attributed exactly once: interval count = events - users
    val users = ev.map(_._1).distinct.length
    assert(got.values.map(_._1).sum == ev.length - users)
    got.values.foreach { case (_, tot, mx, mean) =>
      assert(tot >= 0 && mx >= mean && mean >= 0)
    }
  }

  // ----------------------------------------------------------------- q_dpp

  test("q_dpp plans runtime partition pruning and matches the unpartitioned answer") {
    val df = Ingest.qDpp(spark, sf)
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruningexpression in PartitionFilters:\n${plan.take(2000)}")
    // replay on the unpartitioned original
    val ev = GraftSession.table(spark, sf, "events")
      .select(expr("unix_micros(ts) div 86400000000").as("day"),
        col("event_type"), floor(col("value")).cast("long").as("v"))
      .collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[String]("event_type"), r.getAs[Long]("v")))
    val d1 = ev.map(_._1).max
    val dimDays = ev.filter(e => e._2 == "purchase" && e._1 > d1 - 7).map(_._1).toSet
    val want = ev.filter(e => dimDays(e._1))
      .groupBy(e => (e._1, e._2))
      .map { case ((d, t), xs) => (d, t) -> (xs.length.toLong, xs.map(_._3).sum) }
    val got = rows.map(r => (r.getAs[Long]("day"), r.getAs[String]("event_type")) ->
      (r.getAs[Long]("n_events"), r.getAs[Long]("sum_v"))).toMap
    assert(got == want)
    // pruning actually restricted the scan: matched days ⊆ purchase week
    assert(got.keySet.map(_._1).subsetOf(dimDays) && got.nonEmpty)
  }

  // ----------------------------------------------------------- q_linkpred

  test("q_linkpred equals a brute-force resource-allocation replay at sf0.001") {
    val li = GraftSession.table(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_partkey")))
    val byOrder = li.groupBy(_._1).values.map(_.map(_._2).sorted)
    val pairCounts = scala.collection.mutable.Map.empty[(Long, Long), Int]
    byOrder.foreach { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length)
        pairCounts((ps(i), ps(j))) = pairCounts.getOrElse((ps(i), ps(j)), 0) + 1
    }
    // NB: .collect on a Map yielding tuples would rebuild a Map and
    // collapse duplicate first components — go through an iterator
    val edges = pairCounts.iterator.collect { case (p, c) if c >= 2 => p }.toSet
    val nbrs = scala.collection.mutable.Map.empty[Long, Set[Long]]
    edges.foreach { case (u, v) =>
      nbrs(u) = nbrs.getOrElse(u, Set.empty) + v
      nbrs(v) = nbrs.getOrElse(v, Set.empty) + u
    }
    val deg = nbrs.map { case (z, n) => z -> n.size.toLong }
    // wedges: for every shared neighbor z, every x<y neighbor pair
    val score = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    nbrs.foreach { case (z, n) =>
      val s = n.toSeq.sorted
      for (i <- s.indices; j <- i + 1 until s.length) {
        val k = (s(i), s(j))
        val (c0, sc0) = score.getOrElse(k, (0L, 0L))
        score(k) = (c0 + 1, sc0 + 1000000L / deg(z))
      }
    }
    val want = score.toSeq
      .filterNot { case (k, _) => edges(k) }
      .sortBy { case ((x, y), (_, s)) => (-s, x, y) }
      .take(50)
      .map { case ((x, y), (c, s)) => (x, y, c, s) }
    val got = operators.Graph.qLinkpred(spark, sf).collect()
      .map(r => (r.getAs[Long]("x"), r.getAs[Long]("y"),
        r.getAs[Long]("common"), r.getAs[Long]("score_ppm"))).toSeq
    assert(got == want, s"got head=${got.take(3)} want head=${want.take(3)}")
    assert(got.nonEmpty)
    // no prediction may duplicate an existing edge
    got.foreach { case (x, y, _, _) => assert(!edges((x, y))) }
  }

  // ------------------------------------------------------------ text_rake

  test("text_rake equals a plain-Scala RAKE replay at sf0.001") {
    val stops = Set("the", "a", "and", "of", "to", "in", "is")
    val texts = GraftSession.table(spark, sf, "documents")
      .select(col("text")).collect().map(_.getString(0))
    // phrase segmentation: maximal stopword-free runs ('' is a boundary)
    val phrases = texts.flatMap { t =>
      val runs = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
      var cur = Vector.empty[String]
      t.split(" ", -1).foreach { w =>
        if (stops(w) || w.isEmpty) { if (cur.nonEmpty) runs += cur; cur = Vector.empty }
        else cur :+= w
      }
      if (cur.nonEmpty) runs += cur
      runs
    }
    val freq = scala.collection.mutable.Map.empty[String, Long]
    val deg = scala.collection.mutable.Map.empty[String, Long]
    phrases.foreach { p =>
      p.foreach { w =>
        freq(w) = freq.getOrElse(w, 0L) + 1
        deg(w) = deg.getOrElse(w, 0L) + p.length
      }
    }
    val wscore = freq.keys.map(w => w -> deg(w) * 1000000L / freq(w)).toMap
    val want = phrases.groupBy(_.mkString(" ")).collect {
      case (ph, occ) if occ.head.length >= 2 =>
        ph -> (occ.length.toLong, occ.head.length.toLong, occ.head.map(wscore).sum)
    }.toSeq
      .sortBy { case (ph, (_, _, s)) => (-s, ph) }
      .take(100)
    val got = operators.TextAnalysis.textRake(spark, sf).collect()
      .map(r => (r.getAs[String]("phrase"),
        (r.getAs[Long]("n_occ"), r.getAs[Long]("plen"), r.getAs[Long]("score_ppm"))))
    assert(got.toSeq == want, s"first got=${got.take(3).toSeq} want=${want.take(3)}")
    assert(got.nonEmpty && got.forall(_._2._2 >= 2))
  }

  // ------------------------------------------------------------ q_fd_audit

  test("q_fd_audit: the structural FD holds, the behavioral ones are violated, counts replay") {
    val rows = Relational.qFdAudit(spark, sf).collect()
      .map(r => r.getAs[String]("fd") ->
        (r.getAs[Long]("n_groups"), r.getAs[Long]("n_violating"),
          r.getAs[Long]("max_fanout"), r.getAs[Long]("violation_ppm"))).toMap
    assert(rows.size == 4)
    // nation → region is a true FD of the schema: zero violations
    val (ng, nv, mf, ppm) = rows("n_nationkey->n_regionkey")
    assert(nv == 0L && ppm == 0L && mf == 1L && ng == 25L)
    // behavioral FDs must NOT hold on real activity data
    assert(rows("user_id->event_type")._2 > 0L)
    // replay one audit exactly: user_id → event_type from the raw table
    val ev = GraftSession.table(spark, sf, "events")
      .select(col("user_id"), col("event_type")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type")))
    val ndv = ev.groupBy(_._1).map { case (_, xs) => xs.map(_._2).distinct.length }
    val (g, v, f, p) = rows("user_id->event_type")
    assert(g == ndv.size.toLong && v == ndv.count(_ > 1).toLong && f == ndv.max.toLong)
    assert(p == v * 1000000L / g)
  }

  // --------------------------------------------------- q_bitmap_retention

  test("q_bitmap_retention equals a plain-Scala bitmask replay at sf0.001") {
    val ev = GraftSession.table(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day")))
    val d1 = ev.map(_._2).max
    val masks = ev.filter(e => d1 - e._2 < 64)
      .groupBy(_._1).map { case (_, xs) =>
        xs.map(e => 1L << (d1 - e._2).toInt).reduce(_ | _)
      }
    val want = masks.groupBy(m => java.lang.Long.bitCount(m).toLong).map { case (ad, ms) =>
      ad -> (ms.size.toLong,
        ms.count(m => (m & 1L) == 1L).toLong,
        ms.count(m => ((m >> 7) & 1L) == 1L).toLong,
        ms.count(m => (m & 1L) == 1L && ((m >> 7) & 1L) == 1L).toLong)
    }
    val got = Relational.qBitmapRetention(spark, sf).collect()
      .map(r => r.getAs[Long]("active_days") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("n_today"),
          r.getAs[Long]("n_week_ago"), r.getAs[Long]("n_both"))).toMap
    assert(got == want)
    // the bitmap answers must be internally consistent audience algebra
    got.values.foreach { case (n, t, w, b) =>
      assert(b <= math.min(t, w) && t <= n && w <= n)
    }
    assert(got.values.map(_._1).sum == masks.size.toLong)
  }

  // ------------------------------------------------------ ann_incremental

  test("ann_incremental: conservation, determinism, and frozen-centroid assignment replay") {
    val rows = operators.VectorOps.annIncremental(spark, sf).collect()
    val e = GraftSession.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getSeq[Float](1).toArray))
    val nOldTotal = e.count(_._1 % 10 != 0).toLong
    val nNewTotal = e.count(_._1 % 10 == 0).toLong
    assert(rows.map(_.getAs[Long]("n_old")).sum == nOldTotal, "every old vector in exactly one list")
    assert(rows.map(_.getAs[Long]("n_new")).sum == nNewTotal, "every appended vector in exactly one list")

    // frozen-centroid replay: assign the new batch brute-force against
    // the SAME deterministic quantizer and reproduce the report's
    // n_new and mean_new_ppm per centroid
    val old = GraftSession.table(spark, sf, "embeddings")
      .filter(col("vec_id") % 10 =!= 0)
      .select(col("vec_id").as("id"), col("embedding"))
    val cents = operators.VectorOps.kmeansCentroids(old, 16).collect()
      .map(r => (r.getAs[Int]("centroid_id"), r.getSeq[Long](1).toArray, r.getAs[Double]("cnorm")))
    def quant(v: Array[Float]): Array[Long] =
      v.map(x => math.floor(x.toDouble * 10000 + 0.5).toLong)
    val got = scala.collection.mutable.Map.empty[Int, (Long, Long)] // cid -> (n, sumSim)
    e.filter(_._1 % 10 == 0).foreach { case (_, v) =>
      val qv = quant(v)
      val norm = math.sqrt(qv.map(x => x.toDouble * x).sum)
      // argmax cosine, ties to the smaller centroid id (the operator's
      // max(struct(cos, -cid)) tie-break)
      val (cid, cos) = cents.map { case (c, cv, cn) =>
        var dot = 0L; var i = 0
        while (i < qv.length) { dot += qv(i) * cv(i); i += 1 }
        (c, dot.toDouble / (norm * cn))
      }.minBy { case (c, s) => (-s, c) }
      val sim = math.floor(cos * 1000000 + 0.5).toLong
      val (n0, s0) = got.getOrElse(cid, (0L, 0L))
      got(cid) = (n0 + 1, s0 + sim)
    }
    val byCid = rows.map(r => r.getAs[Int]("centroid_id") ->
      (r.getAs[Long]("n_new"), r.getAs[Long]("mean_new_ppm"))).toMap
    got.foreach { case (cid, (n, sumSim)) =>
      assert(byCid(cid)._1 == n, s"n_new mismatch for centroid $cid")
      assert(byCid(cid)._2 == sumSim / n, s"mean_new_ppm mismatch for centroid $cid")
    }
    // centroids with no appended vectors must report n_new = 0, not vanish
    byCid.foreach { case (cid, (n, _)) => if (!got.contains(cid)) assert(n == 0L) }

    // determinism: the frozen quantizer + argmax assignment replays identically
    val again = operators.VectorOps.annIncremental(spark, sf).collect()
    assert(again.map(_.toSeq).toSeq == rows.map(_.toSeq).toSeq)
  }

  // ----------------------------------------------------- multimodal_audio

  test("multimodal_audio equals a plain-Scala frame-energy replay at sf0.001") {
    val docs = GraftSession.table(spark, sf, "documents")
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text").getBytes("UTF-8")))
      .filter(_._2.nonEmpty)
    val want = docs.map { case (id, b) =>
      val avgs = b.grouped(256).map { fr =>
        fr.foldLeft(0L) { (acc, x) => val v = (x & 0xff) - 128L; acc + v * v } / fr.length
      }.toVector
      val act = avgs.count(_ >= 2500L).toLong
      id -> (b.length.toLong, avgs.length.toLong, act, avgs.max, act * 1000000L / avgs.length)
    }.toMap
    val got = Multimodal.multimodalAudio(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_samples"), r.getAs[Long]("n_frames"), r.getAs[Long]("n_active"),
          r.getAs[Long]("peak_avg"), r.getAs[Long]("active_ppm"))).toMap
    assert(got == want)
    // only the aud third of the corpus decodes, and the gate must
    // actually discriminate somewhere on real text
    assert(got.nonEmpty)
    assert(got.keySet.forall(_ % 3 == 1))
  }

  test("audio decode: partial tail frame is normalized by its own length") {
    val row = Multimodal.MediaRow(7L, "aud", Array.fill[Byte](300)(0)) // v = -128 per sample
    val out = Multimodal.decodeAudioBatch(Seq(row))
    assert(out.length == 1)
    val f = out.head
    assert(f.n_samples == 300L && f.n_frames == 2L)
    // both frames have identical per-sample energy despite the short
    // tail: 128² exactly
    assert(f.peak_avg == 128L * 128L)
    assert(f.n_active == 2L && f.active_ppm == 1000000L)
    // silence payload: centered bytes at exactly 128 → zero energy
    val silent = Multimodal.decodeAudioBatch(
      Seq(Multimodal.MediaRow(8L, "aud", Array.fill[Byte](512)(-128)))) // 0x80 = 128 unsigned
    assert(silent.head.peak_avg == 0L && silent.head.n_active == 0L)
    // empty and non-aud payloads never decode
    assert(Multimodal.decodeAudioBatch(Seq(
      Multimodal.MediaRow(9L, "aud", Array.empty),
      Multimodal.MediaRow(10L, "img", Array.fill[Byte](32)(1)))).isEmpty)
  }
}
