package graft

import graft.operators.{Pipeline, Relational}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round8OpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // -------------------------------------------------------------- q_vwap

  test("q_vwap equals a plain-Scala integer replay at sf0.001") {
    val rows = GraftSession.table(spark, sf, "lineitem")
      .join(GraftSession.table(spark, sf, "part"), col("l_partkey") === col("p_partkey"))
      .select(
        col("p_brand"),
        expr("unix_micros(l_shipdate) div 2592000000000").as("bucket30"),
        (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long").as("cents"),
        col("l_quantity").cast("long").as("qty"),
      )
      .as[(String, Long, Long, Long)].collect()
    val want = rows.groupBy(r => (r._1, r._2)).map { case ((brand, b30), rs) =>
      val qty = rs.map(_._4).sum
      val cents = rs.map(_._3).sum
      (brand, b30) -> ((qty, cents, Math.floorDiv(cents, qty)))
    }
    val got = Relational.qVwap(spark, sf).collect().map { r =>
      (r.getAs[String]("p_brand"), r.getAs[Long]("bucket30")) ->
        ((r.getAs[Long]("qty_sum"), r.getAs[Long]("cents_sum"), r.getAs[Long]("vwap_cents")))
    }.toMap
    assert(got == want)
    // the floor-division invariant the cents answer must satisfy
    got.values.foreach { case (qty, cents, vwap) =>
      assert(vwap * qty <= cents && cents < (vwap + 1) * qty)
    }
  }

  // ------------------------------------------------------- q_changepoint

  test("q_changepoint equals a plain-Scala CUSUM replay at sf0.001") {
    val daily = GraftSession.table(spark, sf, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .as[(String, Long)].collect()
      .groupBy(identity).map { case ((t, d), xs) => (t, d, xs.length.toLong) }.toSeq
    val want = daily.groupBy(_._1).map { case (t, xs) =>
      val series = xs.sortBy(_._2)
      val nDays = series.length.toLong
      val total = series.map(_._3).sum
      var cum = 0L
      val cusums = series.zipWithIndex.map { case ((_, day, c), i) =>
        cum += c
        (day, cum * nDays - (i + 1).toLong * total)
      }
      val (cpDay, cusum) = cusums.minBy { case (day, s) => (-Math.abs(s), day) }
      t -> ((cpDay, cusum, nDays, total))
    }
    val got = Relational.qChangepoint(spark, sf).collect().map { r =>
      r.getAs[String]("event_type") ->
        ((r.getAs[Long]("cp_day"), r.getAs[Long]("cusum"),
          r.getAs[Long]("n_days"), r.getAs[Long]("total_events")))
    }.toMap
    assert(got == want)
    // CUSUM telescopes to zero at the last day, so a peak of 0 means a
    // perfectly flat series — on real event data the peak must move
    assert(got.values.exists(_._2 != 0L))
  }

  // -------------------------------------------------------- q_concurrency

  test("q_concurrency equals a plain-Scala interval-sweep replay at sf0.001") {
    val events = GraftSession.table(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("us"), col("event_id"))
      .as[(Long, Long, Long)].collect()
    val gapUs = 1800L * 1000000L
    val dayUs = 86400000000L
    // sessions per user under the 30-min gap rule
    val sessions = events.groupBy(_._1).values.flatMap { xs =>
      val sorted = xs.sortBy(e => (e._2, e._3))
      val out = scala.collection.mutable.ListBuffer[(Long, Long)]()
      var start = sorted.head._2; var end = sorted.head._2
      for ((_, us, _) <- sorted.tail) {
        if (us - end > gapUs) { out += ((start, end)); start = us }
        end = us
      }
      out += ((start, end)); out
    }.toSeq
    // day-clipped boundary sweep
    val deltas = scala.collection.mutable.Map[(Long, Long), Long]().withDefaultValue(0L)
    for ((s, e) <- sessions; day <- (s / dayUs) to (e / dayUs)) {
      val segS = math.max(s, day * dayUs)
      val segE1 = math.min(e, (day + 1) * dayUs - 1) + 1
      deltas((day, segS)) += 1; deltas((day, segE1)) -= 1
    }
    val want = deltas.keys.map(_._1).toSeq.distinct.sorted.map { day =>
      var run = 0L; var best = Long.MinValue; var bestUs = 0L
      for ((us, d) <- deltas.toSeq.filter(_._1._1 == day).map(kv => (kv._1._2, kv._2)).sortBy(_._1)) {
        run += d
        if (run > best) { best = run; bestUs = us }
      }
      (day, best, bestUs)
    }
    val got = Relational.qConcurrency(spark, sf).collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("peak_concurrency"), r.getAs[Long]("at_us")))
    assert(got.toSeq == want)
    assert(want.exists(_._2 > 1L), "peak concurrency never exceeded 1 — sweep untested")
  }

  // ----------------------------------------------------- dedup_containment

  test("dedup_containment equals the brute-force all-pairs replay at sf0.001") {
    val grams = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), operators.Dedup.shingles.as("sh"))
      .as[(Long, Seq[String])].collect()
      .map { case (id, sh) => id -> sh.toSet }
    val want = (for {
      (a, ga) <- grams; (b, gb) <- grams if a != b
      c = ga.intersect(gb).size.toDouble / ga.size if c >= 0.8
    } yield (a, b, c)).sortBy(p => (p._1, p._2))
    val got = operators.Dedup.dedupContainment(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Double]("containment")))
    assert(got.toSeq == want.toSeq)
    assert(want.nonEmpty, "no containment pairs at sf0.001 — threshold untested")
    // asymmetry: containment must catch direction the symmetric jaccard
    // rounds down — every jaccard>=0.8 pair appears in BOTH directions
    val sym = want.map(p => (p._1, p._2)).toSet
    val jac = (for {
      (a, ga) <- grams; (b, gb) <- grams if a < b
      j = ga.intersect(gb).size.toDouble / ga.union(gb).size if j >= 0.8
    } yield (a, b)).toSeq
    jac.foreach { case (a, b) => assert(sym((a, b)) && sym((b, a))) }
  }

  // ------------------------------------------------------ q_partition_prune

  test("q_partition_prune pushes the day filter to partition pruning and matches the unpartitioned answer") {
    val df = sources.Ingest.qPartitionPrune(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*day[^\\]]*>".r.findFirstIn(plan).isDefined,
      "day range filter must prune at the partition level:\n" + plan.linesIterator.take(12).mkString("\n"))
    // pruning must not change a single row vs the unpartitioned original
    val ev = GraftSession.table(spark, sf, "events")
      .select(expr("unix_micros(ts) div 86400000000").as("day"), col("event_type"),
        floor(col("value")).cast("long").as("v"))
      .as[(Long, String, Long)].collect()
    val d1 = ev.map(_._1).max
    val want = ev.filter(_._1 > d1 - 7).groupBy(e => (e._1, e._2)).toSeq
      .map { case ((d, t), xs) => (d, t, xs.length.toLong, xs.map(_._3).sum) }
      .sortBy(p => (p._1, p._2))
    val got = df.collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), r.getAs[Long]("sum_v")))
    assert(got.toSeq == want)
    assert(want.map(_._1).distinct.size <= 7 && want.nonEmpty)
  }

  // --------------------------------------------------------- lake_replicate

  test("lake_replicate report equals a plain-Scala replication replay at sf0.001") {
    val blobs = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), md5(col("text")).as("h"))
      .as[(Long, String)].collect()
    val catA = blobs.filter(_._1 % 3 != 0).groupBy(_._2).map { case (h, xs) => h -> xs.map(_._1).min }
    val liveA = catA.collect { case (h, m) if m % 7 != 0 => h }.toSet
    val tombA = catA.collect { case (h, m) if m % 7 == 0 => h }.toSet
    val catB = blobs.filter(_._1 % 2 == 0).map(_._2).toSet
    val shipped = liveA.diff(catB)
    val postB = catB.union(shipped)
    val counts = Map(
      "in_sync" -> liveA.intersect(postB).size.toLong,
      "only_here" -> liveA.diff(postB).size.toLong,
      "only_other" -> postB.diff(liveA).size.toLong,
      "shipped" -> shipped.size.toLong,
      "suppressed_tombstone" -> tombA.diff(catB).size.toLong,
    ).filter(_._2 > 0)
    val got = operators.LakeOps.lakeReplicate(spark, sf).collect()
      .map(r => (r.getAs[String]("status"), r.getAs[Long]("n_blobs"))).toMap
    assert(got == counts)
    // replication closure: every live source blob is present in the target
    assert(!got.contains("only_here"))
    // tombstoned blobs that B never had must NOT have been shipped
    assert(got.contains("suppressed_tombstone"))
  }

  // --------------------------------------------------------------- q_decay

  test("q_decay equals a plain-Scala shift-decay replay at sf0.001") {
    val ev = GraftSession.table(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value")).cast("long").as("v"))
      .as[(Long, Long, Long)].collect()
    val d1 = ev.map(_._2).max
    val want = ev.groupBy(_._1).map { case (u, xs) =>
      val score = xs.map { case (_, d, v) =>
        v / (1L << math.min((d1 - d) / 7, 40L).toInt)
      }.sum
      (u, xs.length.toLong, score)
    }.toSeq.sortBy(_._1)
    val got = Relational.qDecay(spark, sf).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"), r.getAs[Long]("decay_score")))
    assert(got.toSeq == want)
    // decay must bite: total decayed mass strictly below the undecayed sum
    assert(want.map(_._3).sum < ev.map(_._3).sum)
  }

  // ------------------------------------------------------------- q_benford

  test("q_benford equals a plain-Scala first-digit replay at sf0.001") {
    val cents = GraftSession.table(spark, sf, "orders")
      .select((col("o_totalprice").cast("decimal(12,2)") * 100).cast("long").as("c"))
      .as[Long].collect()
    val expected = Map(1L -> 301029L, 2L -> 176091L, 3L -> 124938L, 4L -> 96910L,
      5L -> 79181L, 6L -> 66946L, 7L -> 57991L, 8L -> 51152L, 9L -> 45757L)
    val byDigit = cents.groupBy(c => c.toString.head.asDigit.toLong)
    val want = byDigit.toSeq.sortBy(_._1).map { case (d, xs) =>
      (d, xs.length.toLong, xs.length.toLong * 1000000L / cents.length, expected(d))
    }
    val got = Relational.qBenford(spark, sf).collect()
      .map(r => (r.getAs[Long]("digit"), r.getAs[Long]("n_orders"),
        r.getAs[Long]("share_ppm"), r.getAs[Long]("benford_ppm")))
    assert(got.toSeq == want)
    assert(want.map(_._3).sum <= 1000000L)
  }

  // --------------------------------------------------------- q_rolling_dau

  test("q_rolling_dau equals a plain-Scala sliding-distinct replay at sf0.001") {
    val active = GraftSession.table(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .as[(Long, Long)].collect().toSet
    val d1 = active.map(_._2).max
    val want = active.toSeq.map(_._2).distinct.flatMap(d => d to math.min(d + 6, d1)).distinct.sorted.map { rd =>
      (rd, active.collect { case (u, d) if d >= rd - 6 && d <= rd => u }.size.toLong)
    }
    val got = Relational.qRollingDau(spark, sf).collect()
      .map(r => (r.getAs[Long]("report_day"), r.getAs[Long]("active_users")))
    assert(got.toSeq == want)
    // rolling count must dominate any single day's count
    val daily = active.groupBy(_._2).map { case (d, xs) => d -> xs.size }
    daily.foreach { case (d, n) => assert(want.toMap.apply(d) >= n) }
  }

  // ------------------------------------------------------------ q_forecast

  test("q_forecast equals a plain-Scala seasonal-naive replay at sf0.001") {
    val daily = GraftSession.table(spark, sf, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .as[(String, Long)].collect()
      .groupBy(identity).map { case ((t, d), xs) => ((t, d), xs.length.toLong) }
    val want = daily.keys.map(_._1).toSeq.distinct.sorted.flatMap { t =>
      val errs = daily.collect {
        case ((`t`, d), c) if daily.contains((t, d - 7)) => Math.abs(c - daily((t, d - 7)))
      }.toSeq
      if (errs.isEmpty) None
      else Some((t, errs.length.toLong, errs.sum, errs.sum * 1000000L / errs.length))
    }
    val got = Relational.qForecast(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n_scored"),
        r.getAs[Long]("total_abs_err"), r.getAs[Long]("mae_ppm")))
    assert(got.toSeq == want)
    assert(want.nonEmpty && want.exists(_._3 > 0L))
  }

  // ------------------------------------------------------------- text_rrf

  test("text_rrf equals a plain-Scala fusion of its two component rankings") {
    import graft.operators.{TextAnalysis, VectorOps}
    val textRank = TextAnalysis.bm25(
      GraftSession.table(spark, sf, "documents"), col("text"), Seq("spark", "stream", "join"), 100)
      .select(col("doc_id")).as[Long].collect().zipWithIndex
      .map { case (id, i) => id -> (i + 1).toLong }.toMap
    val e = GraftSession.table(spark, sf, "embeddings").select(col("vec_id").as("id"), col("embedding"))
    val vecRank = VectorOps.annBruteforce(e, e.filter(col("id") === 0), 100)
      .select(col("neighbor_id"), col("rank")).as[(Long, Long)].collect().toMap
    def unit(r: Option[Long]): Long = r.map(x => 1000000000L / (60L + x)).getOrElse(0L)
    val fused = (textRank.keySet ++ vecRank.keySet).toSeq
      .map(id => (id, textRank.get(id), vecRank.get(id),
        unit(textRank.get(id)) + unit(vecRank.get(id))))
      .sortBy { case (id, _, _, s) => (-s, id) }
      .take(20).zipWithIndex
      .map { case ((id, rt, rv, s), i) => (id, rt, rv, s, (i + 1).toLong) }
    val got = TextAnalysis.textRrf(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"),
        Option(r.getAs[java.lang.Long]("r_text")).map(_.toLong),
        Option(r.getAs[java.lang.Long]("r_vec")).map(_.toLong),
        r.getAs[Long]("rrf"), r.getAs[Long]("rk")))
    assert(got.toSeq == fused)
    // fusion must actually mix: the top-20 should contain docs from both sides
    assert(fused.exists(_._2.isDefined) && fused.exists(_._3.isDefined))
  }

  // ------------------------------------------------------ text_domain_cap

  test("text_domain_cap: bounded-aggregator result equals the window formulation") {
    val got = Pipeline.textDomainCap(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("rank"), r.getAs[Long]("doc_id")))
    // reference: the full-sort window formulation the aggregator replaces
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(conv(substring(md5(col("doc_id").cast("string")), 1, 12), 16, 10).cast("long"), col("doc_id"))
    val want = GraftSession.table(spark, sf, "documents")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= Pipeline.DomainCapK)
      .select(col("source"), col("rank"), col("doc_id"))
      .as[(String, Long, Long)].collect()
    assert(got.sorted.toSeq == want.sorted.toSeq)
  }

  test("text_domain_cap: cap respected, ranks contiguous, deterministic") {
    val rows = Pipeline.textDomainCap(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("rank"), r.getAs[Long]("doc_id")))
    val bySrc = rows.groupBy(_._1)
    val nDocs = GraftSession.table(spark, sf, "documents")
      .groupBy(col("source")).count().as[(String, Long)].collect().toMap
    for ((src, xs) <- bySrc) {
      assert(xs.length <= Pipeline.DomainCapK)
      assert(xs.length == math.min(Pipeline.DomainCapK, nDocs(src)).toInt,
        s"$src kept ${xs.length} of ${nDocs(src)}")
      assert(xs.map(_._2).sorted.toSeq == (1L to xs.length.toLong), s"$src ranks not contiguous")
      assert(xs.map(_._3).distinct.length == xs.length, s"$src duplicated doc_ids")
    }
    val again = Pipeline.textDomainCap(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("rank"), r.getAs[Long]("doc_id")))
    assert(rows.toSeq == again.toSeq, "nondeterministic result")
  }
}
