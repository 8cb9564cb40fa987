package graft

import graft.operators.{Graph, Relational, TableFormat}
import graft.sources.Ingest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round10OpsSpec extends AnyFunSuite {
  import TestSpark._

  private def cents(x: Double): Long =
    (BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact

  // ------------------------------------------------------------ q_skyline

  test("q_skyline equals the brute-force dominance frontier at sf0.001") {
    val parts = GraftSession.table(spark, sf, "part")
      .select(col("p_size"), col("p_retailprice")).collect()
      .map(r => (r.getAs[Int]("p_size"), cents(r.getAs[Double]("p_retailprice"))))
    // brute-force O(n²) dominance over per-size maxima: (s, c) is on
    // the skyline iff no other point has s' <= s, c' >= c with one strict
    val pts = parts.groupBy(_._1).map { case (s, xs) => (s, xs.map(_._2).max) }.toSeq
    val want = pts.filter { case (s, c) =>
      !pts.exists { case (s2, c2) =>
        s2 <= s && c2 >= c && (s2 < s || c2 > c)
      }
    }.toMap
    val got = Relational.qSkyline(spark, sf).collect()
      .map(r => r.getAs[Int]("p_size") -> r.getAs[Long]("best_cents")).toMap
    assert(got == want)
    // frontier must be strictly increasing in price as size grows
    val sorted = got.toSeq.sortBy(_._1).map(_._2)
    assert(sorted == sorted.sorted && sorted.distinct == sorted)
  }

  // ---------------------------------------------------------- q_winsorize

  test("q_winsorize equals a plain-Scala clamp replay at sf0.001") {
    val li = GraftSession.table(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice")).collect()
      .map(r => (r.getAs[String]("l_returnflag"), cents(r.getAs[Double]("l_extendedprice"))))
    val want = li.groupBy(_._1).map { case (flag, xs) =>
      val v = xs.map(_._2).sorted
      val n = v.length
      val lo = v((n + 19) / 20 - 1)
      val hi = v((19 * n + 19) / 20 - 1)
      flag -> ((n.toLong, lo, hi,
        v.map(c => math.max(lo, math.min(hi, c))).sum,
        v.count(_ < lo).toLong, v.count(_ > hi).toLong))
    }
    val got = Relational.qWinsorize(spark, sf).collect().map { r =>
      r.getAs[String]("l_returnflag") -> ((r.getAs[Long]("n"),
        r.getAs[Long]("lo_cents"), r.getAs[Long]("hi_cents"),
        r.getAs[Long]("sum_clamped_cents"),
        r.getAs[Long]("n_clipped_low"), r.getAs[Long]("n_clipped_high")))
    }.toMap
    assert(got == want)
    // at most 5% clipped on either side by construction
    got.values.foreach { case (n, _, _, _, nl, nh) =>
      assert(nl <= n / 20 && nh <= n / 20)
    }
  }

  // ------------------------------------------------------- q_compact_plan

  test("q_compact_plan bins partition the manifest into contiguous ranges") {
    val docs = GraftSession.table(spark, sf, "documents")
      .select(col("source"), col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars")))
    val binned: Seq[(String, Long, Long, Long)] = docs.toSeq.groupBy(_._1).toSeq.flatMap {
      case (src, xs) =>
        var cum = 0L
        xs.sortBy(_._2).map { case (_, id, b) =>
          val bin = cum / 1000; cum += b; (src, bin, id, b)
        }
    }
    val want = binned.groupBy(t => (t._1, t._2)).map { case ((src, bin), xs) =>
      (src, bin) -> ((xs.size.toLong, xs.map(_._4).sum, xs.map(_._3).min, xs.map(_._3).max))
    }
    val got = TableFormat.qCompactPlan(spark, sf).collect().map { r =>
      (r.getAs[String]("source"), r.getAs[Long]("bin")) ->
        ((r.getAs[Long]("n_files"), r.getAs[Long]("bin_bytes"),
          r.getAs[Long]("first_doc"), r.getAs[Long]("last_doc")))
    }.toMap
    assert(got == want)
    // bins within a source cover disjoint, ordered doc ranges
    got.keys.groupBy(_._1).foreach { case (_, ks) =>
      val ordered = ks.toSeq.sortBy(_._2).map(got)
      ordered.sliding(2).foreach {
        case Seq(a, b) => assert(a._4 < b._3, "bin key ranges must be disjoint and ordered")
        case _         => ()
      }
    }
    // packing conserves bytes and file count per source
    val bySrc = got.toSeq.groupBy(_._1._1)
    docs.groupBy(_._1).foreach { case (src, xs) =>
      val bins = bySrc(src).map(_._2)
      assert(bins.map(_._1).sum == xs.length.toLong)
      assert(bins.map(_._2).sum == xs.map(_._3).sum)
    }
  }

  // ---------------------------------------------------------------- q_msf

  /** Kruskal under the (w, u, v) total order — the sequential twin of
    * the distributed Borůvka (both compute the unique MSF of the
    * distinct-weight perturbation that order induces).
    */
  private def kruskal(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.sortBy { case (u, v, w) => (w, u, v) }.flatMap { case (u, v, w) =>
      val (ru, rv) = (find(u), find(v))
      if (ru == rv) None else { parent(ru) = rv; Some((u, v, w)) }
    }.toSet
  }

  test("boruvkaMsf on a hand graph with weight ties equals Kruskal") {
    import TestSpark.spark.implicits._
    // two squares joined by a bridge; parallel tie weights exercise the
    // (w, u, v) lexicographic tie-break
    val edges = Seq(
      (1L, 2L, 5L), (2L, 3L, 5L), (3L, 4L, 5L), (1L, 4L, 5L),
      (4L, 5L, 1L),
      (5L, 6L, 7L), (6L, 7L, 7L), (7L, 8L, 7L), (5L, 8L, 7L),
      (10L, 11L, 2L), // separate component
    )
    val got = Graph.boruvkaMsf(edges.toDF("u", "v", "w")).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"), r.getAs[Long]("w"))).toSet
    assert(got == kruskal(edges))
    assert(got.size == 10 - 2) // n nodes − n components
  }

  test("q_msf equals a Kruskal replay of the nation trade graph at sf0.001") {
    val edges = GraftSession.table(spark, sf, "orders")
      .join(GraftSession.table(spark, sf, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .join(GraftSession.table(spark, sf, "customer").select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(GraftSession.table(spark, sf, "supplier").select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .select(
        least(col("c_nationkey"), col("s_nationkey")).as("u"),
        greatest(col("c_nationkey"), col("s_nationkey")).as("v"),
        (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long").as("cents"))
      .groupBy(col("u"), col("v")).agg(min(col("cents")).as("w"))
      .collect().map(r => (r.getAs[Int]("u").toLong, r.getAs[Int]("v").toLong, r.getAs[Long]("w")))
    val want = kruskal(edges.toSeq)
    val got = Graph.qMsf(spark, sf).collect()
      .map(r => (r.getAs[Int]("u").toLong, r.getAs[Int]("v").toLong, r.getAs[Long]("w_cents"))).toSet
    assert(got == want)
    assert(got.nonEmpty && got.size < edges.length, "MSF must be a proper subset of the edges")
  }

  // ------------------------------------------------------------- q_streaks

  test("q_streaks equals a plain-Scala islands replay at sf0.001") {
    val days = GraftSession.table(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day")))
    val want = days.groupBy(_._1).map { case (u, xs) =>
      val ds = xs.map(_._2).sorted
      // split into runs of consecutive days
      val runs = ds.foldLeft(List.empty[List[Long]]) {
        case (acc @ (h :: t), d) if h.head == d - 1 => (d :: h) :: t
        case (acc, d)                               => List(d) :: acc
      }.map(r => (r.length.toLong, r.min))
      val best = runs.maxBy { case (len, start) => (len, -start) }
      u -> ((ds.length.toLong, runs.length.toLong, best._1, best._2))
    }
    val got = Relational.qStreaks(spark, sf).collect().map { r =>
      r.getAs[Long]("user_id") -> ((r.getAs[Long]("n_active_days"),
        r.getAs[Long]("n_streaks"), r.getAs[Long]("max_streak_days"),
        r.getAs[Long]("max_streak_start")))
    }.toMap
    assert(got == want)
    // islands invariants
    got.values.foreach { case (active, streaks, maxLen, _) =>
      assert(maxLen <= active && streaks <= active && maxLen >= 1)
    }
  }

  // ------------------------------------------------------- q_split_holdout

  test("q_split_holdout is stable under corpus growth and partitions every stratum") {
    import graft.operators.Pipeline
    val rows = Pipeline.qSplitHoldout(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("split")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("id_sum")))).toMap
    val docs = GraftSession.table(spark, sf, "documents")
      .select(col("source"), col("doc_id")).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id")))
    // splits partition each source exactly
    docs.groupBy(_._1).foreach { case (src, xs) =>
      val bySplit = rows.filter(_._1._1 == src).values
      assert(bySplit.map(_._1).sum == xs.length.toLong)
      assert(bySplit.map(_._2).sum == xs.map(_._2).sum)
    }
    // growth-stability: recompute each doc's split independently — the
    // property that a row's split never changes as the corpus grows
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val want = docs.map { case (src, id) =>
      val b = java.lang.Long.parseLong(md5hex(s"split:$id").take(8), 16) % 100
      (src, if (b < 90) "train" else if (b < 95) "val" else "test")
    }.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    rows.foreach { case (k, (n, _)) => assert(want.getOrElse(k, 0L) == n, s"split count diverges at $k") }
  }

  // ---------------------------------------------------------------- q_sssp

  test("sssp on a hand graph relaxes exactly like bounded-round Bellman-Ford") {
    import TestSpark.spark.implicits._
    // a cheap long path vs an expensive direct edge: 4 rounds find the
    // 3-hop cheap route; the 1-round prefix only the direct edge
    val edges0 = Seq(
      (0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L), // cheap chain 0→3 cost 3
      (0L, 3L, 10L),                            // expensive direct
      (3L, 4L, 1L),
      (5L, 6L, 2L),                             // unreachable island
    )
    val edges = (edges0 ++ edges0.map(t => (t._2, t._1, t._3))).toDF("src", "dst", "w")
    val d4 = Graph.sssp(edges, 0L, 4).as[(Long, Long)].collect().toMap
    assert(d4 == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L),
      "4 rounds must find the cheap 3-hop route and exclude the island")
    val d1 = Graph.sssp(edges, 0L, 1).as[(Long, Long)].collect().toMap
    assert(d1 == Map(0L -> 0L, 1L -> 1L, 3L -> 10L),
      "1 round sees only direct edges (bounded-round contract)")
  }

  test("q_sssp distances obey the triangle inequality over every edge") {
    val dist = Graph.qSssp(spark, sf).collect()
      .map(r => r.getAs[Long]("node_id") -> r.getAs[Long]("dist")).toMap
    assert(dist(0L) == 0L)
    // rebuild the edge relation and check relaxation closure: for a
    // 4-round prefix, dist(v) <= dist(u) + w only holds where dist(v)
    // settled — check the weaker sound property dist(v) >= 0 and
    // reached ⊆ component of 0 via MSF edges is overkill; instead pin
    // that every reached non-seed node's distance equals min over
    // in-edges from reached nodes of (dist(u) + w) for SOME u — i.e.
    // each distance is witnessed by an actual path
    val base = GraftSession.table(spark, sf, "orders")
      .join(GraftSession.table(spark, sf, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .join(GraftSession.table(spark, sf, "customer").select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(GraftSession.table(spark, sf, "supplier").select(col("s_nationkey"), col("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .select(least(col("c_nationkey"), col("s_nationkey")).cast("long").as("u"),
        greatest(col("c_nationkey"), col("s_nationkey")).cast("long").as("v"),
        (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long").as("cents"))
      .groupBy("u", "v").agg(min(col("cents")).as("w")).collect()
      .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"), r.getAs[Long]("w")))
    val und = base ++ base.map(t => (t._2, t._1, t._3))
    dist.filter(_._1 != 0L).foreach { case (v, d) =>
      val witnesses = und.filter(e => e._2 == v && dist.contains(e._1))
        .map(e => dist(e._1) + e._3)
      assert(witnesses.nonEmpty && witnesses.min <= d && d > 0,
        s"node $v distance $d has no edge witness")
    }
  }

  // --------------------------------------------------- q_jsonl_quarantine

  test("q_jsonl_quarantine keeps every good row and quarantines every planted line") {
    val rows = Ingest.qJsonlQuarantine(spark, sf).collect()
      .map(r => r.getAs[String]("class") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("id_sum")))).toMap
    val docs = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(rows("good") == ((docs.length.toLong, docs.sum)))
    assert(rows("quarantined")._1 == 7L, "all seven malformed lines must quarantine")
    assert(rows.keySet == Set("good", "quarantined"))
  }

  // ------------------------------------------------------- q_erasure_audit

  test("q_erasure_audit proves zero cohort rows survive each anti-join") {
    val rows = Relational.qErasureAudit(spark, sf).collect()
    assert(rows.map(_.getAs[String]("table_name")).sorted.toSeq ==
      Seq("customer", "events", "orders"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_cohort_remaining") == 0L, s"leak in ${r.get(0)}")
      assert(r.getAs[Long]("n_before") ==
        r.getAs[Long]("n_erased") + r.getAs[Long]("n_after"))
    }
    // replay the erased counts from the raw tables
    val cohort = GraftSession.table(spark, sf, "customer")
      .filter(col("c_custkey") % 13 === 0).select("c_custkey").collect()
      .map(_.getLong(0)).toSet
    val wantErased = Map(
      "orders" -> GraftSession.table(spark, sf, "orders").collect()
        .count(r => cohort(r.getAs[Long]("o_custkey"))).toLong,
      "customer" -> cohort.size.toLong,
      "events" -> GraftSession.table(spark, sf, "events").collect()
        .count(r => cohort(r.getAs[Long]("user_id"))).toLong,
    )
    rows.foreach(r => assert(r.getAs[Long]("n_erased") == wantErased(r.getAs[String]("table_name"))))
  }

  // ------------------------------------------------------------ ann_recall

  test("ann_recall overlap arithmetic is exact and floors hold at sf0.001") {
    import graft.operators.VectorOps
    val truth = VectorOps.annBruteforce(spark, sf)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val byMethod = Map(
      "lsh" -> VectorOps.annLsh(spark, sf),
      "ivf" -> VectorOps.annIvf(spark, sf),
      "pq" -> VectorOps.annPq(spark, sf),
      "ivfpq" -> VectorOps.annIvfPq(spark, sf),
    ).map { case (m, df) =>
      m -> df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    }
    val got = VectorOps.annRecall(spark, sf).collect().map { r =>
      r.getAs[String]("method") -> ((r.getAs[Long]("n_truth"),
        r.getAs[Long]("n_hits"), r.getAs[Long]("recall_ppm")))
    }.toMap
    assert(got.keySet == Set("lsh", "ivf", "pq", "ivfpq"))
    got.foreach { case (m, (nT, nH, ppm)) =>
      assert(nT == truth.size.toLong)
      assert(nH == (byMethod(m) intersect truth).size.toLong, s"$m hit count diverges")
      assert(ppm == nH * 1000000L / nT)
    }
    // the recall floors the dedicated specs assert, restated on the report
    // (lsh raised 0.5 → 0.7 when 4-probe multi-probe landed; measures
    // ≈0.98 on this corpus)
    assert(got("lsh")._3 >= 700000L && got("ivf")._3 >= 700000L && got("pq")._3 >= 700000L)
    assert(got("ivfpq")._3 >= 700000L, "composed-index recall floor")
  }

  // --------------------------------------------------------- q_runsum_floor

  test("q_runsum_floor equals a plain-Scala clamped fold at sf0.001") {
    val e = GraftSession.table(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("us"), col("event_id"),
        col("event_type"), floor(col("value")).cast("long").as("v")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"), r.getAs[Long]("event_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("v")))
    val credit = Set("signup", "click", "view")
    val want = e.groupBy(_._1).map { case (u, xs) =>
      var bal = 0L; var hits = 0L
      xs.sortBy(t => (t._2, t._3)).foreach { case (_, _, _, tpe, v) =>
        val d = if (credit(tpe)) v else -v
        val s = bal + d
        if (s < 0) { bal = 0; hits += 1 } else bal = s
      }
      u -> ((xs.length.toLong, bal, hits))
    }
    val got = Relational.qRunsumFloor(spark, sf).collect().map { r =>
      r.getAs[Long]("user_id") -> ((r.getAs[Long]("n_events"),
        r.getAs[Long]("final_balance"), r.getAs[Long]("n_floor_hits")))
    }.toMap
    assert(got == want)
    // the clamp invariant: balances are never negative
    got.values.foreach { case (_, bal, _) => assert(bal >= 0) }
  }

  // ------------------------------------------------- multimodal_resize

  test("multimodal_resize pools every image cell to its exact byte floor-mean") {
    val rows = multimodal.Multimodal.multimodalResize(spark, sf).collect()
    assert(rows.nonEmpty)
    val media = multimodal.Multimodal.mediaTable(spark, sf).collect()
      .filter(_.getAs[String]("kind") == "img")
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("payload")).toMap
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == media.filter(_._2.nonEmpty).keySet)
    rows.foreach { r =>
      val b = media(r.getAs[Long]("doc_id"))
      val w = (b(0) & 0xff) + 1
      val h = if (b.length > 1) (b(1) & 0xff) + 1 else 1
      val (cy, cx) = (r.getAs[Int]("cy"), r.getAs[Int]("cx"))
      val (r0, r1, c0, c1) = (cy * h / 4, (cy + 1) * h / 4, cx * w / 4, (cx + 1) * w / 4)
      val px = for (y <- r0 until r1; x <- c0 until c1) yield (b((y * w + x) % b.length) & 0xff).toLong
      assert(r.getAs[Long]("n_px") == px.length.toLong)
      assert(r.getAs[Long]("mean_val") == px.sum / px.length)
      assert(r.getAs[Long]("mean_val") >= 0 && r.getAs[Long]("mean_val") <= 255)
    }
    // output is O(images × G²): never more than 16 cells per image
    byDoc.values.foreach(cells => assert(cells.length <= 16))
  }

  // ------------------------------------------------------- q_mad_outliers

  test("q_mad_outliers equals a plain-Scala median/MAD replay at sf0.001") {
    val e = GraftSession.table(spark, sf, "events")
      .select(col("event_type"), floor(col("value")).cast("long").as("v")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("v")))
    def med(xs: Seq[Long]): Long = xs.sorted.apply((xs.length + 1) / 2 - 1)
    val want = e.groupBy(_._1).map { case (tpe, xs) =>
      val vs = xs.map(_._2).toSeq
      val m = med(vs)
      val ds = vs.map(v => math.abs(v - m))
      val md = med(ds)
      tpe -> ((vs.length.toLong, m, md, ds.count(_ > 3 * md).toLong, ds.max))
    }
    val got = Relational.qMadOutliers(spark, sf).collect().map { r =>
      r.getAs[String]("event_type") -> ((r.getAs[Long]("n"), r.getAs[Long]("med"),
        r.getAs[Long]("mad"), r.getAs[Long]("n_outliers"), r.getAs[Long]("max_dev")))
    }.toMap
    assert(got == want)
    // MAD's 50% breakdown: at most half the rows can sit beyond the fence
    got.values.foreach { case (n, _, _, out, _) => assert(out <= n / 2) }
  }

  // ----------------------------------------------------------- q_dist_rank

  test("q_dist_rank navigation values satisfy their definitions at sf0.001") {
    val dates = GraftSession.table(spark, sf, "orders")
      .select(col("o_orderkey"), expr("unix_micros(o_orderdate)").as("d")).collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[Long]("d")).toMap
    val rows = Relational.qDistRank(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (_, rs) =>
      val n = rs.length
      // replay the window order: (date, key)
      val sorted = rs.sortBy(r => (dates(r.getAs[Long]("o_orderkey")), r.getAs[Long]("o_orderkey")))
      sorted.zipWithIndex.foreach { case (r, i) =>
        // date+key order is tie-free on key, so rank = i+1
        val pr = if (n == 1) 0.0 else i.toDouble / (n - 1)
        assert(r.getAs[Double]("pr") == pr)
        assert(r.getAs[Double]("cd") == (i + 1).toDouble / n)
        assert(r.getAs[Long]("first_cents") == sorted.head.getAs[Long]("cents"))
        assert(r.getAs[Long]("last_cents") == sorted.last.getAs[Long]("cents"))
        if (n >= 2) assert(r.getAs[Long]("second_cents") == sorted(1).getAs[Long]("cents"))
        else assert(r.isNullAt(r.fieldIndex("second_cents")))
      }
    }
  }

  // ------------------------------------------------------------ q_stl_lite

  test("q_stl_lite decomposition identities hold and the replay matches at sf0.001") {
    val daily = GraftSession.table(spark, sf, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day"), r.getAs[Long]("c")))
    val want = daily.groupBy(_._1).toSeq.flatMap { case (tpe, xs) =>
      val byDay = xs.map(t => t._2 -> t._3).toMap
      val full = xs.filter { case (_, d, _) => (-3L to 3L).forall(o => byDay.contains(d + o)) }
      val detr = full.map { case (_, d, c) =>
        val trend = (-3L to 3L).map(o => byDay(d + o)).sum
        (d, c, trend, c * 7 - trend)
      }
      val eff = detr.groupBy(t => t._1 % 7).map { case (dow, ys) =>
        val s = ys.map(_._4).sum
        dow -> (math.floorDiv(s, ys.length.toLong)) // floor, not truncate
      }
      detr.map { case (d, c, trend, dx) =>
        (tpe, d) -> ((c, trend, eff(d % 7), dx - eff(d % 7)))
      }
    }.toMap
    val got = Relational.qStlLite(spark, sf).collect().map { r =>
      (r.getAs[String]("event_type"), r.getAs[Long]("day")) ->
        ((r.getAs[Long]("c"), r.getAs[Long]("trend_x7"),
          r.getAs[Long]("season_x7"), r.getAs[Long]("resid_x7")))
    }.toMap
    assert(got == want)
    // identity: 7c = trend + season + resid on every emitted day
    got.foreach { case (k, (c, trend, season, resid)) =>
      assert(c * 7 == trend + season + resid, s"decomposition identity broken at $k")
    }
    // per-(type, dow) residuals sum to < n (the floor-mean remainder)
    got.toSeq.groupBy { case ((tpe, d), _) => (tpe, d % 7) }.foreach { case (k, rs) =>
      val s = rs.map(_._2._4).sum
      assert(s >= 0 && s < rs.length, s"floor-mean residual bound broken at $k")
    }
  }

  // ------------------------------------------------------------- plan pins

  test("q_winsorize joins the threshold table as a broadcast, never a shuffle") {
    val plan = Relational.qWinsorize(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), "group-cardinality thresholds must broadcast")
  }

  test("q_compact_plan's window partitions by source (parallel, no global sort)") {
    val plan = TableFormat.qCompactPlan(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(source"), plan)
  }

  test("q_skyline aggregates per size before the metadata-sized frontier window") {
    val df = Relational.qSkyline(spark, sf)
    df.collect() // AQE-final plan
    val plan = df.queryExecution.executedPlan.toString
    // the window must consume the aggregated per-size rows, not the table:
    // partial aggregation happens below the single exchange feeding it
    assert(plan.contains("partial_max"), plan)
  }

  // ---------------------------------------------------------- q_kll_rollup

  test("q_kll_rollup quantile estimates sit within the KLL rank-error band") {
    val vals = GraftSession.table(spark, sf, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000 div 7").as("week"),
        floor(col("value")).cast("long").as("v"))
      .collect()
      .map(r => ((r.getAs[String]("event_type"), r.getAs[Long]("week")), r.getAs[Long]("v")))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sorted }
    val rows = Relational.qKllRollup(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = (r.getAs[String]("event_type"), r.getAs[Long]("week"))
      val sorted = vals(k)
      assert(r.getAs[Long]("n") == sorted.length.toLong, s"sketch n diverges at $k")
      // k=200 KLL: normalized rank error ≤ ~1.65%; allow 4% both ways.
      // duplicated integer values span a rank INTERVAL [P(< x), P(<= x)]
      // — the estimate is in-band when its interval intersects the band
      def inBand(x: Long, lo: Double, hi: Double): Boolean = {
        val rLo = sorted.count(_ < x).toDouble / sorted.length
        val rHi = sorted.count(_ <= x).toDouble / sorted.length
        rLo <= hi && rHi >= lo
      }
      assert(inBand(r.getAs[Long]("p50_est"), 0.46, 0.54), s"p50 out of band at $k")
      assert(inBand(r.getAs[Long]("p95_est"), 0.91, 0.99), s"p95 out of band at $k")
      // exact selections really are the positional quantiles
      assert(r.getAs[Long]("p50_exact") == sorted((sorted.length + 1) / 2 - 1))
      assert(r.getAs[Long]("p95_exact") == sorted((19 * sorted.length + 19) / 20 - 1))
    }
  }

  // ---------------------------------------------------------- q_hll_rollup

  test("q_hll_rollup estimates track exact distincts and daily unions equal direct sketches") {
    val rows = Relational.qHllRollup(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Long]("est_users")
      val exact = r.getAs[Long]("exact_users")
      // lgK=12 HLL: sparse-mode is near-exact at these cardinalities
      assert(math.abs(est - exact) <= math.max(2L, exact / 20),
        s"estimate $est too far from exact $exact")
    }
    // mergeability: union of daily sketches ≡ sketching the week directly
    val e = GraftSession.table(spark, sf, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000 div 7").as("week"),
        col("user_id"))
    val direct = e.groupBy(col("event_type"), col("week"))
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("d_est"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("week")) -> r.getAs[Long]("d_est"))
      .toMap
    rows.foreach { r =>
      val k = (r.getAs[String]("event_type"), r.getAs[Long]("week"))
      val union = r.getAs[Long]("est_users")
      val d = direct(k)
      assert(math.abs(union - d) <= math.max(1L, d / 100),
        s"union-of-daily $union diverges from direct sketch $d at $k")
    }
  }

  // --------------------------------------------------------- q_basket_lift

  test("q_basket_lift equals a plain-Scala association-rule replay at sf0.001") {
    val l = GraftSession.table(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getAs[Long]("l_orderkey"), r.getAs[Long]("l_partkey")))
    val nBaskets = l.map(_._1).distinct.length.toLong
    val nItem = l.groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    val pairs = l.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val ps = xs.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (pq, xs) => pq -> xs.length.toLong }
      .filter(_._2 >= 3)
    val scored = pairs.toSeq.map { case ((p1, p2), nBoth) =>
      val (n1, n2) = (nItem(p1), nItem(p2))
      val lift = (BigInt(nBoth) * nBaskets * 1000000 / (BigInt(n1) * n2)).toLong
      (p1, p2, nBoth, n1, n2, nBoth * 1000000L / n1, nBoth * 1000000L / n2, lift)
    }.sortBy(t => (-t._8, t._1, t._2)).take(100)
    val got = Relational.qBasketLift(spark, sf).collect().map { r =>
      (r.getAs[Long]("p1"), r.getAs[Long]("p2"), r.getAs[Long]("n_both"),
        r.getAs[Long]("n_p1"), r.getAs[Long]("n_p2"),
        r.getAs[Long]("conf_p1_p2_ppm"), r.getAs[Long]("conf_p2_p1_ppm"),
        r.getAs[Long]("lift_ppm"))
    }.toSeq
    assert(got == scored)
    // every emitted rule meets min-support and lift is internally consistent
    got.foreach { case (_, _, nBoth, n1, n2, c12, c21, lift) =>
      assert(nBoth >= 3 && c12 <= 1000000L && c21 <= 1000000L)
      assert(lift == (BigInt(nBoth) * nBaskets * 1000000 / (BigInt(n1) * n2)).toLong)
    }
  }

  // -------------------------------------------------------------- q_growth

  test("q_growth satisfies the growth-accounting identities at sf0.001") {
    val act = GraftSession.table(spark, sf, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("day")))
    val dau = act.groupBy(_._2).map { case (d, xs) => d -> xs.length.toLong }
    val rows = Relational.qGrowth(spark, sf).collect().map { r =>
      r.getAs[Long]("day") -> ((r.getAs[Long]("n_new"), r.getAs[Long]("n_retained"),
        r.getAs[Long]("n_resurrected"), r.getAs[Long]("n_churned")))
    }.toMap
    val maxDay = act.map(_._2).max
    rows.foreach { case (d, (nNew, nRet, nRes, nChu)) =>
      // DAU identity: active days decompose exactly
      assert(nNew + nRet + nRes == dau.getOrElse(d, 0L), s"day $d DAU identity")
      // churn identity: yesterday's actives either retain or churn
      if (d > rows.keys.min && d <= maxDay)
        assert(nRet + nChu == dau.getOrElse(d - 1, 0L), s"day $d churn identity")
    }
    // totals: every user is new exactly once
    assert(rows.values.map(_._1).sum == act.map(_._1).distinct.length.toLong)
    // plain-Scala classification replay
    val want = {
      val byUser = act.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).sorted }
      val cls = scala.collection.mutable.Map[(Long, String), Long]().withDefaultValue(0L)
      byUser.values.foreach { ds =>
        ds.zipWithIndex.foreach { case (d, i) =>
          val s = if (i == 0) "new" else if (ds(i - 1) == d - 1) "retained" else "resurrected"
          cls((d, s)) += 1
          val next = if (i + 1 < ds.length) Some(ds(i + 1)) else None
          if (d < maxDay && next.forall(_ > d + 1)) cls((d + 1, "churned")) += 1
        }
      }
      cls.keys.map(_._1).toSeq.distinct.map { d =>
        d -> ((cls((d, "new")), cls((d, "retained")), cls((d, "resurrected")), cls((d, "churned"))))
      }.toMap
    }
    assert(rows == want)
  }

  // ------------------------------------------------------------ emb_kmeans

  test("emb_kmeans equals a plain-Scala assignment replay from the same centroids") {
    import TestSpark.spark.implicits._
    val e = GraftSession.table(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val cents = graft.operators.VectorOps.kmeansCentroids(e, 8).collect()
      .map(r => (r.getAs[Int]("centroid_id"),
        r.getAs[Seq[Long]]("cv").toArray, r.getAs[Double]("cnorm")))
    val pts = e.select(col("id"),
        transform(col("embedding"), x => floor(x.cast("double") * 10000 + 0.5).cast("long")).as("qv"))
      .as[(Long, Seq[Long])].collect()
    def dot(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    // replay the argmax-cosine assignment with the identical IEEE ops
    // and (cos, -cid) tie-break, then the integer cohesion rollup
    val assigned = pts.map { case (_, qvSeq) =>
      val qv = qvSeq.toArray
      val norm = math.sqrt(dot(qv, qv).toDouble)
      val best = cents.map { case (cid, cv, cnorm) =>
        (dot(qv, cv).toDouble / (norm * cnorm), -cid.toLong)
      }.max
      (-best._2, math.floor(best._1 * 1000000 + 0.5).toLong)
    }
    val want = assigned.groupBy(_._1).map { case (cid, xs) =>
      cid -> ((xs.length.toLong, xs.map(_._2).sum / xs.length))
    }
    val got = graft.operators.VectorOps.embKmeans(spark, sf).collect()
      .map(r => r.getAs[Long]("centroid_id") ->
        ((r.getAs[Long]("n_points"), r.getAs[Long]("cohesion_ppm")))).toMap
    assert(got == want)
    // the clusters partition the corpus
    assert(got.values.map(_._1).sum == pts.length.toLong)
  }

  // ------------------------------------------------------ q_xml_roundtrip

  test("q_xml_roundtrip preserves text md5 and byte length exactly") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val want = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((md5hex(r.getAs[String]("text")), r.getAs[String]("text").getBytes("UTF-8").length.toLong)))
      .toMap
    val got = Ingest.qXmlRoundtrip(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("text_md5"), r.getAs[Long]("n_bytes")))).toMap
    assert(got == want)
  }
}
