package graft

import graft.operators.{Bpe, Relational, TextAnalysis, VectorOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round7OpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // ---------------------------------------------------------- text_chunks

  test("text_chunks: window/stride arithmetic — counts, overlap, reassembly") {
    val chunks = TextAnalysis.textChunks(spark, sf).collect()
    val docs = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .as[(Long, Seq[String])].collect().toMap
    val byDoc = chunks.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == docs.keySet, "every document must chunk")
    for ((docId, ws) <- docs) {
      val cs = byDoc(docId).sortBy(_.getAs[Long]("chunk_idx"))
      val expectedChunks = math.max(1, math.ceil(ws.length / 48.0).toInt)
      assert(cs.length == expectedChunks, s"doc $docId: ${cs.length} chunks for ${ws.length} tokens")
      cs.zipWithIndex.foreach { case (c, i) =>
        val expect = ws.slice(i * 48, i * 48 + 64)
        assert(c.getAs[Long]("n_tokens") == expect.length)
        assert(c.getAs[String]("chunk_text") == expect.mkString(" "))
      }
      // stride < window → consecutive chunks overlap by 16 tokens
      if (cs.length > 1 && ws.length >= 64)
        assert(cs(0).getAs[String]("chunk_text").split(" ").takeRight(16).toSeq ==
          cs(1).getAs[String]("chunk_text").split(" ").take(16).toSeq)
    }
  }

  // ------------------------------------------------------ text_bpe_encode

  test("bpe encode kernel equals the plain-Scala merge replay on planted words") {
    val merges = Seq(("a", "b"), ("ab", "c"), ("d", "d"))
    val lefts = merges.map(_._1).toArray
    val rights = merges.map(_._2).toArray
    val words = Seq("abc", "abab", "dddd", "abcabc", "xyz", "a", "ddabcdd")
    val got = words.toDF("word")
      .select(graft.functions.ArrayExprs.bpeEncodeCount(col("word"), lefts, rights).as("n"))
      .as[Long].collect()
    val want = words.map(w => Bpe.encodeWord(w, lefts, rights).length.toLong)
    assert(got.toSeq == want, s"words=$words got=${got.toSeq} want=$want")
    // hand-checked: abc -> [abc]; abab -> [ab, ab]; dddd -> [dd, dd];
    // ddabcdd -> [dd, abc, dd]
    assert(want == Seq(1L, 2L, 2L, 2L, 3L, 1L, 3L))
  }

  test("text_bpe_encode equals a full plain-Scala corpus replay at sf0.001") {
    val numMerges = 8
    // train on the same corpus the query trains on
    val corpus = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), lower(col("text")).as("t")).as[(Long, String)].collect()
    val wordFreq = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    corpus.foreach { case (_, t) => t.split(" ").filter(_.nonEmpty).foreach(w => wordFreq(w) += 1) }
    // exact replay of bpeTrain's argmax loop (same tie-break)
    var syms: Map[String, (List[String], Long)] =
      wordFreq.map { case (w, f) => w -> (w.split("").toList, f) }.toMap
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    for (_ <- 0 until numMerges) {
      val counts = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
      syms.values.foreach { case (ss, f) =>
        ss.zip(ss.drop(1)).foreach(p => counts(p) += f)
      }
      if (counts.nonEmpty) {
        val (l, r) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += ((l, r))
        syms = syms.map { case (w, (ss, f)) =>
          val out = scala.collection.mutable.ListBuffer[String]()
          var rest = ss
          while (rest.nonEmpty) rest match {
            case a :: b :: tail if a == l && b == r => out += (l + r); rest = tail
            case a :: tail => out += a; rest = tail
            case Nil => ()
          }
          w -> ((out.toList, f))
        }
      }
    }
    val expected = corpus.map { case (docId, t) =>
      val ws = t.split(" ").filter(_.nonEmpty)
      val nTok = ws.map(w => syms(w)._1.length.toLong).sum
      (docId, ws.length.toLong, nTok)
    }.sortBy(_._1)
    val got = Bpe.bpeEncode(spark, sf, numMerges)
      .select("doc_id", "n_words", "n_bpe_tokens").as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == expected.toSeq)
  }

  test("text_bpe_encode invariants: merges only shrink, bounds hold") {
    val df = Bpe.bpeEncode(spark, sf).collect()
    df.foreach { r =>
      val words = r.getAs[Long]("n_words")
      val toks = r.getAs[Long]("n_bpe_tokens")
      assert(toks >= words, "a word is at least one token")
      assert(r.getAs[Double]("tokens_per_word") == toks.toDouble / words)
    }
  }

  // ------------------------------------------------------ text_surprisal

  test("text_surprisal equals an exact plain-Scala unigram replay") {
    val corpus = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val tf = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    corpus.foreach { case (_, t) => t.split(" ", -1).foreach(w => tf(w) += 1) }
    val total = tf.values.sum.toDouble
    val srp = tf.map { case (w, f) =>
      w -> math.floor(-math.log(f.toDouble / total) * 1000000.0).toLong
    }
    val expected = corpus.map { case (docId, t) =>
      val ws = t.split(" ", -1)
      val s = ws.map(srp).sum
      (docId, ws.length.toLong, s, s.toDouble / ws.length / 1000000.0)
    }.sortBy(_._1).toSeq
    val got = TextAnalysis.textSurprisal(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == expected)
    // semantics: rare vocabulary scores above stopword-heavy docs
    val means = got.map(_._4)
    assert(means.forall(m => m > 0 && m.isFinite))
  }

  // -------------------------------------------------------- profile_table

  test("profile_table: stats agree with direct computation") {
    val p = Relational.profileTable(spark, sf).collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    assert(p.keySet == Set("l_quantity", "l_extendedprice", "l_discount",
      "l_returnflag", "l_linestatus", "l_shipdate"))
    val l = GraftSession.table(spark, sf, "lineitem")
    val n = l.count()
    p.values.foreach(r => assert(r.getAs[Long]("n_rows") == n))
    assert(p("l_quantity").getAs[Double]("min_d") == l.agg(min("l_quantity")).head.getDouble(0))
    assert(p("l_quantity").getAs[Long]("n_distinct") ==
      l.select("l_quantity").distinct().count())
    assert(p("l_returnflag").getAs[String]("max_s") ==
      l.agg(max("l_returnflag")).head.getString(0))
    assert(p("l_shipdate").getAs[String]("min_s").matches("\\d{4}-\\d{2}-\\d{2}"))
  }

  // ------------------------------------------------------------ q_zorder

  test("q_zorder: z-value interleave is exact and buckets bound BOTH dims simultaneously") {
    // plain-Scala Morton reference on planted pairs
    def spread(x: Long): Long = {
      var m = x & 0xFFFFL
      m = (m | (m << 8)) & 0x00FF00FFL
      m = (m | (m << 4)) & 0x0F0F0F0FL
      m = (m | (m << 2)) & 0x33333333L
      (m | (m << 1)) & 0x55555555L
    }
    def morton(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
    assert(morton(0, 0) == 0 && morton(1, 0) == 1 && morton(0, 1) == 2 && morton(3, 3) == 15)

    val rows = Relational.qZorder(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    val l = GraftSession.table(spark, "/root/testdata/sf0.01", "lineitem")
    val (pMin, pMax) = (l.agg(min("l_partkey")).head.getLong(0), l.agg(max("l_partkey")).head.getLong(0))
    val (sMin, sMax) = (l.agg(min("l_suppkey")).head.getLong(0), l.agg(max("l_suppkey")).head.getLong(0))
    // z-order's defining property: every populated bucket's min-max
    // span is bounded on BOTH dimensions at once (a single-dim sort
    // leaves the other dimension spanning its full range)
    rows.filter(_.getAs[Long]("n_rows") > 1).foreach { r =>
      val pSpan = r.getAs[Long]("max_part") - r.getAs[Long]("min_part")
      val sSpan = r.getAs[Long]("max_supp") - r.getAs[Long]("min_supp")
      assert(pSpan <= (pMax - pMin) / 2, s"bucket ${r.getAs[Long]("z_bucket")}: part span $pSpan")
      assert(sSpan <= (sMax - sMin) / 2, s"bucket ${r.getAs[Long]("z_bucket")}: supp span $sSpan")
    }
  }

  // ---------------------------------------------------------- q_integrity

  test("q_integrity: generated testdata is referentially clean; planted orphans are counted") {
    val clean = Relational.qIntegrity(spark, sf).collect()
    assert(clean.length == 7)
    clean.foreach(r => assert(r.getAs[Long]("n_orphans") == 0L,
      s"${r.getAs[String]("fk_edge")}: ${r.getAs[Long]("n_orphans")} orphans in pristine data"))
  }

  // ------------------------------------------------------------ q7 / q8

  test("q7_volume: both directions present at sf0.01, revenue positive, grouped exactly") {
    val rows = Relational.q7Volume(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    val pairs = rows.map(r => (r.getAs[String]("supp_nation"), r.getAs[String]("cust_nation"))).toSet
    assert(pairs.subsetOf(Set(("NATION_19", "NATION_11"), ("NATION_11", "NATION_19"))))
    rows.foreach(r => assert(r.getAs[Double]("revenue") > 0))
  }

  test("q8_share: share in [0,1] and consistent with its numerator/denominator") {
    val rows = Relational.q8Share(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getAs[Double]("mkt_share")
      val natV = r.getAs[Double]("nation_volume")
      val totV = r.getAs[Double]("total_volume")
      assert(share >= 0.0 && share <= 1.0)
      assert(math.abs(share - natV / totV) < 1e-15)
      assert(totV > 0)
    }
  }

  // ------------------------------------------------------------ q_median

  test("q_median: p25/p50/p75 equal plain-Scala sorted-multiset selection") {
    val got = Relational.qMedian(spark, sf).collect()
    val vals = GraftSession.table(spark, sf, "events")
      .select(col("event_type"), floor(col("value")).cast("long").as("v"))
      .as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    assert(got.length == vals.size)
    got.foreach { r =>
      val vs = vals(r.getAs[String]("event_type"))
      val n = vs.length.toLong
      def pick(rank: Long): Long = vs((rank - 1).toInt)
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("p25") == pick((n + 3) / 4))
      assert(r.getAs[Long]("p50") == pick((n + 1) / 2))
      assert(r.getAs[Long]("p75") == pick((3 * n + 3) / 4))
    }
  }

  // --------------------------------------------------------- q_histogram

  test("q_histogram: buckets partition the domain in order and totals reconcile") {
    val rows = Relational.qHistogram(spark, sf).collect().sortBy(_.getAs[Long]("bucket"))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(b >= 0L && b < 20L)
      assert(r.getAs[Long]("min_cents") <= r.getAs[Long]("max_cents"))
    }
    val cents = GraftSession.table(spark, sf, "orders")
      .select(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as[Long].collect()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == cents.length)
    assert(rows.map(_.getAs[Long]("sum_cents")).sum == cents.sum)
    // equi-width bucketing is monotone in cents: ranges must not overlap
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("max_cents") < b.getAs[Long]("min_cents"))
      case _ => ()
    }
  }

  // ---------------------------------------------------------- q_skewjoin

  test("q_skewjoin: salted join+aggregate equals the plain join+group") {
    val got = Relational.qSkewjoin(spark, sf).collect()
      .map(r => r.getAs[String]("o_orderpriority") -> (r.getAs[Long]("n_items"), r.getAs[Long]("revenue_cents"))).toMap
    val li = GraftSession.table(spark, sf, "lineitem")
      .select(col("l_orderkey").as("o_orderkey"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
    val o = GraftSession.table(spark, sf, "orders").select(col("o_orderkey"), col("o_orderpriority"))
    val plain = li.join(o, "o_orderkey").groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s")).collect()
      .map(r => r.getAs[String]("o_orderpriority") -> (r.getAs[Long]("n"), r.getAs[Long]("s"))).toMap
    assert(got == plain)
  }

  // ------------------------------------------------------- emb_centroids

  test("emb_centroids: equals plain-Scala mean pooling per label") {
    val got = operators.VectorOps.embCentroids(spark, sf).collect()
    val data = GraftSession.table(spark, sf, "embeddings")
      .select(col("label"), col("embedding")).as[(Int, Seq[Float])].collect()
    val byLabel = data.groupBy(_._1)
    val dims = data.head._2.length
    assert(got.length == byLabel.size * dims)
    got.foreach { r =>
      val vecs = byLabel(r.getAs[Int]("label")).map(_._2)
      val pos = r.getAs[Long]("pos").toInt
      val qs = vecs.map(v => math.floor(v(pos).toDouble * 10000 + 0.5).toLong)
      assert(r.getAs[Long]("n") == qs.length.toLong)
      assert(r.getAs[Long]("centroid_q") == math.floor(qs.sum.toDouble / qs.length).toLong)
    }
  }

  // ------------------------------------------------- q18 / q14 / q15

  test("q18_large: only heavy orders, deterministic descending order") {
    val rows = Relational.q18Large(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    rows.foreach(r => assert(r.getAs[Double]("total_qty") > 200))
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q14_promo: share consistent with its exact operands, all months present") {
    val rows = Relational.q14Promo(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("month")).toSet == (1L to 12L).toSet)
    rows.foreach { r =>
      val (p, t, s) = (r.getAs[Double]("promo_revenue"), r.getAs[Double]("total_revenue"), r.getAs[Double]("promo_share"))
      assert(p >= 0 && p <= t)
      assert(s == 100.0 * p / t, "share must be THE single division of its operands")
    }
  }

  test("bucketed copies join with ZERO exchanges when the join is shuffle-bound") {
    // broadcast off: at test SF Catalyst would broadcast the small side
    // and hide the property under test — at 100 TB both sides are big
    // and THIS plan (co-located merge, no exchange) is the one that runs
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = sources.Ingest.bucketedCopy(spark, sf, "orders_t",
        GraftSession.table(spark, sf, "orders").select(col("o_orderkey"), col("o_orderstatus")),
        "o_orderkey", 8)
      val l = sources.Ingest.bucketedCopy(spark, sf, "lineitem_t",
        GraftSession.table(spark, sf, "lineitem").select(col("l_orderkey")),
        "l_orderkey", 8)
      val j = o.join(l, col("o_orderkey") === col("l_orderkey"))
      val n = j.count()
      j.collect() // finalize the adaptive plan
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"co-located join must not shuffle or broadcast:\n$plan")
      val expected = GraftSession.table(spark, sf, "orders")
        .join(GraftSession.table(spark, sf, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .count()
      assert(n == expected, "bucketing must not change the join result")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("text_bigram equals an exact plain-Scala bigram-LM replay") {
    val got = operators.TextAnalysis.textBigramSurprisal(spark, sf).collect()
    val docTexts = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val bigrams = docTexts.flatMap { case (id, t) =>
      val w = t.split(" ", -1) // -1: keep trailing empties, like Spark's split
      w.dropRight(1).zip(w.tail).map(b => (id, b))
    }
    val c2 = bigrams.groupBy(_._2).view.mapValues(_.length).toMap
    val c1 = bigrams.groupBy(_._2._1).view.mapValues(_.length).toMap
    def srp(b: (String, String)): Long =
      math.floor(-math.log(c2(b).toDouble / c1(b._1).toDouble) * 1000000.0).toLong
    val byDoc = bigrams.groupBy(_._1)
    assert(got.length == byDoc.size)
    got.foreach { r =>
      val bs = byDoc(r.getAs[Long]("doc_id")).map(_._2)
      assert(r.getAs[Long]("n_bigrams") == bs.length.toLong)
      assert(r.getAs[Long]("srp_micro_sum") == bs.map(srp).sum)
      // a repeated bigram is never MORE surprising than a singleton
      // context would make it: every score is finite and non-negative
      assert(r.getAs[Long]("srp_micro_sum") >= 0L)
    }
  }

  test("q_corrstats: corr/beta equal a plain-Scala moment computation; corr in [-1,1]") {
    val got = Relational.qCorrstats(spark, sf).collect()
    val per = GraftSession.table(spark, sf, "orders")
      .join(GraftSession.table(spark, sf, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .agg(count(lit(1)).as("x"))
      .select(col("o_orderpriority"), col("x"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("y"))
      .as[(String, Long, Long)].collect()
    val byP = per.groupBy(_._1)
    assert(got.length == byP.size)
    got.foreach { r =>
      val rows = byP(r.getAs[String]("o_orderpriority"))
      val n = rows.length.toDouble
      val sx = rows.map(_._2).sum.toDouble
      val sy = rows.map(_._3).sum.toDouble
      val sxy = rows.map(t => t._2 * t._3).sum.toDouble
      val sxx = rows.map(t => t._2 * t._2).sum.toDouble
      val syy = rows.map(t => BigInt(t._3) * BigInt(t._3)).sum.toDouble
      val cov = n * sxy - sx * sy
      val corr = r.getAs[Double]("corr_items_price")
      val beta = r.getAs[Double]("beta_items_price")
      assert(corr >= -1.0 && corr <= 1.0)
      // replay in double after exact integer moments: agreement to fp
      // tolerance (the DuckDB oracle checks bit-exactness; this checks
      // the math)
      assert(math.abs(corr - cov / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))) < 1e-12)
      assert(math.abs(beta - cov / (n * sxx - sx * sx)) < 1e-12)
      assert(r.getAs[Long]("n_orders") == rows.length.toLong)
    }
  }

  test("sample_negatives: k per anchor, never self, in-domain, deterministic, spread out") {
    val rows = operators.Pipeline.sampleNegatives(spark, sf).collect()
    val n = GraftSession.table(spark, sf, "documents").count()
    assert(rows.length == 3 * n)
    rows.foreach { r =>
      val (a, g) = (r.getAs[Long]("doc_id"), r.getAs[Long]("neg_id"))
      assert(g != a, "an anchor must never be its own negative")
      assert(g >= 0 && g < n)
    }
    val again = operators.Pipeline.sampleNegatives(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq, "md5 draws are deterministic")
    // uniform-ish: a constant-shift sampler would collapse the spread
    assert(rows.map(_.getAs[Long]("neg_id")).distinct.length > n / 2)
  }

  test("q12_priority: bucket counts partition the join and match a plain-Scala replay") {
    val rows = Relational.q12Priority(spark, sf).collect()
    val o = GraftSession.table(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderdate").cast("date").cast("string"), col("o_orderpriority"))
      .as[(Long, String, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val l = GraftSession.table(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate").cast("date").cast("string"))
      .as[(Long, String)].collect()
    val expect = l.map { case (ok, ship) =>
      val (od, prio) = o(ok)
      val days = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(od), java.time.LocalDate.parse(ship))
      (math.floor(days / 30.0).toLong, prio == "1-URGENT" || prio == "2-HIGH")
    }.groupBy(_._1).map { case (b, xs) => b -> (xs.count(_._2).toLong, xs.count(!_._2).toLong) }
    assert(rows.map(_.getAs[Long]("delay_bucket")).toSeq ==
      rows.map(_.getAs[Long]("delay_bucket")).sorted.toSeq)
    assert(rows.map(r => r.getAs[Long]("delay_bucket") ->
      (r.getAs[Long]("high_line_count"), r.getAs[Long]("low_line_count"))).toMap == expect)
  }

  test("q17_small_qty: integer-exact threshold equals the 0.2*avg brute force") {
    val rows = Relational.q17SmallQty(spark, sf).collect()
    val l = GraftSession.table(spark, sf, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .as[(Long, Double, Double)].collect()
    val brand = GraftSession.table(spark, sf, "part")
      .select(col("p_partkey"), col("p_brand")).as[(Long, String)].collect().toMap
    val byPart = l.groupBy(_._1)
    val kept = l.filter { case (pk, q, _) =>
      val grp = byPart(pk); q < 0.2 * grp.map(_._2).sum / grp.length
    }
    val expect = kept.groupBy(t => brand(t._1)).map { case (b, xs) =>
      b -> (xs.length.toLong, xs.map(t => BigDecimal(t._3).setScale(2)).sum.toDouble / 7.0)
    }
    assert(rows.map(r => r.getAs[String]("p_brand") ->
      (r.getAs[Long]("n_lines"), r.getAs[Double]("avg_yearly"))).toMap == expect)
  }

  test("q19_disjunctive: revenue equals the OR-clause brute force") {
    val rows = Relational.q19Disjunctive(spark, sf).collect()
    val part = GraftSession.table(spark, sf, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
      .as[(Long, String, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val l = GraftSession.table(spark, sf, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      .as[(Long, Double, Double, Double)].collect()
    val kept = l.filter { case (pk, q, _, _) =>
      val (b, s) = part(pk)
      (Set("Brand#11", "Brand#12", "Brand#13")(b) && s >= 1 && s <= 20 && q >= 1 && q <= 15) ||
      (Set("Brand#21", "Brand#22", "Brand#23")(b) && s >= 1 && s <= 30 && q >= 10 && q <= 25) ||
      (Set("Brand#31", "Brand#32", "Brand#34")(b) && s >= 1 && s <= 40 && q >= 20 && q <= 40)
    }
    val expect = kept.groupBy(t => part(t._1)._1).map { case (b, xs) =>
      b -> (xs.length.toLong,
        xs.map(t => BigDecimal(t._3).setScale(2) * (BigDecimal(1) - BigDecimal(t._4).setScale(2))).sum.toDouble)
    }
    assert(rows.map(r => r.getAs[String]("p_brand") ->
      (r.getAs[Long]("n_lines"), r.getAs[Double]("revenue"))).toMap == expect)
  }

  test("q21_waiting: only-late-supplier-in-multi-supplier-order counts match brute force") {
    val rows = Relational.q21Waiting(spark, sf).collect()
    val o = GraftSession.table(spark, sf, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate").cast("date").cast("string"))
      .as[(Long, String)].collect().toMap
    val l = GraftSession.table(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate").cast("date").cast("string"))
      .as[(Long, Long, String)].collect().filter(t => o.contains(t._1))
    val flagged = l.map { case (ok, sk, ship) =>
      val days = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(o(ok)), java.time.LocalDate.parse(ship))
      (ok, sk, days > 90)
    }
    val byOrder = flagged.groupBy(_._1)
    val waits = flagged.filter(_._3).map(t => (t._1, t._2)).distinct.filter { case (ok, _) =>
      val grp = byOrder(ok)
      grp.map(_._2).distinct.length >= 2 && grp.filter(_._3).map(_._2).distinct.length == 1
    }
    val sName = GraftSession.table(spark, sf, "supplier")
      .select(col("s_suppkey"), col("s_name")).as[(Long, String)].collect().toMap
    val expect = waits.groupBy(w => sName(w._2)).map { case (n, xs) => n -> xs.length.toLong }
    assert(rows.map(r => r.getAs[String]("s_name") -> r.getAs[Long]("numwait")).toMap == expect)
    // ordered by numwait desc then name
    val pairs = rows.map(r => (r.getAs[Long]("numwait"), r.getAs[String]("s_name")))
    assert(pairs.toSeq == pairs.sortBy(p => (-p._1, p._2)).toSeq)
  }

  test("q22_idle: above-average never-ordered customers match brute force") {
    val rows = Relational.q22Idle(spark, sf).collect()
    val c = GraftSession.table(spark, sf, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      .as[(Long, Long, Double)].collect()
    val ordered = GraftSession.table(spark, sf, "orders")
      .filter(col("o_totalprice") > 350000)
      .select(col("o_custkey")).as[Long].collect().toSet
    val pos = c.filter(_._3 > 0)
    val avgBal = pos.map(t => BigDecimal(t._3).setScale(2)).sum.toDouble / pos.length
    val nName = GraftSession.table(spark, sf, "nation")
      .select(col("n_nationkey"), col("n_name")).as[(Long, String)].collect().toMap
    val kept = c.filter(t => t._3 > avgBal && !ordered.contains(t._1))
    val expect = kept.groupBy(t => nName(t._2)).map { case (n, xs) =>
      n -> (xs.length.toLong, xs.map(t => BigDecimal(t._3).setScale(2)).sum.toDouble)
    }
    assert(rows.nonEmpty)
    assert(rows.map(r => r.getAs[String]("n_name") ->
      (r.getAs[Long]("numcust"), r.getAs[Double]("totacctbal"))).toMap == expect)
  }

  test("q_gapfill: dense grid, zero-count gap days, forward-filled totals") {
    val rows = Relational.qGapfill(spark, sf).collect()
    val daily = GraftSession.table(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).cast("string").as("day"), col("value"))
      .as[(Long, String, Double)].collect()
      .groupBy(t => (t._1, t._2))
      .map { case (k, xs) => k -> (xs.length.toLong, xs.map(t => BigDecimal(t._3).setScale(2)).sum.toDouble) }
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    for ((u, rs) <- byUser) {
      val days = rs.map(_.getAs[java.sql.Date]("day").toLocalDate).sortBy(_.toEpochDay)
      // the grid is dense: consecutive days with no holes
      assert(days.zip(days.tail).forall { case (a, b) => b.toEpochDay == a.toEpochDay + 1 })
      var lastTotal: Option[Double] = None
      for (r <- rs.sortBy(_.getAs[java.sql.Date]("day").toLocalDate.toEpochDay)) {
        val key = (u, r.getAs[java.sql.Date]("day").toString)
        daily.get(key) match {
          case Some((n, tot)) =>
            assert(r.getAs[Long]("n_events") == n)
            lastTotal = Some(tot)
          case None =>
            assert(r.getAs[Long]("n_events") == 0L, s"gap day with events: $key")
        }
        assert(Option(r.getAs[Double]("filled_total")) == lastTotal.orElse(Option(r.getAs[Double]("filled_total"))))
        if (lastTotal.isDefined) assert(r.getAs[Double]("filled_total") == lastTotal.get)
      }
    }
    assert(rows.length == daily.size + rows.count(_.getAs[Long]("n_events") == 0L))
  }

  test("q_retention: cohort cells match the brute-force distinct replay") {
    val rows = Relational.qRetention(spark, sf).collect()
    val ev = GraftSession.table(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).cast("string").as("day"))
      .as[(Long, String)].collect()
    val origin = java.time.LocalDate.parse("2024-01-01")
    val firsts = ev.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).min }
    val cells = ev.map { case (u, d) =>
      val fd = java.time.LocalDate.parse(firsts(u))
      (u, java.time.temporal.ChronoUnit.DAYS.between(origin, fd),
        java.time.temporal.ChronoUnit.DAYS.between(fd, java.time.LocalDate.parse(d)) / 7)
    }.distinct.groupBy(t => (t._2, t._3)).map { case (k, xs) => k -> xs.size.toLong }
    assert(rows.map(r => (r.getAs[Long]("cohort_day"), r.getAs[Long]("offset_week")) ->
      r.getAs[Long]("n_users")).toMap == cells)
  }

  test("sample_weighted: k smallest h/w priorities per source, exact replay") {
    val rows = operators.Pipeline.sampleWeighted(spark, sf).collect()
    val d = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .as[(Long, String, Long)].collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = d.map { case (id, src, nc) =>
      val hex = md.digest(s"$id:priority".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex.take(8), 16)
      (id, src, nc + 1L, h.toDouble / (nc + 1L))
    }.groupBy(_._2).toSeq.flatMap { case (_, xs) => xs.sortBy(t => (t._4, t._1)).take(10).toSeq }.toSet
    assert(rows.length == expect.size)
    assert(rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
      r.getAs[Long]("w"), r.getAs[Double]("priority"))).toSet == expect)
    // weighted: kept docs should skew longer than the corpus average
    val avgAll = d.map(_._3).sum.toDouble / d.length
    val avgKept = rows.map(_.getAs[Long]("w")).sum.toDouble / rows.length
    assert(avgKept > avgAll * 0.9, s"kept avg $avgKept vs corpus $avgAll")
  }

  test("q_scd2: interval chains are contiguous, versioned, and single-current per key") {
    val rows = Relational.qScd2(spark, sf).collect()
    val orderCounts = GraftSession.table(spark, sf, "orders")
      .groupBy(col("o_custkey")).count().as[(Long, Long)].collect().toMap
    val byKey = rows.groupBy(_.getAs[Long]("c_custkey"))
    for ((ck, rs) <- byKey) {
      val sorted = rs.sortBy(_.getAs[Long]("version_seq"))
      // base row + one version per order
      assert(sorted.length == 1 + orderCounts.getOrElse(ck, 0L).toInt)
      assert(sorted.map(_.getAs[Long]("version_seq")).toSeq == (1L to sorted.length).toSeq)
      // contiguous: each valid_to equals the successor's valid_from; only the last is open
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a.getAs[java.sql.Timestamp]("valid_to") == b.getAs[java.sql.Timestamp]("valid_from"))
        assert(!a.getAs[Boolean]("is_current"))
      }
      assert(sorted.last.getAs[Boolean]("is_current"))
      assert(sorted.last.getAs[java.sql.Timestamp]("valid_to") == null)
    }
    assert(byKey.keySet == GraftSession.table(spark, sf, "customer")
      .select(col("c_custkey")).as[Long].collect().toSet)
  }

  test("ann_classify: majority vote of exact-cosine 5-NN matches a plain-Scala replay") {
    val rows = VectorOps.annClassify(spark, sf).collect()
    val all = GraftSession.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
      .as[(Long, Seq[Float], Int)].collect()
      .map { case (id, v, l) => (id, v.map(x => math.floor(x.toDouble * 10000 + 0.5).toLong).toArray, l) }
    val held = all.filter(_._1 % 25 == 0)
    val labeled = all.filter(_._1 % 25 != 0)
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) * math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val expect = held.map { case (qid, qv, tl) =>
      val nn = labeled.map { case (nid, nv, nl) => (nid, nl, cos(qv, nv)) }
        .sortBy(t => (-t._3, t._1)).take(5)
      val (predLabel, votes) = nn.groupBy(_._2).map { case (l, xs) => (l, xs.length) }
        .toSeq.sortBy(t => (-t._2, t._1)).head
      qid -> (tl, predLabel.toLong, votes.toLong)
    }.toMap
    assert(rows.length == expect.size && rows.nonEmpty)
    rows.foreach { r =>
      val (tl, pl, v) = expect(r.getAs[Long]("query_id"))
      assert(r.getAs[Int]("true_label") == tl)
      assert(r.getAs[Long]("pred_label") == pl)
      assert(r.getAs[Long]("votes") == v)
      assert(r.getAs[Boolean]("correct") == (pl == tl))
    }
  }

  test("text_pmi: micro-nat PMI equals the plain-Scala replay") {
    val rows = TextAnalysis.textPmi(spark, sf).collect()
    val bigrams = GraftSession.table(spark, sf, "documents")
      .select(col("text")).as[String].collect()
      .flatMap { t => val w = t.split(" ", -1); w.zip(w.tail) }
    val c2 = bigrams.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val cl = bigrams.groupBy(_._1).map { case (k, xs) => k -> xs.length.toLong }
    val cr = bigrams.groupBy(_._2).map { case (k, xs) => k -> xs.length.toLong }
    val n = bigrams.length.toLong
    val expect = c2.filter(_._2 >= 5).map { case ((w1, w2), c) =>
      (w1, w2, c, math.floor(math.log((c * n).toDouble / (cl(w1) * cr(w2)).toDouble) * 1000000.0).toLong)
    }.toSeq.sortBy(t => (-t._4, t._1, t._2)).take(50)
    assert(rows.map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
      r.getAs[Long]("c2"), r.getAs[Long]("pmi_micro"))).toSeq == expect)
  }

  test("q_copurchase: oriented pair counts match the brute-force basket scan") {
    val rows = Relational.qCopurchase(spark, sf).collect()
    val baskets = GraftSession.table(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).as[(Long, Long)].collect()
      .distinct.groupBy(_._1).values.map(_.map(_._2).sorted)
    val counts = baskets.flatMap(ps => for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j)))
      .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val expect = counts.toSeq.sortBy(t => (-t._2, t._1._1, t._1._2)).take(100)
      .map { case ((p1, p2), c) => (p1, p2, c) }
    assert(rows.map(r => (r.getAs[Long]("p1"), r.getAs[Long]("p2"), r.getAs[Long]("n_orders"))).toSeq == expect)
  }

  test("q_triangles: per-corner counts match the brute-force enumeration") {
    val rows = operators.Graph.qTriangles(spark, sf).collect()
    val cn = GraftSession.table(spark, sf, "customer")
      .select(col("c_custkey"), col("c_nationkey")).as[(Long, Int)].collect().toMap
    val sn = GraftSession.table(spark, sf, "supplier")
      .select(col("s_suppkey"), col("s_nationkey")).as[(Long, Int)].collect().toMap
    val ok2ck = GraftSession.table(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey")).as[(Long, Long)].collect().toMap
    val edges = GraftSession.table(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey")).as[(Long, Long)].collect()
      .map { case (ok, sk) => (cn(ok2ck(ok)), sn(sk)) }
      .filter(t => t._1 != t._2)
      .map(t => (math.min(t._1, t._2), math.max(t._1, t._2))).distinct.toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tris = for {
      a <- nodes; b <- nodes if a < b && edges((a, b))
      c <- nodes if b < c && edges((b, c)) && edges((a, c))
    } yield (a, b, c)
    val expect = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    assert(rows.map(r => r.getAs[Int]("nationkey") -> r.getAs[Long]("n_triangles")).toMap == expect)
    assert(rows.nonEmpty)
  }

  test("text_entropy: micro-nat entropy equals the plain-Scala replay") {
    val rows = TextAnalysis.textEntropy(spark, sf).collect()
    val docs = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val expect = docs.map { case (id, t) =>
      val ws = t.split(" ", -1)
      val counts = ws.groupBy(identity).map { case (_, xs) => xs.length.toLong }
      val n = ws.length.toLong
      val sumMicro = counts.map(c => c * math.floor(math.log(n.toDouble / c.toDouble) * 1000000.0).toLong).sum
      (id, n, counts.size.toLong, math.floor(sumMicro.toDouble / n.toDouble).toLong)
    }.sortBy(_._1).toSeq
    assert(rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
      r.getAs[Long]("n_distinct"), r.getAs[Long]("entropy_micro"))).toSeq == expect)
    // repeated text must carry less entropy than diverse text overall
    assert(rows.exists(_.getAs[Long]("entropy_micro") > 0))
  }

  test("q_ntile: deciles partition each segment evenly and monotonically") {
    val rows = Relational.qNtile(spark, sf).collect()
    val bySeg = rows.groupBy(_.getAs[String]("c_mktsegment"))
    val custSeg = GraftSession.table(spark, sf, "orders")
      .select(col("o_custkey")).distinct()
      .join(GraftSession.table(spark, sf, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("c_mktsegment") -> r.getAs[Long]("n")).toMap
    bySeg.foreach { case (seg, ds) =>
      val sorted = ds.sortBy(_.getAs[Int]("decile"))
      assert(sorted.map(_.getAs[Long]("n_customers")).sum == custSeg(seg))
      // ntile sizes differ by at most one, larger buckets first
      val sizes = sorted.map(_.getAs[Long]("n_customers"))
      assert(sizes.max - sizes.min <= 1)
      assert(sizes.sorted.reverse.toSeq == sizes.toSeq)
      // descending spend order: decile d's min >= decile d+1's max
      sorted.sliding(2).foreach {
        case Array(hi, lo) =>
          assert(hi.getAs[Double]("min_spend") >= lo.getAs[Double]("max_spend"))
        case _ =>
      }
    }
  }

  test("q_bloom_prune: bloom path equals the plain semi join, and the probe prunes") {
    val lineitem = GraftSession.table(spark, sf, "lineitem")
    val sel = GraftSession.table(spark, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
    val plain = lineitem
      .join(sel.select(col("o_orderkey")), col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n_items"))
      .collect().map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n_items")).toMap
    val got = Relational.qBloomPrune(spark, sf).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n_items")).toMap
    assert(got == plain)

    // the probe alone (before the verify join) must pass every true
    // match and prune the vast majority of the fact
    val keys = sel.select(col("o_orderkey")).distinct()
    val bloom = keys.stat.bloomFilter("o_orderkey", math.max(1000L, keys.count()), 0.01)
    val total = lineitem.count()
    val trueMatches = lineitem
      .join(keys, col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val passed = lineitem
      .filter(graft.functions.ArrayExprs.bloomMightContain(col("l_orderkey"), bloom))
      .count()
    assert(passed >= trueMatches, "bloom may never produce a false negative")
    assert(passed < total / 5, s"probe should prune hard: $passed of $total passed")
  }

  test("text_heavy_hitters: sketch-then-verify equals the exact count, and MG is a superset") {
    val rows = TextAnalysis.textHeavyHitters(spark, sf).collect()
    val toks = GraftSession.table(spark, sf, "documents")
      .select(col("text")).as[String].collect().flatMap(_.split(" ", -1))
    val n = toks.length.toLong
    val s = math.max(5L, math.floor(n.toDouble / 1000.0).toLong)
    val exact = toks.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
      .filter(_._2 >= s).toSeq.sortBy(t => (-t._2, t._1))
    assert(rows.map(r => (r.getAs[String]("w"), r.getAs[Long]("c"))).toSeq == exact)

    // MG guarantee on a skewed stream: any term with freq > n/(k+1)
    // survives the summary regardless of arrival order
    val stream = Array.fill(400)("hot") ++ (1 to 300).map(i => s"cold$i")
    val shuffled = new scala.util.Random(7).shuffle(stream.toSeq)
    val mg = TextAnalysis.misraGries(shuffled.iterator, 10).toMap
    assert(mg.contains("hot"), "a term above n/(k+1) must survive Misra-Gries")
    assert(mg.size <= 10)

    // plan pin: the candidate filter must be a broadcast LEFT SEMI
    // join, never an `isin` literal list (counters×partitions string
    // literals compiled into the plan — Janino pressure at 100×
    // partition counts)
    val plan = TextAnalysis.textHeavyHitters(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan.take(2000))
    assert(!plan.contains(" IN ("), "candidate set must not compile into an IN literal list")
  }

  test("phash kernel equals the plain-Scala block-parity replay, and edits stay close") {
    val texts = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    def replay(b: Array[Byte]): Long = {
      if (b.isEmpty) return 0L
      val sums = new Array[Long](62)
      b.indices.foreach(j => sums((j.toLong * 62 / b.length).toInt) += (b(j) & 0xff).toLong)
      sums.zipWithIndex.collect { case (sv, i) if (sv & 1L) == 1L => 1L << i }.sum
    }
    val got = graft.multimodal.Multimodal.multimodalPhash(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("phash")).toMap
    texts.foreach { case (id, t) => assert(got(id) == replay(t.getBytes("UTF-8")), s"doc $id") }

    // a single byte edit flips at most 1 block parity → hamming ≤ 1;
    // pigeonhole blocking at ≤ 3 must therefore catch single-edit dups
    val base = texts.head._2.getBytes("UTF-8")
    val edited = base.clone(); edited(base.length / 2) = (edited(base.length / 2) ^ 1).toByte
    assert(java.lang.Long.bitCount(replay(base) ^ replay(edited)) <= 1)
  }

  test("multimodal_phash_pairs: pigeonhole blocking equals the brute-force hamming scan") {
    val hashes = graft.multimodal.Multimodal.phashCorpus(spark, sf)
      .select(col("doc_id"), graft.functions.ArrayExprs.blockParityHash(col("payload")).as("phash"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("phash"))
    val brute = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      h = java.lang.Long.bitCount(ha ^ hb) if h <= 3
    } yield (a, b, h.toLong)).sortBy(t => (t._1, t._2)).toSeq
    val got = graft.multimodal.Multimodal.multimodalPhashPairs(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Long]("hamming"))).toSeq
    assert(got == brute)
    // every planted re-encode must be caught next to its original
    val planted = hashes.map(_._1).filter(_ >= 100000).map(id => (id - 100000, id))
    val gotPairs = got.map(t => (t._1, t._2)).toSet
    planted.foreach { p => assert(gotPairs.contains(p), s"planted pair $p missed") }
    assert(planted.nonEmpty)
  }

  test("connectedComponents: hand graph, path chain, and union-find corpus replay") {
    // hand graph: component {1,2,3}, a 6-node path 10-…-15 (exercises
    // pointer jumping), an isolated edge {20,21}
    val handEdges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (12L, 13L),
      (13L, 14L), (14L, 15L), (20L, 21L))
    val e = handEdges.flatMap { case (u, v) => Seq((u, v), (v, u)) }.toDF("u", "v")
    val got = operators.Graph.connectedComponents(e).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("lbl")).toMap
    val expect = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L,
      13L -> 10L, 14L -> 10L, 15L -> 10L, 20L -> 20L, 21L -> 20L)
    assert(got == expect)

    // corpus: q_components equals a plain union-find over the same edges
    val l = GraftSession.table(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).as[(Long, Long)].collect().distinct
    val pairs = l.groupBy(_._1).values.flatMap { ps =>
      val parts = ps.map(_._2).sorted
      for (i <- parts.indices; j <- i + 1 until parts.length) yield (parts(i), parts(j))
    }.groupBy(identity).filter(_._2.size >= 2).keysIterator.toSeq
    // (keysIterator, NOT .collect{...=>k}: collect on a Map with a
    // tuple-valued PF rebuilds a Map and silently collapses pairs
    // sharing a first element)
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = { val p = parent.getOrElseUpdate(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    pairs.foreach { case (u, v) => val (ru, rv) = (find(u), find(v)); if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv) }
    val expectCorpus = parent.keys.map(n => n -> find(n)).toMap
    val gotCorpus = operators.Graph.qComponents(spark, sf).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("component")).toMap
    assert(gotCorpus == expectCorpus)
  }

  test("emb_pca: exact replay, orthonormal components, variance ordering") {
    val e = GraftSession.table(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val (mu, ws, eigs) = VectorOps.pcaComponents(e, 2)
    // orthonormal, variance-ordered, non-negative spectrum
    def dot(a: Array[Double], b: Array[Double]) = a.zip(b).map(t => t._1 * t._2).sum
    assert(math.abs(dot(ws(0), ws(0)) - 1.0) < 1e-9)
    assert(math.abs(dot(ws(1), ws(1)) - 1.0) < 1e-9)
    assert(math.abs(dot(ws(0), ws(1))) < 1e-9)
    assert(eigs(0) >= eigs(1) && eigs(1) >= 0.0)

    // exact replay of the projection arithmetic (same quantization,
    // same left-to-right order)
    val raw = GraftSession.table(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
    val expect = raw.map { case (id, xs) =>
      val qv = xs.map(x => math.floor(x.toDouble * 10000 + 0.5).toLong)
      val pcs = ws.map { w =>
        var s = 0.0
        qv.indices.foreach(i => s += (qv(i) / 10000.0 - mu(i)) * w(i))
        s
      }
      (id, math.floor(pcs(0) * 1000000.0 + 0.5).toLong, math.floor(pcs(1) * 1000000.0 + 0.5).toLong)
    }.sortBy(_._1).toSeq
    val got = VectorOps.embPca(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("pc1_micro"), r.getAs[Long]("pc2_micro"))).toSeq
    assert(got == expect)

    // projected variance matches the reported eigenvalue (vᵀCv)
    val projs = expect.map(_._2 / 1e6)
    val m = projs.sum / projs.length
    val v1 = projs.map(p => (p - m) * (p - m)).sum / projs.length
    assert(math.abs(v1 - eigs(0)) < 1e-3 * math.max(1.0, eigs(0)))

    // planted dominant axis is recovered
    val axis = Array(2.0, 1.0) ++ Array.fill(62)(0.0)
    val nrm = math.sqrt(dot(axis, axis))
    val planted = (0 until 200).map { t =>
      val a = (t - 100) / 50.0
      (t.toLong, axis.map(x => (a * x / nrm).toFloat).toSeq)
    }.toDF("id", "embedding")
    val (_, wsP, _) = VectorOps.pcaComponents(planted, 1)
    assert(math.abs(dot(wsP(0), axis.map(_ / nrm))) > 0.999)
  }

  test("q_skew_report: top keys and ratios equal the plain-Scala replay") {
    val rows = Relational.qSkewReport(spark, sf).collect()
    val keys = GraftSession.table(spark, sf, "lineitem")
      .select(col("l_suppkey")).as[Long].collect()
    val counts = keys.groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    val nTotal = keys.length.toLong
    val nKeys = counts.size.toLong
    val maxC = counts.values.max
    val expect = counts.toSeq.sortBy(t => (-t._2, t._1)).take(10).map { case (k, c) =>
      (k, c, math.floor(c.toDouble * 1000000.0 / nTotal.toDouble).toLong, nKeys,
        math.floor(maxC.toDouble * nKeys.toDouble / nTotal.toDouble * 1000000.0).toLong)
    }
    assert(rows.map(r => (r.getAs[Long]("l_suppkey"), r.getAs[Long]("c"),
      r.getAs[Long]("share_ppm"), r.getAs[Long]("n_keys"), r.getAs[Long]("skew_micro"))).toSeq == expect)
  }

  test("q_orderpath: journey strings equal the ordered plain-Scala replay") {
    val rows = Relational.qOrderpath(spark, sf).collect()
    val orders = GraftSession.table(spark, sf, "orders")
      .select(col("o_custkey"), unix_micros(col("o_orderdate").cast("timestamp")), col("o_orderkey"),
        substring(col("o_orderpriority"), 1, 1))
      .as[(Long, Long, Long, String)].collect()
    val expect = orders.groupBy(_._1).map { case (ck, os) =>
      val sorted = os.sortBy(o => (o._2, o._3))
      (ck, os.length.toLong, sorted.map(_._4).mkString(">"))
    }.toSeq.sortBy(_._1)
    assert(rows.map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("n_orders"),
      r.getAs[String]("path"))).toSeq == expect)
  }

  test("q_ivm_merge: algebraic merge equals full recompute") {
    val rows = Relational.qIvmMerge(spark, sf).collect()
    val full = GraftSession.table(spark, sf, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("spend"))
      .orderBy("o_custkey").collect()
    assert(rows.map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("n_orders"), r.getAs[Double]("spend"))).toSeq ==
      full.map(r => (r.getAs[Long]("o_custkey"), r.getAs[Long]("n_orders"), r.getAs[Double]("spend"))).toSeq)
  }

  test("lake_cdc_split: gear replay, coverage bounds, insertion re-sync") {
    import graft.functions.GearCdcChunks
    def gearChunks(b: Array[Byte]): Seq[Int] = {
      val gear = GearCdcChunks.gearTable
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      var h = 0L; var len = 0
      b.foreach { byte =>
        h = (h << 1) + gear(byte & 0xff); len += 1
        if ((len >= 32 && (h & 63L) == 0L) || len >= 256) { out += len; h = 0L; len = 0 }
      }
      if (len > 0) out += len
      out.toSeq
    }
    val texts = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().toMap
    val rows = operators.LakeOps.lakeCdcSplit(spark, sf).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    texts.filter(_._2.nonEmpty).foreach { case (id, t) =>
      val b = t.getBytes("UTF-8")
      val expectLens = gearChunks(b)
      val cs = byDoc(id).sortBy(_.getAs[Long]("part_idx"))
      assert(cs.map(_.getAs[Long]("part_len").toInt).toSeq == expectLens, s"doc $id")
      assert(expectLens.sum == b.length)
      // every non-final chunk respects [min, max]; the final only max
      expectLens.dropRight(1).foreach(l => assert(l >= 32 && l <= 256))
      assert(expectLens.last <= 256)
      // offsets are the running sum
      assert(cs.map(_.getAs[Long]("off")).toSeq == expectLens.scanLeft(0L)(_ + _).dropRight(1).toSeq)
    }

    // content-defined boundaries re-sync after an insertion: most of
    // the shifted tail keeps its chunk content (fixed-size would lose
    // every downstream chunk)
    val big = texts.values.maxBy(_.length).getBytes("UTF-8")
    assert(big.length > 400, "need a long doc for the resync property")
    val edited = big.take(100) ++ "INSERTED".getBytes("UTF-8") ++ big.drop(100)
    def contents(b: Array[Byte]): Seq[String] = {
      val lens = gearChunks(b)
      lens.scanLeft(0)(_ + _).zip(lens).map { case (off, l) => new String(b.slice(off, off + l), "UTF-8") }
    }
    val orig = contents(big)
    val after = contents(edited)
    val shared = after.toSet.intersect(orig.toSet).size
    assert(shared >= orig.size / 2, s"only $shared of ${orig.size} chunks survived the insertion")
  }

  test("text_quality_calibrated: percentiles equal the per-source rank replay") {
    val rows = TextAnalysis.textQualityCalibrated(spark, sf).collect()
    val scored = rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Double]("quality_score")))
    val expect = scored.groupBy(_._2).toSeq.flatMap { case (_, ds) =>
      val sorted = ds.sortBy(d => (d._3, d._1))
      val n = sorted.length
      sorted.zipWithIndex.map { case (d, i) =>
        d._1 -> (if (n == 1) 0L else math.floor(i.toDouble / (n - 1) * 1000000.0 + 0.5).toLong)
      }.toSeq
    }
    val got = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("pct_micro")).toMap
    expect.foreach { case (id, p) => assert(got(id) == p, s"doc $id") }
    // calibration property: every source's top-scored doc sits at 100%
    assert(rows.groupBy(_.getAs[String]("source")).values
      .forall(_.map(_.getAs[Long]("pct_micro")).max == 1000000L))
  }

  test("q15_top_supplier: winners all carry the max revenue over the window") {
    val rows = Relational.q15TopSupplier(spark, sf).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue")).distinct
    assert(revs.length == 1, "every returned supplier ties at the max")
  }

  // --------------------------------------------------------------- q_markov

  test("q_markov equals a plain-Scala consecutive-pair replay") {
    val rows = Relational.qMarkov(spark, sf).collect()
    val events = GraftSession.table(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)].collect()
    val expect = events.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._2, e._3)).map(_._4).toList.sliding(2).collect { case List(f, t) => (f, t) }
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val fromTotals = expect.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    assert(rows.map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type"))).toSet ==
      expect.keySet, "transition pair space")
    rows.foreach { r =>
      val key = (r.getAs[String]("from_type"), r.getAs[String]("to_type"))
      assert(r.getAs[Long]("n") == expect(key), s"count for $key")
      assert(r.getAs[Long]("prob_ppm") == expect(key) * 1000000L / fromTotals(key._1), s"ppm for $key")
    }
    // probabilities per from_type sum to 1e6 minus only floor losses
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (f, rs) =>
      val s = rs.map(_.getAs[Long]("prob_ppm")).sum
      assert(s <= 1000000L && s > 1000000L - rs.length, s"ppm mass for $f: $s")
    }
  }

  // ------------------------------------------------------------- q_item_sim

  test("q_item_sim equals the brute-force co-purchase cosine") {
    val rows = Relational.qItemSim(spark, sf).collect()
    assert(rows.nonEmpty)
    val l = GraftSession.table(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .as[(Long, Long)].collect()
    val byOrder = l.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val itemN = l.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val pairN = byOrder.values.toSeq
      .flatMap(ps => ps.toSeq.sorted.combinations(2).map { case Seq(a, b) => (a, b) })
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expect = pairN.collect { case ((p1, p2), n) if n >= 3 =>
      ((p1, p2), (n, math.floor(1000000.0 * n / math.sqrt((itemN(p1) * itemN(p2)).toDouble)).toLong))
    }.toMap
    // returned top-100 must be the lexicographic head of the full ranking
    val fullRank = expect.toSeq
      .map { case ((p1, p2), (n, c)) => (c, p1, p2, n) }
      .sortBy { case (c, p1, p2, _) => (-c, p1, p2) }
    rows.zip(fullRank.take(rows.length)).foreach { case (r, (c, p1, p2, n)) =>
      assert(r.getAs[Long]("p1") == p1 && r.getAs[Long]("p2") == p2, "ranking order")
      assert(r.getAs[Long]("n_both") == n && r.getAs[Long]("cosine_ppm") == c, s"pair ($p1,$p2)")
      assert(r.getAs[Long]("n1") == itemN(p1) && r.getAs[Long]("n2") == itemN(p2))
    }
  }

  // ---------------------------------------------------------- text_inverted

  test("text_inverted postings md5-match a plain-Scala index build") {
    val rows = TextAnalysis.textInverted(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val index = docs.flatMap { case (id, t) => t.split(" ", -1).filter(_.nonEmpty).map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val expected = index.filter(_._2.distinct.length >= 20)
    assert(rows.map(_.getAs[String]("word")).toSet == expected.keySet, "vocabulary at df floor")
    rows.foreach { r =>
      val w = r.getAs[String]("word")
      val ids = index(w)
      val posting = ids.distinct.sorted
      assert(r.getAs[Long]("df") == posting.length && r.getAs[Long]("posting_len") == posting.length)
      assert(r.getAs[Long]("tf_total") == ids.length, s"tf for '$w'")
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(posting.mkString(",").getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getAs[String]("posting_md5") == md5, s"posting bytes for '$w'")
    }
  }
}
