package graft

import graft.operators.{Relational, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 additions: plain-Scala replays for the session's new
  * operators (SURVEY §2 rows 21cp q_gini, 21cq q_acf, 33ac
  * text_overlap). Each test recomputes the statistic from the raw
  * tables with the NAIVE definition — per-customer rank sums, a dense
  * day-grid Pearson, literal shingle sets — so the distributed
  * compressed-histogram / moment-sum / self-join formulations are
  * pinned to the textbook semantics, not just to the DuckDB oracle's
  * identical algebra.
  */
class Round15OpsSpec extends AnyFunSuite {
  import TestSpark._

  test("q_gini: compressed-histogram Gini equals the naive per-customer rank-sum definition") {
    val spend = GraftSession.table(spark, sf, "orders")
      .select(col("o_custkey"),
        (col("o_totalprice").cast("decimal(12,2)") * 100).cast("long").as("cents"))
      .groupBy("o_custkey").agg(sum("cents").as("cents"))
    val per = GraftSession.table(spark, sf, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
      .join(spend, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_mktsegment"), coalesce(col("cents"), lit(0L)).as("cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

    val want = per.groupBy(_._1).view.mapValues { xs =>
      val sorted = xs.map(_._2).sorted // naive: sort EVERY customer, rank 1..n
      val n = BigInt(sorted.length)
      val sx = sorted.map(BigInt(_)).sum
      val srx = sorted.zipWithIndex.map { case (x, i) => BigInt(x) * (i + 1) }.sum
      ((BigInt(2) * srx - (n + 1) * sx) * 1000000 / (n * sx)).toLong
    }.toMap

    val got = Relational.qGini(spark, sf).collect()
      .map(r => r.getAs[String]("c_mktsegment") ->
        (r.getAs[Long]("n_customers"), r.getAs[Long]("gini_ppm"))).toMap
    assert(got.keySet == want.keySet)
    val nPer = per.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    for ((seg, (n, gini)) <- got) {
      assert(n == nPer(seg), s"$seg customer count")
      assert(gini == want(seg), s"$seg gini_ppm: got $gini want ${want(seg)}")
      assert(gini >= 0L && gini < 1000000L, s"$seg gini in [0, 1)")
    }
  }

  test("q_acf: moment-sum ACF equals a naive dense-grid Pearson (exact BigInt moments)") {
    val ev = GraftSession.table(spark, sf, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val d0 = ev.map(_._2).min
    val d1 = ev.map(_._2).max
    val counts = ev.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val types = ev.map(_._1).distinct.sorted

    def acfWant(t: String, lag: Int): (Long, Double) = {
      val series = (d0 to d1).map(d => counts.getOrElse((t, d), 0L))
      val pairs = series.dropRight(lag).zip(series.drop(lag))
      val n = BigInt(pairs.length)
      val sx = pairs.map(p => BigInt(p._1)).sum
      val sy = pairs.map(p => BigInt(p._2)).sum
      val sxy = pairs.map(p => BigInt(p._1) * BigInt(p._2)).sum
      val sxx = pairs.map(p => BigInt(p._1) * BigInt(p._1)).sum
      val syy = pairs.map(p => BigInt(p._2) * BigInt(p._2)).sum
      val num = (n * sxy - sx * sy).toDouble
      val den = math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
      (pairs.length.toLong, num / den)
    }

    val got = Relational.qAcf(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("lag")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Double]("acf"))).toMap
    assert(got.keySet == types.flatMap(t => (1L to 7L).map(t -> _)).toSet)
    for (t <- types; lag <- 1 to 7) {
      val (wn, wa) = acfWant(t, lag)
      val (gn, ga) = got((t, lag.toLong))
      assert(gn == wn, s"($t, $lag) n_pairs")
      // exact integer moments feed one double expression on both
      // sides; same inputs, same IEEE ops => bit-identical result
      assert(ga == wa, s"($t, $lag) acf: got $ga want $wa")
      assert(ga >= -1.0000001 && ga <= 1.0000001, s"($t, $lag) acf in [-1, 1]")
    }
  }

  test("text_js: closed-form private-mass decomposition equals a naive full-vocabulary JS") {
    val docs = GraftSession.table(spark, sf, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val tf: Map[String, Map[String, Long]] = docs.groupBy(_._1).view.mapValues { ds =>
      ds.iterator.flatMap(_._2.split(" ", -1)).toSeq
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
    }.toMap
    val sources = tf.keys.toSeq.sorted

    // naive reference: full-vocabulary JS with NO decomposition and NO
    // quantization — ½Σ p·ln(p/m) + ½Σ q·ln(q/m) over the term union
    def jsNaive(a: String, b: String): Double = {
      val (ta, tb) = (tf(a), tf(b))
      val (na, nb) = (ta.values.sum.toDouble, tb.values.sum.toDouble)
      (ta.keySet ++ tb.keySet).iterator.map { t =>
        val p = ta.getOrElse(t, 0L) / na
        val q = tb.getOrElse(t, 0L) / nb
        val m = (p + q) / 2
        (if (p > 0) p * math.log(p / m) else 0.0) / 2 +
          (if (q > 0) q * math.log(q / m) else 0.0) / 2
      }.sum
    }

    val got = graft.operators.TextAnalysis.textJs(spark, sf).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        (r.getAs[Long]("n_shared"), r.getAs[Double]("js_nats"))).toMap
    val wantPairs = for {
      i <- sources.indices; j <- (i + 1) until sources.length
    } yield (sources(i), sources(j))
    assert(got.keySet == wantPairs.toSet)
    val ln2 = math.log(2.0)
    for ((a, b) <- wantPairs) {
      val (n, js) = got((a, b))
      val shared = tf(a).keySet.intersect(tf(b).keySet)
      assert(n == shared.size.toLong, s"($a,$b) shared-term count")
      assert(js >= -1e-12 && js <= ln2 + 1e-12, s"($a,$b) JS in [0, ln 2]: $js")
      // the engine quantizes shared contributions to pico-nats; with
      // ≤ n_shared terms the total quantization error is < n·1e-12
      val tol = (shared.size + 1) * 1e-12
      assert(math.abs(js - jsNaive(a, b)) <= tol,
        s"($a,$b) js: got $js naive ${jsNaive(a, b)} tol $tol")
    }
  }

  test("text_overlap_sketch: MinHash estimate tracks the exact Jaccard matrix") {
    val exact = graft.operators.TextAnalysis.textOverlap(spark, sf).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        r.getAs[Long]("jaccard_ppm")).toMap
    val est = graft.operators.TextAnalysis.textOverlapSketch(spark, sf).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        (r.getAs[Long]("n_matches"), r.getAs[Long]("est_jaccard_ppm"))).toMap
    assert(est.keySet == exact.keySet, "sketch covers every source pair")
    var sumAbsErr = 0.0
    for ((pair, (m, e)) <- est) {
      assert(m >= 0L && m <= 128L)
      assert(e == m * 1000000L / 128L)
      // per-pair: 5σ binomial bound, σ = √(J(1−J)/K) ≤ 0.0442 at K=128
      val err = math.abs(e - exact(pair)) / 1e6
      assert(err <= 0.25, s"$pair estimate off by $err (exact ${exact(pair)} est $e)")
      sumAbsErr += err
    }
    // and in aggregate the estimator must actually track the matrix,
    // not just stay inside a loose per-pair cap
    assert(sumAbsErr / est.size <= 0.06,
      s"mean |error| ${sumAbsErr / est.size} exceeds the K=128 expectation")
  }

  test("text_overlap_sketch: signatures replay bit-exactly in plain Scala and merge by element-wise min") {
    val docs = GraftSession.table(spark, sf, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def shingles(text: String): Set[String] = {
      val ws = text.split(" ", -1)
      if (ws.length >= 3) ws.sliding(3).map(_.mkString(" ")).toSet
      else Set(ws.mkString(" "))
    }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val P = 4294967311L
    def sigOf(grams: Set[String]): Array[Long] = {
      val hs = grams.toArray.map(g => java.lang.Long.parseLong(md5hex(g).take(8), 16))
      Array.tabulate(128)(j => hs.map(h => ((2L * j + 1) * h + j) % P).min)
    }
    val bySource = docs.groupBy(_._1).view
      .mapValues(ds => ds.iterator.flatMap(d => shingles(d._2)).toSet).toMap
    val sigs = bySource.view.mapValues(sigOf).toMap
    val sources = sigs.keys.toSeq.sorted

    val got = graft.operators.TextAnalysis.textOverlapSketch(spark, sf).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        r.getAs[Long]("n_matches")).toMap
    for (i <- sources.indices; j <- (i + 1) until sources.length) {
      val (a, b) = (sources(i), sources(j))
      val want = (0 until 128).count(k => sigs(a)(k) == sigs(b)(k)).toLong
      assert(got((a, b)) == want, s"($a,$b) match count replay")
    }

    // mergeability — the property that makes the sketch an
    // incremental-corpus primitive: sig(A ∪ B) is the element-wise
    // min of sig(A) and sig(B), so appending a batch never needs the
    // old corpus, only its 128-slot signature
    val (sa, sb) = (sources.head, sources.last)
    val merged = sigOf(bySource(sa) ++ bySource(sb))
    val elementMin = Array.tabulate(128)(k => math.min(sigs(sa)(k), sigs(sb)(k)))
    assert(merged.sameElements(elementMin), "signature of union == element-wise min")
  }

  test("text_overlap: self-join pair counts equal literal shingle-set intersections") {
    val docs = GraftSession.table(spark, sf, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    def shingles(text: String): Set[String] = {
      val ws = text.split(" ", -1)
      if (ws.length >= 3) ws.sliding(3).map(_.mkString(" ")).toSet
      else Set(ws.mkString(" "))
    }
    val bySource = docs.groupBy(_._1).view
      .mapValues(_.iterator.flatMap(d => shingles(d._2)).toSet).toMap
    val sources = bySource.keys.toSeq.sorted

    val got = TextAnalysis.textOverlap(spark, sf).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_inter"),
          r.getAs[Long]("jaccard_ppm"))).toMap
    val wantPairs = for {
      i <- sources.indices; j <- (i + 1) until sources.length
    } yield (sources(i), sources(j))
    assert(got.keySet == wantPairs.toSet, "all source pairs present, including zero-overlap ones")
    for ((a, b) <- wantPairs) {
      val (sa, sb) = (bySource(a), bySource(b))
      val inter = (sa intersect sb).size.toLong
      val (gna, gnb, gi, gj) = got((a, b))
      assert(gna == sa.size.toLong && gnb == sb.size.toLong, s"($a,$b) set sizes")
      assert(gi == inter, s"($a,$b) intersection")
      assert(gj == inter * 1000000L / (sa.size + sb.size - inter), s"($a,$b) jaccard_ppm")
    }
  }
}
