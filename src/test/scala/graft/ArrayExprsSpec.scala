package graft

import graft.functions.ArrayExprs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen kernels must be bit-identical to the interpreted
  * higher-order formulations they replaced (the oracle parity of
  * ann_bruteforce/dedup_embedding depends on it).
  */
class ArrayExprsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val vecs = GraftSession.table(spark, sf, "embeddings")
    .select(col("vec_id"), transform(col("embedding"), x => round(x * 10000).cast("long")).as("q"))

  test("LongArrayDot equals aggregate(zip_with(...)) on real vectors") {
    val d = vecs.limit(50)
    val a = d.select(col("vec_id").as("ia"), col("q").as("qa"))
    val b = d.select(col("vec_id").as("ib"), col("q").as("qb"))
    val both = a.join(b, col("ia") < col("ib"))
      .select(
        ArrayExprs.longDot(col("qa"), col("qb")).as("fast"),
        aggregate(zip_with(col("qa"), col("qb"), (x, y) => x * y), lit(0L), (acc, x) => acc + x).as("slow"),
      )
    assert(both.filter(col("fast") =!= col("slow")).count() == 0)
  }

  test("SignBitsPack equals the aggregate(sequence(...)) HOF formulation on real embeddings") {
    // the kernel replaced the interpreted per-row aggregate lambdas on
    // the every-vector pack path of the whole binary family (r15
    // verdict item 1); the four binary oracles' hash parity depends on
    // this equivalence
    val hofLo = expr("aggregate(sequence(1, 32), CAST(0 AS BIGINT), (acc, i) -> acc + " +
      "IF(CAST(element_at(embedding, i) AS DOUBLE) > 0.0, shiftleft(CAST(1 AS BIGINT), i - 1), CAST(0 AS BIGINT)))")
    val hofHi = expr("aggregate(sequence(33, 64), CAST(0 AS BIGINT), (acc, i) -> acc + " +
      "IF(CAST(element_at(embedding, i) AS DOUBLE) > 0.0, shiftleft(CAST(1 AS BIGINT), i - 33), CAST(0 AS BIGINT)))")
    val d = GraftSession.table(spark, sf, "embeddings")
      .select(ArrayExprs.signBitsPack(col("embedding")).as("pack"),
        hofLo.as("slow_lo"), hofHi.as("slow_hi"))
    assert(d.filter(element_at(col("pack"), 1) =!= col("slow_lo") ||
      element_at(col("pack"), 2) =!= col("slow_hi")).count() == 0)
    assert(d.filter(element_at(col("pack"), 1) < 0 || element_at(col("pack"), 2) < 0).count() == 0,
      "half-words must never touch the int64 sign bit")
  }

  test("SignBitsPack: NaN dims pack as positive (NaN-greatest in both engines); array<double> supported") {
    // DuckDB: SELECT 'NaN'::DOUBLE > 0.0 → true; Spark orders NaN
    // greater than any numeric — the kernel must match both (raw Java
    // `>` is false for NaN and would silently flip the bit)
    val df = Seq((1L, Seq(Float.NaN, -1.0f, 2.0f)), (2L, Seq(-0.5f, 0.0f, 0.1f)))
      .toDF("vec_id", "embedding")
    val hofLo = expr("aggregate(sequence(1, 3), CAST(0 AS BIGINT), (acc, i) -> acc + " +
      "IF(CAST(element_at(embedding, i) AS DOUBLE) > 0.0, shiftleft(CAST(1 AS BIGINT), i - 1), CAST(0 AS BIGINT)))")
    val rows = df.select(col("vec_id"),
      element_at(ArrayExprs.signBitsPack(col("embedding")), 1).as("k"), hofLo.as("h")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows(1L)._1 == 5L, "NaN dim must set its bit (bits 0 and 2)")
    assert(rows(2L)._1 == 4L)
    rows.foreach { case (id, (k, h)) => assert(k == h, s"kernel != HOF on row $id") }
    val dd = Seq((1L, Seq(1.0, -1.0, Double.NaN))).toDF("vec_id", "embedding")
    assert(dd.select(element_at(ArrayExprs.signBitsPack(col("embedding")), 1)).head.getLong(0) == 5L,
      "array<double> input must pack via getDouble")
  }

  test("PlaneSignProbes: probe 0 is the exact bucket, flips follow the margin order") {
    val planes: Array[Array[Long]] = {
      val rnd = new scala.util.Random(11)
      Array.fill(8 * 4)(Array.fill(64)(math.floor(rnd.nextGaussian() * 10000 + 0.5).toLong))
    }
    val rows = vecs.limit(40)
      .select(col("vec_id"),
        col("q"),
        ArrayExprs.planeSignBuckets(col("q"), planes, 4).as("exact"),
        ArrayExprs.planeSignProbes(col("q"), planes, 4, 4).as("probes"))
      .collect()
    rows.foreach { r =>
      val qv = r.getSeq[Long](1).toArray
      val exact = r.getSeq[Int](2)
      val probes = r.getSeq[Int](3)
      assert(probes.length == 8 * 4)
      for (t <- 0 until 8) {
        // plain-Scala margin replay
        val dots = (0 until 4).map { b =>
          val p = planes(t * 4 + b)
          qv.indices.map(i => qv(i) * p(i)).sum
        }
        val acc = dots.zipWithIndex.collect { case (s, b) if s >= 0 => 1 << b }.sum
        val Seq(m0, m1) = dots.zipWithIndex.sortBy { case (s, b) => (math.abs(s), b) }.take(2).map(_._2)
        assert(probes(t * 4) == exact(t) && exact(t) == acc, s"table $t exact bucket")
        assert(probes(t * 4 + 1) == (acc ^ (1 << m0)), s"table $t probe 1")
        assert(probes(t * 4 + 2) == (acc ^ (1 << m1)), s"table $t probe 2")
        assert(probes(t * 4 + 3) == (acc ^ (1 << m0) ^ (1 << m1)), s"table $t probe 3")
        // probes within a table are pairwise distinct buckets
        assert(probes.slice(t * 4, t * 4 + 4).distinct.length == 4)
      }
    }
  }

  test("MinHashSig equals the per-perm transform/array_min formulation") {
    val perms = operators.Dedup.perms
    val prime = operators.Dedup.MinHashPrime
    val d = GraftSession.table(spark, sf, "documents").limit(50)
      .select(transform(operators.Dedup.shingles, s => pmod(hash(s).cast("long"), lit(operators.Dedup.MinHashPrime))).as("hs"))
    val permArr = array(perms.map { case (a, b) => struct(lit(a).as("a"), lit(b).as("b")) }: _*)
    val slow = transform(permArr, p => array_min(transform(col("hs"), h => pmod(p.getField("a") * h + p.getField("b"), lit(prime)))))
    val fast = ArrayExprs.minhashSig(col("hs"), perms.map(_._1).toArray, perms.map(_._2).toArray, prime)
    val rows = d.select(fast.as("f"), slow.as("s")).as[(Seq[Long], Seq[Long])].collect()
    rows.foreach { case (f, s) => assert(f == s) }
  }

  test("WordNgrams equals the transform/slice/concat_ws formulation incl. short-doc fallback") {
    val ws = split(col("text"), " ")
    for (n <- Seq(2, 3, 5)) {
      val hof = when(
        size(ws) >= n,
        transform(sequence(lit(0), size(ws) - n), i => concat_ws(" ", slice(ws, i + 1, lit(n)))),
      ).otherwise(array(col("text")))
      val bad = GraftSession.table(spark, sf, "documents")
        .select(ArrayExprs.wordNgrams(ws, n).as("fast"), hof.as("slow"))
        .filter(col("fast") =!= col("slow"))
      assert(bad.count() == 0, s"n=$n")
    }
    // short-doc fallback: fewer words than n yields one whole-text gram
    val short = Seq("one two", "solo").toDF("text")
      .select(ArrayExprs.wordNgrams(split(col("text"), " "), 5).as("g"))
      .as[Seq[String]].collect()
    assert(short.toSeq == Seq(Seq("one two"), Seq("solo")))
  }

  test("SimHash62: identical inputs agree, bit flips move hamming") {
    val d = Seq(
      Seq(0x0L, 0x3L, 0x3L),
      Seq(0x0L, 0x3L, 0x3L),
      Seq(-1L, -1L, -1L),
    ).toDF("hs").select(ArrayExprs.simhash62(col("hs")).as("sh")).as[Long].collect()
    assert(d(0) == d(1))
    assert(d(0) == 0x3L, s"majority of {0,3,3} sets bits 0,1: got ${d(0)}")
    assert(d(2) == (1L << 62) - 1, "all-ones hashes set all 62 bits")
  }

  test("MinHashGramSig equals the exploded md5-hex-conv + pmod column formulation bit-for-bit") {
    val as = Array.tabulate(8)(j => (2 * j + 1).toLong)
    val bs = Array.tabulate(8)(j => j.toLong)
    val p = 4294967311L
    val rows = Seq(
      Seq("the quick fox", "quick fox jumps", "fox jumps over"),
      Seq("héllo wörld x"), // non-ASCII: byte-level md5 must match
      Seq(""),              // the empty gram a short doc produces
      Seq.empty[String],    // no grams: all-p sentinel slots
    ).toDF("grams")
    val got = rows.select(ArrayExprs.minhashGramSig(col("grams"), as, bs, p).as("s"))
      .as[Seq[Long]].collect()
    // reference: the old column path — per-gram md5 hex prefix parse,
    // per-perm pmod, min over grams
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = Seq(
      Seq("the quick fox", "quick fox jumps", "fox jumps over"),
      Seq("héllo wörld x"), Seq(""), Seq.empty[String],
    ).map { grams =>
      val hs = grams.map(g => java.lang.Long.parseLong(md5hex(g).take(8), 16))
      (0 until 8).map(j => if (hs.isEmpty) p else hs.map(h => (as(j) * h + bs(j)) % p).min)
    }
    assert(got.toSeq.map(_.toSeq) == want.map(_.toSeq))
  }

  test("RefSetHitCount equals size(array_intersect) on distinct arrays and counts repeats") {
    val ref = Set("b", "c", "zz")
    val rows = Seq(
      Seq("a", "b", "c"),   // distinct: 2 hits
      Seq("b", "b", "c"),   // repeats counted: 3 hits (intersect would say 2)
      Seq("x", "y"),        // none
      Seq.empty[String],
    ).toDF("arr")
    val got = rows.select(ArrayExprs.refSetHitCount(col("arr"), ref).as("n")).as[Int].collect()
    assert(got.toSeq == Seq(2, 3, 0, 0))
    val viaIntersect = rows
      .select(size(array_intersect(col("arr"), typedLit(ref.toSeq))).as("n")).as[Int].collect()
    assert(got(0) == viaIntersect(0) && got(2) == viaIntersect(2) && got(3) == viaIntersect(3),
      "on distinct arrays the kernel must agree with array_intersect")
  }

  test("NearestCentroidPacked equals the greatest-of-structs formulation on real vectors") {
    // the kernel replaced greatest(struct(cos, -cid), ...) in
    // assignFrozen/semDedup; pin identical (centroid_id, sim_ppm) —
    // same dot/divide arithmetic, same (cos desc, cid asc) tie-break
    val d = GraftSession.table(spark, sf, "embeddings")
      .select(col("vec_id").as("id"),
        transform(col("embedding"), x => floor(x.cast("double") * 10000 + 0.5).cast("long")).as("qv"))
      .withColumn("norm", sqrt(ArrayExprs.longDot(col("qv"), col("qv")).cast("double")))
    // deterministic fake centroids derived from the corpus itself: the
    // first 7 vectors (duplicated norms/ties exercised via vector 0
    // twice under different ids — the tie MUST go to the smaller cid)
    val cents0 = d.orderBy("id").limit(7).collect().toIndexedSeq
      .map(r => (r.getSeq[Long](1), math.sqrt(r.getSeq[Long](1).map(x => x.toDouble * x).sum)))
    val cents = cents0.zipWithIndex.map { case ((cv, n), i) => (i, cv, n) } :+
      ((7, cents0.head._1, cents0.head._2)) // duplicate of cid 0 → ties
    val viaKernel = d
      .withColumn("p", ArrayExprs.nearestCentroidPacked(col("qv"), col("norm"), cents))
      .select(col("id"), expr("p DIV 4000000").cast("int").as("cid"),
        (expr("p % 4000000") - 2000000L).as("ppm"))
    val scored = cents.map { case (cid, cv, cnorm) =>
      struct(
        (ArrayExprs.longDot(col("qv"), typedlit(cv)).cast("double") / (col("norm") * lit(cnorm))).as("cos"),
        lit(-cid.toLong).as("nid"))
    }
    val viaStructs = d
      .withColumn("m", greatest(scored: _*))
      .select(col("id"), (-col("m.nid")).cast("int").as("cid"),
        floor(col("m.cos") * 1000000 + 0.5).cast("long").as("ppm"))
    val k = viaKernel.collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val s = viaStructs.collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(k == s, "kernel assignment diverges from the greatest-struct formulation")
    // the planted duplicate centroid (cid 7 ≡ cid 0) must never win
    assert(!k.values.exists(_._1 == 7), "tie must resolve to the smaller cid")
  }

  test("RefSetHitCount equals the interpreted stopword-vote HOF on the real corpus") {
    // the langid/quality stopword vote swapped size(filter(..., w -> w
    // IN (...))) for the kernel; pin bit-equality on actual documents
    // for every language list the vote uses
    val stops = Map(
      "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
      "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht"),
      "es" -> Seq("el", "la", "de", "los", "y", "es", "un"),
      "fr" -> Seq("le", "les", "et", "de", "un", "est", "dans"),
      "zh" -> Seq("de", "shi", "le", "wo", "bu", "zhe", "ni"),
    )
    val d = GraftSession.table(spark, sf, "documents").select(col("text"))
    stops.foreach { case (lang, ws) =>
      val list = ws.map(w => s"'$w'").mkString(", ")
      val mismatches = d.select(
        ArrayExprs.refSetHitCount(split(col("text"), " "), ws).cast("long").as("fast"),
        expr(s"CAST(size(filter(split(text, ' '), w -> w IN ($list))) AS BIGINT)").as("slow"),
      ).filter(col("fast") =!= col("slow") ||
        col("fast").isNull =!= col("slow").isNull).count()
      assert(mismatches == 0, s"kernel != HOF for $lang")
    }
  }
}
