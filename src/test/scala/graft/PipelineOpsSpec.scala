package graft

import graft.operators.{Dedup, Pipeline, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the r3 pipeline operators: incremental dedup,
  * decontamination, repetition scoring.
  */
class PipelineOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("dedup_incremental equals exact batch-vs-corpus jaccard matching") {
    val got = Dedup.dedupIncremental(spark, sf)
      .filter(col("is_dup"))
      .select(col("doc_id"), col("dup_of"))
      .as[(Long, Long)].collect().toMap

    val d = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), Dedup.shingles.as("sh"))
    val batch = d.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("sh").as("sn"))
    val corpus = d.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id").as("dup_of"), col("sh").as("sc"))
    val exact = batch.crossJoin(corpus)
      .withColumn("j", size(array_intersect(col("sn"), col("sc"))).cast("double") /
        size(array_union(col("sn"), col("sc"))))
      .filter(col("j") >= 0.8)
      .select(col("doc_id"), col("dup_of"), col("j"))
      .as[(Long, Long, Double)].collect()
    val exactBest = exact.groupBy(_._1).map { case (id, rs) =>
      id -> rs.maxBy(r => (r._3, -r._2))._2
    }
    assert(got == exactBest, s"got=${got.size} exact=${exactBest.size}")
    assert(got.nonEmpty, "test data should contain cross-split near-dups")
  }

  test("dedup_incremental output covers every batch doc exactly once") {
    val out = Dedup.dedupIncremental(spark, sf).select("doc_id").as[Long].collect()
    val batchIds = GraftSession.table(spark, sf, "documents")
      .filter(col("doc_id") % 10 === 0).select("doc_id").as[Long].collect()
    assert(out.sorted.toSeq == batchIds.sorted.toSeq)
    assert(out.length == out.distinct.length)
  }

  test("decontaminate hit counts match a driver-side recomputation") {
    val docs = GraftSession.table(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    def grams(t: String): Set[String] = {
      val ws = t.split(" ", -1)
      if (ws.length >= 5) ws.sliding(5).map(_.mkString(" ")).toSet else Set(t)
    }
    val evalGrams = docs.filter(_._1 % 37 == 0).flatMap(d => grams(d._2)).toSet
    val expected = docs.filterNot(_._1 % 37 == 0).map { case (id, t) =>
      val g = grams(t)
      id -> (g.size.toLong, g.count(evalGrams.contains).toLong)
    }.toMap

    val got = Pipeline.decontaminate(spark, sf)
      .select(col("doc_id"), col("n_ngrams"), col("n_hits"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == expected)
    assert(got.values.exists(_._2 > 0), "planted near-dups should contaminate")
    assert(got.values.forall { case (n, h) => h <= n })
  }

  test("sample_temperature: the integer budget algebra replays exactly and tempers toward uniform") {
    val d = GraftSession.table(spark, sf, "documents")
      .select("doc_id", "source", "n_chars").as[(Long, String, Long)].collect()
    val toks = d.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val sw = toks.view.mapValues(t => math.floor(math.sqrt(t.toDouble) * 1000 + 0.5).toLong).toMap
    val tTotal = toks.values.sum
    val wTotal = sw.values.sum
    def ratePpm(s: String): Long =
      math.min(1000000L, (tTotal / 2) * sw(s) / wTotal * 1000000L / toks(s))
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(x.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val rows = operators.Pipeline.sampleTemperature(spark, sf).collect()
    assert(rows.length == d.length, "audit view emits every doc")
    rows.foreach { r =>
      val (id, s) = (r.getAs[Long]("doc_id"), r.getAs[String]("source"))
      assert(r.getAs[Long]("rate_ppm") == ratePpm(s), s"rate for $s")
      val u = java.lang.Long.parseLong(md5hex(s"temp:$id").take(8), 16) % 1000000L
      assert(r.getAs[Boolean]("kept") == (u < ratePpm(s)), s"keep flag for doc $id")
    }
    // α = 0.5 property: a source's budgeted token share is compressed
    // toward uniform — smaller-than-average sources get rate above the
    // flat T/2 rate, larger-than-average below (strictly when sizes
    // differ; equal-size corpora get equal rates)
    val flat = 500000L
    val mean = tTotal.toDouble / toks.size
    toks.foreach { case (s, t) =>
      if (t.toDouble < mean * 0.9) assert(ratePpm(s) >= flat, s"$s should be upweighted")
      if (t.toDouble > mean * 1.1) assert(ratePpm(s) <= flat, s"$s should be downweighted")
    }
  }

  test("text_repetition ratios match a driver-side recomputation and are bounded") {
    val docs = GraftSession.table(spark, sf, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    def stats(t: String, n: Int): (Long, Long) = {
      val ws = t.split(" ", -1)
      val g = if (ws.length >= n) ws.sliding(n).map(_.mkString(" ")).toSeq else Seq(t)
      (g.size.toLong, g.distinct.size.toLong)
    }
    val rows = TextAnalysis.textRepetition(spark, sf).collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val text = docs.find(_._1 == id).get._2
      val (t2, u2) = stats(text, 2)
      val (t3, u3) = stats(text, 3)
      assert(r.getAs[Long]("n_2grams") == t2)
      assert(r.getAs[Long]("uniq_2grams") == u2)
      assert(r.getAs[Long]("n_3grams") == t3)
      assert(r.getAs[Long]("uniq_3grams") == u3)
      val rep3 = r.getAs[Double]("rep3_ratio")
      assert(rep3 >= 0.0 && rep3 < 1.0)
      assert(math.abs(rep3 - (if (t3 > 0) 1.0 - u3.toDouble / t3 else 0.0)) < 1e-12)
    }
  }

  test("pipeline_mixture: shares are exact partitions of unity, drift nets to ~zero") {
    val rows = Pipeline.pipelineMixture(spark, sf).collect()
    val n = rows.length
    assert(n > 1)
    val before = rows.map(_.getAs[Long]("share_before_ppm"))
    val after = rows.map(_.getAs[Long]("share_after_ppm"))
    // floor-division shares: each side sums to 1e6 minus at most one
    // ppm of rounding per source
    assert(before.sum <= 1000000L && before.sum >= 1000000L - n)
    assert(after.sum <= 1000000L && after.sum >= 1000000L - n)
    rows.foreach { r =>
      assert(r.getAs[Long]("toks_kept") <= r.getAs[Long]("toks_ingest"))
      assert(r.getAs[Long]("drift_ppm") ==
        r.getAs[Long]("share_after_ppm") - r.getAs[Long]("share_before_ppm"))
    }
    // survivors' tokens replay from the e2e pipeline's own ids
    val keptIds = Pipeline.pipelineE2e(spark, sf).collect().map(_.getAs[Long]("doc_id")).toSet
    val toks = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), col("source"), size(split(col("text"), " ")).cast("long").as("t"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Long]("t")))
    val wantKept = toks.filter(t => keptIds(t._1)).groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("toks_kept") == wantKept.getOrElse(r.getAs[String]("source"), 0L))
    }
  }

  test("dedup_lsh_tune: configs nest, 16x4 row equals the named op, theory is the closed form") {
    val rows = Dedup.dedupLshTune(spark, sf).collect()
      .map(r => r.getAs[String]("cfg") ->
        ((r.getAs[Long]("n_bands"), r.getAs[Long]("rows_per_band"), r.getAs[Long]("n_candidates"),
          r.getAs[Long]("n_verified"), r.getAs[Long]("precision_ppm"), r.getAs[Long]("theory_recall_ppm")))).toMap
    assert(rows.keySet == Set("32x2", "16x4", "8x8"))
    rows.foreach { case (_, (b, r, cand, ver, prec, theory)) =>
      assert(b * r == 64L, "every config bands the same 64-perm signature")
      assert(ver <= cand)
      // zero-candidate configs emit NULL precision (getAs[Long] reads
      // null as 0 here) — never 1e6, which would rank an empty config
      // as perfect
      if (cand > 0) assert(prec == ver * 1000000L / cand) else assert(prec == 0L)
      assert(theory == math.floor((1 - math.pow(1 - math.pow(0.8, r.toDouble), b.toDouble)) * 1e6 + 0.5).toLong)
    }
    // band nesting: an 8-row match implies its 4-row halves match,
    // which imply the 2-row quarters — candidate/verified sets are
    // strictly subset-ordered, so the counts must be too
    assert(rows("32x2")._3 >= rows("16x4")._3 && rows("16x4")._3 >= rows("8x8")._3)
    assert(rows("32x2")._4 >= rows("16x4")._4 && rows("16x4")._4 >= rows("8x8")._4)
    // the production config's verified pairs ARE dedup_minhash_lsh
    assert(rows("16x4")._4 == Dedup.dedupMinhashLsh(spark, sf).count())
  }

  test("sample_dsir equals a plain-Scala hashed-LLR replay; target domain ranks high") {
    val B = 4096L
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def bucket(term: String): Long = {
      val h = java.lang.Long.parseLong(md5hex(s"dsir:$term").take(8), 16)
      ((h % B) + B) % B
    }
    val corpus = GraftSession.table(spark, sf, "documents")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[String]("text")))
    val toks = corpus.map { case (id, src, text) => (id, src, text.split(" ", -1).map(bucket)) }
    val ct = new Array[Long](B.toInt); val cr = new Array[Long](B.toInt)
    toks.foreach { case (_, src, bs) =>
      bs.foreach(b => if (src == "src0") ct(b.toInt) += 1 else cr(b.toInt) += 1)
    }
    val tTot = ct.sum; val rTot = cr.sum
    val lam = Array.tabulate(B.toInt) { b =>
      math.floor(math.log(
        ((ct(b) + 1).toDouble * (rTot + B)) / ((cr(b) + 1).toDouble * (tTot + B))) * 1e6).toLong
    }
    val wants = toks.map { case (id, src, bs) =>
      (id, src, bs.length.toLong, bs.map(b => lam(b.toInt)).sum)
    }
    // per-source percent_rank on (weight, doc_id) — unique order, so
    // rank = row position
    val expect = wants.groupBy(_._2).iterator.flatMap { case (_, xs) =>
      val sorted = xs.sortBy(x => (x._4, x._1))
      val n = sorted.length
      sorted.zipWithIndex.map { case ((id, src, nt, w), i) =>
        val pct = if (n == 1) 0L
          else math.floor(i.toDouble / (n - 1) * 1e6 + 0.5).toLong
        id -> ((src, nt, w, pct, pct >= 750000L))
      }
    }.toMap
    val got = Pipeline.sampleDsir(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("source"), r.getAs[Long]("n_tokens"), r.getAs[Long]("dsir_micro"),
          r.getAs[Long]("pct_micro"), r.getAs[Boolean]("kept")))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (id, want) => assert(got(id) == want, s"doc $id") }
    // direction: the target domain's own docs must score above the rest
    val (t, r) = wants.partition(_._2 == "src0")
    def meanPerToken(xs: Array[(Long, String, Long, Long)]): Double =
      xs.map(_._4).sum.toDouble / math.max(1L, xs.map(_._3).sum)
    assert(meanPerToken(t) > meanPerToken(r),
      "target-domain docs must out-score the raw pool per token")
  }
}
