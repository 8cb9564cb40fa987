package graft

import graft.operators.{Dedup, TextAnalysis, VectorOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the r4 additions beyond their DuckDB oracles. */
class Round4OpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("piiScrub counts and redacts realistic PII; clean text has no residual matches") {
    val rows = Seq(
      (1L, "reach me at jane.doe+spam@corp.example.org or 555-867-5309 thanks"),
      (2L, "server at 192.168.10.254 and 10.0.0.1 responded"),
      (3L, "no sensitive content here"),
      (4L, "two mails: a@b.io c.d@e-f.museum and ip 8.8.8.8 call 123-456-7890"),
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(rows, col("text"))
      .select("doc_id", "n_emails", "n_phones", "n_ipv4", "clean")
      .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 1L, 1L, 0L, "reach me at <EMAIL> or <PHONE> thanks")))
    assert(out(1) == ((2L, 0L, 0L, 2L, "server at <IP> and <IP> responded")))
    assert(out(2) == ((3L, 0L, 0L, 0L, "no sensitive content here")))
    assert(out(3)._2 == 2L && out(3)._3 == 1L && out(3)._4 == 1L)
    // redaction is complete: re-scrubbing the clean text finds nothing
    val rescrub = TextAnalysis.piiScrub(
      TestSpark.spark.createDataFrame(out.map(r => (r._1, r._5)).toSeq).toDF("doc_id", "text"),
      col("text"),
    ).agg(sum(col("n_emails") + col("n_phones") + col("n_ipv4"))).as[Long].head()
    assert(rescrub == 0L)
  }

  test("bm25: term frequency raises score, document length lowers it, idf favors rare terms") {
    val d = Seq(
      (1L, "spark spark spark alpha beta gamma delta"), // tf=3, short
      (2L, "spark alpha beta gamma delta epsilon zeta"), // tf=1, same length
      (3L, "spark " + ("filler " * 50).trim), // tf=1, long
      (4L, "alpha beta gamma delta epsilon zeta eta"), // tf=0 → filtered out
      (5L, "rare alpha beta gamma delta epsilon zeta"), // rare term, df=1
    ).toDF("doc_id", "text")
    val scored = TextAnalysis.bm25(d, col("text"), Seq("spark", "rare"), 10)
      .select(col("doc_id"), col("score")).as[(Long, Double)].collect().toMap
    assert(!scored.contains(4L), "doc without any query term must be filtered")
    assert(scored(1L) > scored(2L), "higher tf must score higher at equal length")
    assert(scored(2L) > scored(3L), "longer doc must score lower at equal tf")
    // df(rare)=1 < df(spark)=3 → a rare-term hit outscores a spark hit
    // in a same-length doc
    assert(scored(5L) > scored(2L), "rarer term must carry higher idf weight")
    assert(scored.values.forall(_ > 0))
  }

  test("dedup_spans hashed-gram grouping equals the brute-force string-gram computation") {
    val got = Dedup.dedupSpans(spark, sf)
      .select("doc_id", "n_grams", "n_dup_grams").as[(Long, Long, Long)].collect()
      .map { case (id, n, d) => (id, (n, d)) }.toMap
    val words = split(col("text"), " ")
    val posts = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), explode(graft.functions.ArrayExprs.wordNgrams(words, 10)).as("g"))
    val gfreq = posts.groupBy("g").agg(count(lit(1)).as("cnt"))
    val brute = posts.join(gfreq, "g").groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sum((col("cnt") > 1).cast("long")).as("d"))
      .as[(Long, Long, Long)].collect().map { case (id, n, dd) => (id, (n, dd)) }.toMap
    assert(got == brute)
    // exact duplicate documents must be fully covered by duplicated grams
    val dupDocs = Dedup.dedupExact(spark, sf).filter(col("is_dup")).select("doc_id").as[Long].collect()
    val ratios = Dedup.dedupSpans(spark, sf)
      .select("doc_id", "dup_ratio").as[(Long, Double)].collect().toMap
    // (sf0.001 happens to carry no exact dups; the property is vacuous
    // there but bites at the sf0.01 gate scale)
    dupDocs.foreach(id => assert(ratios(id) == 1.0, s"exact-dup doc $id must have dup_ratio 1.0"))
    assert(got.nonEmpty && got.values.exists(_._2 > 0), "corpus should contain duplicated grams")
  }

  test("normalizeText: NFC canonicalization, control strip, whitespace collapse on planted unicode") {
    val composed = "Café résumé"
    val decomposed = "Café résumé"
    val rows = Seq(
      (1L, decomposed),
      (2L, composed),
      (3L, "tabs\tand\u0000control\u0007chars"),
      (4L, "  spaced   out​text  "),
      (5L, "already clean"),
    ).toDF("doc_id", "text")
    val got = rows.select(col("doc_id"), TextAnalysis.normalizeText(col("text")).as("c"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == composed, "decomposed accents must canonicalize to the composed form")
    assert(got(1L) == got(2L), "both representations must converge — the dedup-before-hash property")
    assert(got(3L) == "tabs and control chars")
    assert(got(4L) == "spaced out text")
    assert(got(5L) == "already clean")
    // the full named query agrees with itself and flags nothing on the
    // already-canonical ASCII corpus
    val out = TextAnalysis.textNormalize(spark, sf).collect()
    out.foreach { r =>
      assert(!r.getAs[Boolean]("changed"), s"ASCII corpus doc ${r.getAs[Long]("doc_id")} should be canonical")
      assert(r.getAs[Long]("n_bytes_clean") <= r.getAs[Long]("n_bytes_raw"))
    }
  }

  test("semDedup: reported best cluster-mate equals the within-cluster brute force on planted dups") {
    // 4 well-separated directions in 64-dim, 10 members each; member 5
    // of every group is an exact copy of member 4 (the planted dups)
    val dim = 64
    val rows = for (g <- 0 until 4; i <- 0 until 10) yield {
      val src = if (i == 5) 4 else i
      val v = Array.fill(dim)(0.0)
      v(g) = 1.0
      v(4 + (g * 10 + src) % 60) += 0.05 * (src + 1)
      (g * 10L + i, v.toSeq)
    }
    val df = rows.toDF("id", "embedding")
    val out = VectorOps.semDedup(df, 4, 0.9)
      .select("vec_id", "cluster_id", "dup_of", "cosine", "is_semantic_dup")
      .as[(Long, Long, Option[Long], Option[Double], Boolean)].collect()
    assert(out.length == rows.length)

    // brute force WITHIN each reported cluster, on the same ×10000
    // int64 quantization: best lower-id mate by (cosine desc, id asc)
    val qv = rows.map { case (id, v) => id -> v.map(x => math.floor(x * 10000 + 0.5).toLong).toArray }.toMap
    def cos(a: Array[Long], b: Array[Long]): Double = {
      var dot = 0L; var na = 0L; var nb = 0L; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    val cluster = out.map(r => r._1 -> r._2).toMap
    out.foreach { case (id, cid, dupOf, cosine, isDup) =>
      val mates = out.collect { case (m, c, _, _, _) if c == cid && m < id => m }
      if (mates.isEmpty) {
        assert(dupOf.isEmpty && cosine.isEmpty && !isDup, s"vec $id has no lower-id mates")
      } else {
        val best = mates.map(m => (m, cos(qv(id), qv(m)))).minBy { case (m, c) => (-c, m) }
        assert(dupOf.contains(best._1), s"vec $id: reported dup_of=$dupOf, brute-force=${best._1}")
        assert(math.abs(cosine.get - best._2) < 1e-9, s"vec $id: cosine ${cosine.get} vs ${best._2}")
        assert(isDup == (cosine.get >= 0.9), s"vec $id: flag inconsistent with tau")
      }
    }
    // the planted exact copies MUST be flagged against their original
    for (g <- 0 until 4) {
      val (_, _, dupOf, cosine, isDup) = out.find(_._1 == g * 10L + 5).get
      assert(cluster(g * 10L + 5) == cluster(g * 10L + 4), "identical vectors must share a cluster")
      assert(dupOf.contains(g * 10L + 4) && isDup && cosine.exists(_ > 0.9999),
        s"planted dup ${g * 10 + 5} not caught: dup_of=$dupOf cos=$cosine")
    }
  }

  test("textCompress: deterministic across invocations; repetitive text compresses below random text") {
    val a = TextAnalysis.textCompress(spark, sf)
      .select("doc_id", "deflate_bytes", "ratio").as[(Long, Long, Double)].collect().sortBy(_._1)
    val b = TextAnalysis.textCompress(spark, sf)
      .select("doc_id", "deflate_bytes", "ratio").as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(a.toSeq == b.toSeq, "same input must produce identical deflate sizes")
    a.foreach { case (id, bytes, ratio) =>
      assert(bytes > 0, s"doc $id: empty deflate stream")
      assert(ratio > 0 && ratio < 1.5, s"doc $id: ratio $ratio outside sanity range")
    }
    // monotonicity: boilerplate ≪ random at matched length
    val rnd = new scala.util.Random(3)
    val random = Seq.fill(200)(Seq.fill(5)(('a' + rnd.nextInt(26)).toChar).mkString).mkString(" ")
    val repetitive = ("abcde " * 200).trim
    val ratios = Seq((1L, repetitive), (2L, random)).toDF("doc_id", "text")
      .select(
        col("doc_id"),
        (graft.functions.Compress.deflateLen(col("text").cast("binary")).cast("double") /
          octet_length(col("text"))).as("ratio"),
      )
      .as[(Long, Double)].collect().toMap
    assert(ratios(1L) < 0.3, s"repetitive ratio ${ratios(1L)} should be far below 0.3")
    assert(ratios(1L) < ratios(2L) / 2, s"repetitive ${ratios(1L)} must compress well below random ${ratios(2L)}")
  }

  test("text_vocab: ranks are dense, ordered by (tf desc, term), and tf sums to the token count") {
    val out = TextAnalysis.textVocab(spark, sf)
      .select("rk", "term", "tf", "df").as[(Long, String, Long, Long)].collect()
    assert(out.map(_._1).toSeq == (1L to out.length))
    val sorted = out.sortBy { case (_, term, tf, _) => (-tf, term) }
    assert(out.toSeq == sorted.toSeq, "rows must be ordered by (tf desc, term)")
    out.foreach { case (_, _, tf, df) => assert(df <= tf && df >= 1) }
    val nDocs = GraftSession.table(spark, sf, "documents").count()
    assert(out.forall(_._4 <= nDocs))
    // the tiny-vocab corpus fits entirely in the top-100, so tf must
    // account for every token
    if (out.length < 100) {
      val totalTokens = GraftSession.table(spark, sf, "documents")
        .agg(sum(size(split(col("text"), " ")))).as[Long].head()
      assert(out.map(_._3).sum == totalTokens)
    }
  }
}
