package graft

import graft.operators.{Dedup, TextAnalysis}
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
