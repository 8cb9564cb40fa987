package graft

import graft.operators.{Relational, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 hardening pins: the two division guards this session added
  * (q_acf zero-variance, text_overlap zero-shingle) exercised on
  * PLANTED degenerate inputs that the sf corpora never produce — a
  * constant daily series and a source of sub-shingle-length docs — so
  * the guards are tested, not just argued.
  */
class Round16OpsSpec extends AnyFunSuite {
  import TestSpark._

  private def withTmp[A](prefix: String)(f: String => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory(prefix).toString
    try f(tmp)
    finally {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles).foreach(_.foreach(rm)); p.delete(): Unit
      }
      rm(new java.io.File(tmp))
    }
  }

  test("q_acf: constant daily series yields NULL acf (zero-variance guard), varying series still computes") {
    import spark.implicits._
    // type "flat": exactly 2 events every day for 20 days — any lagged
    // pair window is constant on both sides, so n·sxx − sx² = 0 and
    // the Pearson ratio is 0/0. The guard must emit NULL, not throw
    // (ANSI) or emit NaN. Type "vary": day-index events, nonzero
    // variance at every lag 1..7.
    val rows = (0 until 20).flatMap { d =>
      val us = (86400L * 1000000L) * (1000 + d)
      Seq((us, "flat"), (us + 1, "flat")) ++ (0 to d).map(i => (us + 10 + i, "vary"))
    }
    val df = rows.zipWithIndex
      .map { case ((us, t), i) => (i.toLong, us, t) }
      .toDF("event_id", "us", "event_type")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"), col("event_type"))
    withTmp("acfdegen") { tmp =>
      df.write.mode("overwrite").parquet(s"$tmp/events.parquet")
      val got = Relational.qAcf(spark, tmp).collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("lag")) ->
          (if (r.isNullAt(r.fieldIndex("acf"))) None else Some(r.getAs[Double]("acf"))))
        .toMap
      for (lag <- 1L to 7L) {
        assert(got((("flat"), lag)).isEmpty, s"flat lag $lag must be NULL under the guard")
        val v = got((("vary"), lag))
        assert(v.isDefined && !v.get.isNaN, s"vary lag $lag must stay a real acf")
        assert(math.abs(v.get) <= 1.0 + 1e-9, s"vary lag $lag in [-1, 1]")
      }
    }
  }

  test("text_overlap: a source of one-word docs keeps n >= 1 (whole-text gram fallback) and divides safely") {
    import spark.implicits._
    // source "tiny" has ONLY sub-shingle docs: WordNgrams' short-doc
    // fallback makes each a single whole-text gram, so the source
    // appears in the size rollup with n_a >= 1 and every containment
    // division is well-defined. One gram ("aa") is shared with "big".
    val df = Seq(
      (1L, "aa", "tiny"), (2L, "bb", "tiny"),
      (3L, "aa bb cc dd", "big"), (4L, "ee ff gg", "big"),
    ).toDF("doc_id", "text", "source")
    withTmp("ovdegen") { tmp =>
      df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val rows = TextAnalysis.textOverlap(spark, tmp).collect()
      assert(rows.length == 1)
      val r = rows.head
      assert(r.getAs[String]("src_a") == "big" && r.getAs[String]("src_b") == "tiny")
      // big: {"aa bb cc", "bb cc dd", "ee ff gg"}; tiny: {"aa", "bb"}
      assert(r.getAs[Long]("n_a") == 3L, "big shingle count")
      assert(r.getAs[Long]("n_b") == 2L, "tiny whole-text gram count (fallback)")
      assert(r.getAs[Long]("n_inter") == 0L, "whole-text grams don't match 3-shingles")
      assert(r.getAs[Long]("jaccard_ppm") == 0L)
      assert(r.getAs[Long]("contain_a_ppm") == 0L)
      assert(r.getAs[Long]("contain_b_ppm") == 0L)
    }
  }

  test("text_overlap_sketch: signature build is duplicate-insensitive (no distinct needed)") {
    import spark.implicits._
    // Two corpora with identical DISTINCT gram sets but wildly
    // different duplication — the min-aggregate signatures must be
    // bit-identical, which is the property that justifies dropping the
    // pre-aggregate distinct() from the fact path.
    val base = Seq(
      (1L, "aa bb cc dd ee", "s1"), (2L, "ff gg hh ii", "s2"))
    val dup = base ++ Seq(
      (3L, "aa bb cc dd ee", "s1"), (4L, "aa bb cc dd ee", "s1"),
      (5L, "ff gg hh ii", "s2"))
    withTmp("sketchdup") { tmp =>
      base.toDF("doc_id", "text", "source")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val a = TextAnalysis.textOverlapSketch(spark, tmp).collect()
        .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b"),
          r.getAs[Long]("n_matches"), r.getAs[Long]("est_jaccard_ppm"))).toSet
      dup.toDF("doc_id", "text", "source")
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val b = TextAnalysis.textOverlapSketch(spark, tmp).collect()
        .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b"),
          r.getAs[Long]("n_matches"), r.getAs[Long]("est_jaccard_ppm"))).toSet
      assert(a == b, s"duplication changed the sketch: $a vs $b")
    }
  }
}
