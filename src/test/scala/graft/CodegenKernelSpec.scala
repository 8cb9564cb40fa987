package graft

import graft.functions.ArrayExprs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression gate for the Janino "Redefinition of local variable"
  * fallback: every kernel must codegen-compile with TWO instances in a
  * single projection (the shape every real call site has — qcos alone
  * instantiates three LongArrayDots). Runs with codegen fallback
  * disabled so a compile failure is a test failure, not a silent
  * interpreted downgrade.
  */
class CodegenKernelSpec extends AnyFunSuite {
  import TestSpark._

  private def withCodegenOnly[T](f: => T): T = {
    val prevFallback = spark.conf.get("spark.sql.codegen.fallback", "true")
    val prevFactory = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try f
    finally {
      spark.conf.set("spark.sql.codegen.fallback", prevFallback)
      spark.conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }

  test("≥2 instances of every kernel codegen in one projection") {
    withCodegenOnly {
      // Parquet-backed source: a local Seq would be folded to a
      // LocalRelation and evaluated interpreted at optimization time.
      val d = GraftSession.table(spark, sf, "embeddings").limit(20)
        .select(
          col("vec_id"),
          transform(col("embedding"), x => floor(x.cast("double") * 1000).cast("long")).as("q"),
        )
        .withColumn("r", reverse(col("q")))
        .withColumn("qs", array_sort(array_distinct(col("q"))))
        .withColumn("rs", array_sort(array_distinct(col("r"))))
        .withColumn("hs", transform(col("q"), h => pmod(h, lit(2147483647L))))

      val as = Array(3L, 5L, 7L)
      val bs = Array(11L, 13L, 17L)
      val p = 2147483647L

      val out = d.select(
        ArrayExprs.longDot(col("q"), col("r")).as("d1"),
        ArrayExprs.longDot(col("r"), col("q")).as("d2"),
        ArrayExprs.sortedIntersectCount(col("qs"), col("rs")).as("c1"),
        ArrayExprs.sortedIntersectCount(col("rs"), col("qs")).as("c2"),
        ArrayExprs.minhashSig(col("hs"), as, bs, p).as("m1"),
        ArrayExprs.minhashSig(col("hs"), as, bs, p).as("m2"),
        ArrayExprs.simhash62(col("q")).as("s1"),
        ArrayExprs.simhash62(col("r")).as("s2"),
        ArrayExprs.winnow(col("q"), 3, 4).as("w1"),
        ArrayExprs.winnow(col("r"), 3, 4).as("w2"),
        ArrayExprs.wordNgrams(transform(col("q"), x => x.cast("string")), 3).as("g1"),
        ArrayExprs.wordNgrams(transform(col("r"), x => x.cast("string")), 3).as("g2"),
      ).collect()

      assert(out.length == 20)
      // Symmetric formulations must agree — proves both instances ran.
      out.foreach { row =>
        assert(row.getLong(0) == row.getLong(1), "dot is symmetric")
        assert(row.getInt(2) == row.getInt(3), "intersect count is symmetric")
        assert(row.getSeq[Long](4) == row.getSeq[Long](5), "same minhash params agree")
      }
    }
  }

  test("kernel-heavy operator paths survive codegen-only mode") {
    withCodegenOnly {
      // The real call sites that died in round 1: qcos (3 dots in one
      // projection) and the jaccard intersect pair.
      assert(SparkEntry.queries("ann_bruteforce")(spark, sf).count() > 0)
      assert(SparkEntry.queries("dedup_jaccard")(spark, sf).count() >= 0)
      assert(SparkEntry.queries("dedup_minhash_lsh")(spark, sf).count() >= 0)
      assert(SparkEntry.queries("dedup_simhash")(spark, sf).count() >= 0)
      assert(SparkEntry.queries("text_winnow_pairs")(spark, sf).count() >= 0)
      assert(SparkEntry.queries("decontaminate")(spark, sf).count() > 0)
      assert(SparkEntry.queries("text_repetition")(spark, sf).count() > 0)
    }
  }
}
