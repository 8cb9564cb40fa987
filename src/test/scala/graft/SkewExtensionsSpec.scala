package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewExtensionsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("saltedAggregate equals plain aggregation on a skewed key distribution") {
    // 90% of rows on one key — the shape that serializes a plain groupBy
    val skewed = (1 to 10000).map(i => (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong)).toDF("k", "v")
    val plain = skewed.groupBy("k").agg(sum("v").as("sum_v"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().toSet
    val salted = Skew.saltedAggregate(skewed, Seq("k"), Map("sum_v" -> sum(col("v")), "n" -> count(lit(1))))
      .as[(String, Long, Long)].collect().toSet
    assert(salted == plain)
  }

  test("saltedJoin equals plain join on a skewed key") {
    val left = (1 to 5000).map(i => (if (i % 20 == 0) i % 5 else 0, i)).toDF("k", "lv")
    val right = (0 to 4).map(k => (k, s"dim$k")).toDF("k", "rv")
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .as[(Int, Int, String)].collect().sorted
    val salted = Skew.saltedJoin(left, right, "k").select("k", "lv", "rv")
      .as[(Int, Int, String)].collect().sorted
    assert(salted.sameElements(plain))
  }

  test("extensions register the codegen kernels as SQL functions") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_long_dot(array(1L,2L,3L), array(4L,5L,6L)) AS d, " +
        "graft_sorted_intersect(array(1L,3L,5L), array(1L,2L,3L)) AS c, " +
        "graft_simhash62(array(3L,3L,0L)) AS s"
    ).head
    assert(r.getAs[Long]("d") == 32L)
    assert(r.getAs[Int]("c") == 2)
    assert(r.getAs[Long]("s") == 3L)
    val sig = spark.sql("SELECT graft_minhash_sig(array(7L, 11L)) AS sig").head.getSeq[Long](0)
    assert(sig.length == 64)
  }

  test("optimizer rule rewrites the HOF dot-product pattern into LongArrayDot") {
    spark.experimental.extraOptimizations = Seq(graft.plans.RewriteHofDotProduct)
    try {
      // parquet-backed so constant folding can't collapse the expression
      val q = GraftSession.table(spark, TestSpark.sf, "embeddings")
        .select(transform(col("embedding"), x => floor(x.cast("double") * 10000 + 0.5).cast("long")).as("qv"))
      val a = q.select(col("qv").as("a")).limit(10)
      val b = q.select(col("qv").as("b")).limit(10)
      val df = a.crossJoin(b).select(
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), (acc, v) => acc + v).as("hof_dot"),
        graft.functions.ArrayExprs.longDot(col("a"), col("b")).as("kernel_dot"),
      )
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("longarraydot"), optimized)
      assert(df.filter(col("hof_dot") =!= col("kernel_dot")).count() == 0)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("LongArrayDot yields NULL on ragged pairs (zip_with padding parity)") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(4L, 5L))).toDF("a", "b")
      .select(
        graft.functions.ArrayExprs.longDot(col("a"), col("b")).as("kernel"),
        aggregate(zip_with(col("a"), col("b"), (x, y) => x * y), lit(0L), (acc, v) => acc + v).as("hof"),
      )
    val r = df.collect().head
    assert(r.isNullAt(0) && r.isNullAt(1), "both formulations must be NULL on ragged pairs")
  }

  test("GraftExtensions works via withExtensions at session build") {
    // separate session sharing the context, built with the extensions class
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
      .newSession()
    GraftExtensions.register(s2) // newSession drops temp functions; re-register
    assert(s2.sql("SELECT graft_long_dot(array(2L), array(3L)) AS d").head.getLong(0) == 6L)
  }
}
