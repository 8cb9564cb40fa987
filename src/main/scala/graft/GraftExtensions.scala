package graft

import graft.functions.{LongArrayDot, MinHashSig, SimHash62, SortedLongIntersectCount}
import graft.operators.Dedup
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** SparkSessionExtensions entry point: registers graft's custom
  * Catalyst expressions as SQL functions, so `spark.sql` users get the
  * codegen'd kernels too:
  *
  *   SELECT graft_long_dot(a, b), graft_simhash62(hs),
  *          graft_minhash_sig(hs), graft_sorted_intersect(a, b)
  *
  * Wire up with
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`; for an existing
  * session use [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.RewriteHofDotProduct)
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
    def info(name: String) = new ExpressionInfo("graft", name)
    e.injectFunction((
      FunctionIdentifier("graft_long_dot"),
      info("graft_long_dot"),
      (args: Seq[Expression]) => LongArrayDot(args(0), args(1)),
    ))
    e.injectFunction((
      FunctionIdentifier("graft_sorted_intersect"),
      info("graft_sorted_intersect"),
      (args: Seq[Expression]) => SortedLongIntersectCount(args(0), args(1)),
    ))
    e.injectFunction((
      FunctionIdentifier("graft_simhash62"),
      info("graft_simhash62"),
      (args: Seq[Expression]) => SimHash62(args(0)),
    ))
    e.injectFunction((
      FunctionIdentifier("graft_minhash_sig"),
      info("graft_minhash_sig"),
      (args: Seq[Expression]) =>
        MinHashSig(args(0), Dedup.perms.map(_._1).toArray, Dedup.perms.map(_._2).toArray, Dedup.MinHashPrime),
    ))
  }
}

object GraftExtensions {
  /** Registers the same functions on an already-built session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_long_dot", es => LongArrayDot(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_sorted_intersect", es => SortedLongIntersectCount(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_simhash62", es => SimHash62(es.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_minhash_sig",
      es => MinHashSig(es.head, Dedup.perms.map(_._1).toArray, Dedup.perms.map(_._2).toArray, Dedup.MinHashPrime),
      "scala_udf",
    )
  }
}
