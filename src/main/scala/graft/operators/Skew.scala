package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY.md §4).
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; these
  * cover the cases AQE cannot rewrite:
  *
  *  - [[saltedAggregate]]: two-phase aggregation for hot grouping keys
  *    (a single giant key otherwise lands on one task no matter how
  *    many partitions exist);
  *  - [[saltedJoin]]: replicate the small side S ways and salt the
  *    skewed side, for shuffle joins where one key dominates and the
  *    small side is too big to broadcast outright.
  */
object Skew {

  /** Deterministic row salt: hash of the full row mod `salts`. A
    * retried/speculated task recomputes the SAME salt for a row
    * (monotonically_increasing_id or rand would not, letting one row
    * land in two buckets across attempts mid-job).
    */
  private def rowSalt(df: DataFrame, salts: Int): Column =
    pmod(hash(df.columns.map(col).toSeq: _*), lit(salts))

  /** Two-phase (salt → partial → merge) aggregation. RESTRICTED to
    * decomposable sum/count-shaped aggregates: the merge phase sums the
    * partials, which is wrong for avg/min/max-of-distinct etc. — pass
    * count(...)/sum(...) partials only.
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      sums: Map[String, Column],
      salts: Int = 16,
  ): DataFrame = {
    require(sums.nonEmpty, "saltedAggregate needs at least one sum/count aggregate")
    val salted = df.withColumn("_salt", rowSalt(df, salts))
    val partial = salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(
        sums.head._2.as(s"_p_${sums.head._1}"),
        sums.tail.map { case (n, c) => c.as(s"_p_$n") }.toSeq: _*
      )
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col(s"_p_${sums.head._1}")).as(sums.head._1),
        sums.tail.keys.map(n => sum(col(s"_p_$n")).as(n)).toSeq: _*
      )
  }

  /** Salted join for a skewed left side: left rows get a random-ish
    * salt in [0, salts); the right side is replicated `salts` times so
    * every (key, salt) bucket finds its match. Correct for 1:N joins
    * where `right` is the deduplicated side.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int = 16): DataFrame = {
    val saltedLeft = left.withColumn("_salt", rowSalt(left, salts))
    val replicatedRight = right.withColumn("_salt", explode(sequence(lit(0L), lit(salts - 1L))))
    saltedLeft.join(replicatedRight, Seq(key, "_salt")).drop("_salt")
  }
}
