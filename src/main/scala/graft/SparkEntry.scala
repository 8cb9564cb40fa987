package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator family's `queries` /
  * `oracles` maps (SURVEY.md §2 is the inventory).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++ operators.PartSupp.queries ++
      operators.LakeOps.queries ++
      operators.TextAnalysis.queries ++ operators.Dedup.queries ++
      operators.VectorOps.queries ++ operators.Pipeline.queries ++
      operators.Graph.queries ++ operators.Bpe.queries ++
      operators.TableFormat.queries ++
      sources.Ingest.queries ++ multimodal.Multimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++ operators.PartSupp.oracles ++
      operators.LakeOps.oracles ++
      operators.TextAnalysis.oracles ++ operators.Dedup.oracles ++
      operators.VectorOps.oracles ++ operators.Pipeline.oracles ++
      operators.Graph.oracles ++ operators.Bpe.oracles ++
      operators.TableFormat.oracles ++
      sources.Ingest.oracles ++ multimodal.Multimodal.oracles
}
