package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + table loader for the graft engine.
  *
  * Tuned for the harness's local[32] single-JVM mode, but every knob
  * here (AQE, shuffle partition sizing, broadcast threshold) is the
  * same one we'd set on a real multi-executor cluster — only the
  * numbers change with scale.
  */
object GraftSession {

  /** Confs applied to any session the engine builds or inherits.
    * AQE handles runtime re-planning (skew joins, partition
    * coalescing) — the 100 TB story depends on it, and it costs
    * nothing at test scale.
    */
  val tunedConf: Seq[(String, String)] = Seq(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    // INT96 parquet timestamps read back timezone-NAIVE (like the
    // DuckDB oracle's TIMESTAMP); TIMESTAMP_MICROS would be annotated
    // isAdjustedToUTC=true and read tz-aware → naive-vs-aware value
    // mismatches in any downstream comparison
    "spark.sql.parquet.outputTimestampType" -> "INT96",
    // the testdata timestamps are TIMESTAMP(isAdjustedToUTC=false, µs),
    // which Spark 4 infers as TIMESTAMP_NTZ by default — a type
    // unix_micros/window() reject. Reading them as LTZ keeps the stored
    // micros AS epoch micros (session tz is UTC), exactly the naive
    // semantics DuckDB's epoch_us(ts) applies on its side.
    "spark.sql.parquet.inferTimestampNTZ.enabled" -> "false",
  )

  def build(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val b = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.ui.enabled", "false")
    tunedConf.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Materialize-then-release for operators whose plan self-joins a
    * cached intermediate: force the UNSORTED `out` (cache + count)
    * while the intermediates are hot, then unpersist every
    * intermediate so no executor memory stays pinned past the call,
    * and apply the final deterministic ordering on top of the cached
    * result. Returning the lazy plan with live caches instead would
    * leak them for the session lifetime (the round-4 "Asked to cache
    * already cached data" warnings); caching WITH the orderBy would
    * bake a range-shuffle + sort into the materialization. The
    * materialized result is small by construction (a near-dup pair set
    * or per-row summary), so the sort-on-read is noise.
    */
  def materialized(out: DataFrame, sortCols: Seq[String], intermediates: DataFrame*): DataFrame = {
    // cache() is keyed on the logical plan: a repeat invocation of the
    // same query would hit "Asked to cache already cached data", so
    // only cache when the plan isn't already in the cache manager
    val res =
      if (out.storageLevel == org.apache.spark.storage.StorageLevel.NONE) out.cache() else out
    res.count()
    intermediates.foreach(_.unpersist())
    res.orderBy(sortCols.map(org.apache.spark.sql.functions.col): _*)
  }

  /** Reads one of the standard test tables from an sf directory.
    *
    * Timestamp normalization, robust to either testdata vintage: a
    * TIMESTAMP(NANOS) column (pre-r7 data) is read as long and
    * truncated to µs timestamps (matching DuckDB's `CAST(ts AS
    * TIMESTAMP)` truncation); a TIMESTAMP(µs, isAdjustedToUTC=false)
    * column (current data) is read as LTZ — stored micros become
    * epoch micros, matching DuckDB's naive `epoch_us(ts)`.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // set here too (not just tunedConf) so sessions we merely inherit
    // read µs-NTZ parquet the same way — see tunedConf for rationale
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case None => df
    }
  }
}
