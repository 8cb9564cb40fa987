package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Debug main: dump ONE named query's result parquet at an SF dir
  * (args: queryName sfDir outPath) — the single-query form of Verify
  * for targeted cross-engine checks without a full 80-query run.
  */
object DumpOne {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: DumpOne <query> <sfDir> <outPath>")
    val Array(name, sfDir, out) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tunedConf.foreach { case (k, v) => spark.conf.set(k, v) }
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").parquet(out)
    spark.stop()
  }
}
