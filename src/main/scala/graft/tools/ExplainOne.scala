package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Debug main: print ONE named query's formatted physical plan at an
  * SF dir (args: queryName [sfDir]) — the plan-inspection loop the
  * scale review uses without firing an execution.
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExplainOne <query> [sfDir]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tunedConf.foreach { case (k, v) => spark.conf.set(k, v) }
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    if (args.contains("--exec")) {
      df.write.format("noop").mode("overwrite").save()
      println("== Executed (AQE-final) Plan ==")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
