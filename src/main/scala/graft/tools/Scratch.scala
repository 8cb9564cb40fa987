package graft.tools

import graft.{GraftSession, SparkEntry}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Temporary profiling main (not part of the library surface): times
  * the named queries (args, default = the recent heavy hitters) at
  * SPARK_GRAFT_SF_DIR after a warm-up pass.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tunedConf.foreach { case (k, v) => spark.conf.set(k, v) }
    spark.sparkContext.setLogLevel("WARN")

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      materialize(df)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"TIMING $name%-24s $dt%8.2f s")
    }

    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("dedup_clusters", "ann_ivf", "dedup_embedding", "text_winnow_pairs")
    // JVM/codegen warm-up so timings measure the plan, not cold start
    names.foreach(n => materialize(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")))
    spark.catalog.clearCache()
    names.foreach { n =>
      try time(n)(SparkEntry.queries(n)(spark, sfDir))
      catch { case e: Throwable => println(s"ERROR $n: ${e.getMessage}"); e.printStackTrace() }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    }
    spark.stop()
  }
}
