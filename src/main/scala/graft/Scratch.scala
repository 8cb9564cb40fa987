package graft

import org.apache.spark.sql.SparkSession

/** Temporary profiling main (not part of the library surface). */
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

    val names = if (args.nonEmpty) args.toSeq else Seq("q1_agg", "q_json", "q_sketches", "q_topk_group")
    // warm
    names.foreach(n => materialize(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")))
    names.foreach { n =>
      val t0 = System.nanoTime()
      materialize(SparkEntry.queries(n)(spark, sfDir))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"TIMING $n%-20s $dt%8.2f s")
    }
    spark.stop()
  }
}
