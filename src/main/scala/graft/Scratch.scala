package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

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

    def time(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      materialize(df)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"TIMING $name%-24s $dt%8.2f s")
    }

    val docs = GraftSession.table(spark, sfDir, "documents")
    val ws = split(col("text"), " ")
    def hofGrams = when(
      size(ws) >= 5,
      array_distinct(transform(sequence(lit(0), size(ws) - 5), i => concat_ws(" ", slice(ws, i + 1, lit(5))))),
    ).otherwise(array(col("text")))
    def kernelGrams = array_distinct(graft.functions.ArrayExprs.wordNgrams(ws, 5))

    time("warm")(docs.select(col("doc_id")))
    time("hof_grams")(docs.select(col("doc_id"), hofGrams.as("g")))
    time("kernel_grams")(docs.select(col("doc_id"), kernelGrams.as("g")))
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("decontaminate", "text_repetition", "dedup_incremental", "dedup_clusters", "dedup_minhash_lsh")
    names.foreach { n =>
      try time(n)(SparkEntry.queries(n)(spark, sfDir))
      catch { case e: Throwable => println(s"ERROR $n: ${e.getMessage}"); e.printStackTrace() }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
