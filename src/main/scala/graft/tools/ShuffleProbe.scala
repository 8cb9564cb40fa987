package graft.tools

import java.util.concurrent.atomic.LongAdder

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Shuffle-volume probe: runs named queries and reports total shuffle
  * WRITE bytes and records from the task metrics — the number wall
  * time hides on a small box but the cluster pays for at 100 TB.
  * Motivated by the overlap-matrix pair: text_overlap's second
  * fact-wide shuffle (the distinct gram relation) grows with the
  * corpus while text_overlap_sketch collapses map-side into
  * |sources|·128 longs — wall time at sf≤1 can't show that (CPU-bound
  * permutations dominate), shuffle bytes can.
  *
  * Usage: runMain graft.tools.ShuffleProbe <sfDir> <query> [query...]
  */
object ShuffleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.GraftSession.tunedConf.foreach { case (k, v) => spark.conf.set(k, v) }
    spark.sparkContext.setLogLevel("WARN")

    val bytes = new LongAdder
    val records = new LongAdder
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          bytes.add(m.shuffleWriteMetrics.bytesWritten)
          records.add(m.shuffleWriteMetrics.recordsWritten)
        }
      }
    }
    val out = names.map { n =>
      bytes.reset(); records.reset()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // listenerBus is private[spark]; a short sleep drains the queued
      // task-end events before the adders are read (metrics accuracy,
      // not correctness — this is a reporting tool)
      Thread.sleep(1500)
      spark.sparkContext.removeSparkListener(listener)
      spark.catalog.clearCache()
      val r = (n, bytes.sum(), records.sum(), sec)
      println(f"[shuffleprobe] ${r._1}%-24s shuffle ${r._2 / 1048576.0}%9.2f MiB  ${r._3}%12d rows  ${r._4}%7.2f s")
      r
    }
    val json = out.map { case (n, b, r, s) =>
      s""""$n":{"shuffle_bytes":$b,"shuffle_rows":$r,"sec":${"%.2f".format(s)}}"""
    }.mkString("{", ",", "}")
    println(s"[shuffleprobe-json] $json")
    spark.stop()
  }
}
