package graft.tools

import graft.GraftSession
import graft.operators.VectorOps
import org.apache.spark.sql.functions._

/** One-off parameter sweep: ann_ivf recall@5 vs brute force across
  * (numCentroids, nProbes), on the named-query shape (first 20 vectors
  * as queries) and a held-out query set. Picks the recall floor the
  * DedupVectorSpec asserts.
  */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.build("local[8]", 8)
    import spark.implicits._
    val e = GraftSession.table(spark, dir, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    for (qname <- Seq("first20", "heldout")) {
      val q = if (qname == "first20") e.filter(col("id") < 20) else e.filter(col("id") >= 200 && col("id") < 220)
      val bf = VectorOps.annBruteforce(e, q, 5)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      for (k <- Seq(8, 16, 32); p <- Seq(2, 4, 6, 8) if p <= k) {
        val ivf = VectorOps.annIvf(e, q, 5, p, k)
          .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
        val recall = bf.count(ivf.contains).toDouble / bf.size
        println(f"SWEEP $qname%-8s k=$k%-3d probes=$p%-2d recall@5=$recall%.3f")
      }
    }
    spark.stop()
  }
}
