package graft

import graft.operators.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quality + determinism pins for the NN-descent k-NN graph
  * (SURVEY §2.4 #29m, rows-only by design — iterative, LSH-seeded).
  */
class KnnGraphSpec extends AnyFunSuite {
  import TestSpark._

  private val K = 5

  /** brute-force true k-NN per node, (cosine DESC, id ASC) order. */
  private lazy val truth: Map[Long, Seq[Long]] = {
    val vs = GraftSession.table(spark, sf, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => floor(x.cast("double") * 10000 + 0.5).cast("long")).as("qv"))
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Long](1).toArray)
    val norms = vs.map { case (id, q) => id -> math.sqrt(q.map(x => x.toDouble * x).sum) }.toMap
    vs.map { case (a, qa) =>
      val top = vs.filter(_._1 != a).map { case (b, qb) =>
        var dot = 0L; var i = 0
        while (i < qa.length) { dot += qa(i) * qb(i); i += 1 }
        (b, dot.toDouble / (norms(a) * norms(b)))
      }.sortBy { case (b, c) => (-c, b) }.take(K).map(_._1)
      a -> top.toSeq
    }.toMap
  }

  test("knn-graph recall vs the brute-force true k-NN graph") {
    val got = VectorOps.annKnnGraph(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // every node got exactly K edges, self-free
    got.foreach { case (v, ns) =>
      assert(ns.size == K, s"node $v has ${ns.size} neighbors")
      assert(!ns.contains(v))
    }
    assert(got.keySet == truth.keySet, "every corpus vector gets a neighbor list")
    val hits = truth.toSeq.map { case (v, t) => t.count(got(v).contains) }.sum
    val recall = hits.toDouble / (truth.size * K)
    info(s"knn-graph recall@$K = $recall")
    assert(recall >= 0.8, s"NN-descent graph recall under the pinned floor: $recall")
  }

  test("graph-expanded query beats its IVF seed and nears brute-force recall") {
    val bf = VectorOps.annBruteforce(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivf = VectorOps.annIvf(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exp = VectorOps.annGraphExpand(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val ivfRecall = bf.count(ivf.contains).toDouble / bf.size
    val expRecall = bf.count(exp.contains).toDouble / bf.size
    info(s"ivf recall@5 = $ivfRecall, graph-expanded recall@5 = $expRecall")
    assert(expRecall >= ivfRecall, "expansion must never lose the seed's recall")
    assert(expRecall >= 0.9, s"graph-expanded recall under the pinned floor: $expRecall")
  }

  test("knn-graph is deterministic and rank-ordered") {
    val a = VectorOps.annKnnGraph(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id")))
    val b = VectorOps.annKnnGraph(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id")))
    assert(a.toSeq == b.toSeq, "LSH-seeded NN-descent must replay identically")
    // ranks are 1..K per node
    a.groupBy(_._1).values.foreach(g => assert(g.map(_._2).sorted.toSeq == (1L to K.toLong)))
  }

  test("sample_diversity equals the sequential greedy MIS, covers the corpus") {
    val out = VectorOps.sampleDiversity(spark, sf).collect()
    // replay sequentially from the SAME materialized graph artifact
    val g = VectorOps.knnGraphTable(spark, sf).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("neighbor_id"), r.getAs[Double]("cosine")))
    val sym = g.filter(_._3 >= 0.4).flatMap(e => Seq((e._1, e._2), (e._2, e._1))).toSet
    val nbrs = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = g.map(_._1).distinct
    val deg = nodes.map(n => n -> nbrs.getOrElse(n, Set.empty[Long]).size.toLong).toMap
    // lexicographically-first MIS under (degree ASC, id ASC)
    val keptRef = scala.collection.mutable.Set[Long]()
    for (n <- nodes.sortBy(n => (deg(n), n)))
      if (!nbrs.getOrElse(n, Set.empty[Long]).exists(keptRef)) keptRef += n

    assert(out.length == nodes.length, "one row per corpus vector")
    val gotKept = out.filter(_.getAs[Boolean]("kept")).map(_.getAs[Long]("vec_id")).toSet
    assert(gotKept == keptRef.toSet, "distributed local-optimum rounds must equal the sequential greedy")
    // the 0.4 band is populated at every SF, so the sample must actually drop some
    assert(gotKept.size < nodes.length, "no node was dropped — threshold produced no edges")
    out.foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(r.getAs[Long]("degree") == deg(id))
      if (r.getAs[Boolean]("kept")) assert(r.getAs[Long]("rep_id") == id)
      else {
        val keptNbrs = nbrs(id).filter(gotKept)
        assert(keptNbrs.nonEmpty, s"dropped node $id has no kept representative (MIS not maximal)")
        assert(r.getAs[Long]("rep_id") == keptNbrs.minBy(n => (deg(n), n)),
          s"rep of $id must be its min-priority kept neighbor")
      }
    }
    // independence: no two kept nodes are near-dups of each other
    assert(!sym.exists { case (a, b) => gotKept(a) && gotKept(b) })
  }
}
