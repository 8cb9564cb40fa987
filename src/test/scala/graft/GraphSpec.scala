package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("reliable-checkpoint knob: identical results, checkpoint dir written") {
    // the 100 TB fault-tolerance knob: with spark.graft.graph
    // .checkpointDir set, every iterative op cuts lineage via reliable
    // checkpoints to that dir instead of executor-local storage
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (4L, 1L), (1L, 4L)).toDF("src", "dst")
    val local = Graph.pageRank(edges, 3).as[(Long, Long)].collect().toMap
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-").toFile
    try {
      spark.conf.set("spark.graft.graph.checkpointDir", dir.getAbsolutePath)
      val reliable = Graph.pageRank(edges, 3).as[(Long, Long)].collect().toMap
      assert(reliable == local, "reliable-checkpoint mode must not change results")
      def files(f: java.io.File): Seq[java.io.File] = {
        val kids = Option(f.listFiles()).map(_.toSeq).getOrElse(Nil)
        kids.filter(_.isFile) ++ kids.filter(_.isDirectory).flatMap(files)
      }
      assert(files(dir).nonEmpty, "reliable mode must actually write checkpoint data")
    } finally {
      spark.conf.unset("spark.graft.graph.checkpointDir")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
    assert(!dir.exists, "test cleans its checkpoint dir")
  }

  test("pageRank: one iteration on a hand-computed path graph") {
    // path 1-2-3, both directions. deg: 1→1, 2→2, 3→1; m0 = 1e12 each.
    // transfers: 1 sends 8.5e11 to 2; 2 sends 4.25e11 to each of 1,3;
    // 3 sends 8.5e11 to 2. teleport = 1.5e11.
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, 1).as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> (150000000000L + 425000000000L),
      2L -> (150000000000L + 850000000000L + 850000000000L),
      3L -> (150000000000L + 425000000000L),
    ))
  }

  test("pageRank: mass stays bounded and symmetric nodes tie across iterations") {
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    for (iters <- Seq(2, 5)) {
      val m = Graph.pageRank(edges, iters).as[(Long, Long)].collect().toMap
      assert(m(1L) == m(3L), "graph-symmetric nodes must have identical mass")
      assert(m(2L) > m(1L), "the hub must out-rank the leaves")
      // floor losses only shrink total mass; teleport keeps a floor
      assert(m.values.sum <= 3L * 1000000000000L)
      m.values.foreach(v => assert(v >= 150000000000L))
    }
  }

  test("pageRank: a star hub dominates and every spoke ties") {
    val spokes = (2L to 9L)
    val edges = (spokes.map(s => (1L, s)) ++ spokes.map(s => (s, 1L))).toDF("src", "dst")
    val m = Graph.pageRank(edges, 3).as[(Long, Long)].collect().toMap
    assert(spokes.map(m).distinct.size == 1, "spokes are exchangeable")
    assert(m(1L) > 3 * m(2L), "hub receives all spoke mass each round")
  }

  test("pageRank: zero-in-degree nodes keep teleport mass through every iteration") {
    // 1→2, 2→3, 3→2: node 1 has out-degree 1 but NO incoming edge.
    // It must stay in the mass vector at exactly teleport (1.5e11)
    // and keep feeding node 2 each round (0.85 * 1.5e11 on round 2+).
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    for (iters <- Seq(1, 3)) {
      val m = Graph.pageRank(edges, iters).as[(Long, Long)].collect().toMap
      assert(m.keySet == Set(1L, 2L, 3L), s"node universe must be the src set, got ${m.keySet}")
      assert(m(1L) == 150000000000L, "a source-only node holds teleport-only mass")
    }
    // hand-computed round 3 (node 1 settles at teleport and feeds
    // floor(85*1.5e11/100) = 1.275e11 into node 2 every round):
    val m3 = Graph.pageRank(edges, 3).as[(Long, Long)].collect().toMap
    assert(m3 == Map(
      1L -> 150000000000L,
      2L -> 1741625000000L, // 1.5e11 + 1.275e11 + floor(.85*1.7225e12)
      3L -> 1108375000000L, // 1.5e11 + floor(.85*1.1275e12)
    ), s"got $m3")
  }

  test("q_pagerank: covers both node types, masses positive, deterministic across runs") {
    val a = Graph.qPagerank(spark, sf).collect()
    val types = a.map(_.getAs[String]("node_type")).toSet
    assert(types == Set("customer", "supplier"))
    a.foreach(r => assert(r.getAs[Long]("mass") >= 150000000000L))
    val b = Graph.qPagerank(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("sample_importance: kept fraction tracks mean quality, flag agrees with threshold") {
    val rows = operators.Pipeline.sampleImportance(spark, sf)
      .select("doc_id", "p_keep", "kept").as[(Long, Double, Boolean)].collect()
    rows.foreach { case (_, p, _) => assert(p >= 0.0 && p <= 1.0) }
    val meanP = rows.map(_._2).sum / rows.length
    val keptFrac = rows.count(_._3).toDouble / rows.length
    // Bernoulli(p_i) with independent uniforms: kept fraction within a
    // loose CLT band of the mean quality (n = 500 docs at test sf)
    assert(math.abs(keptFrac - meanP) < 0.15, s"kept=$keptFrac vs meanP=$meanP")
  }

  test("bfs: hand-graph distances take the min over paths; radius bounded by rounds") {
    // chain 1→2→3→4→5 plus shortcut 1→4: node 4 is dist 1 (shortcut
    // beats the 3-hop chain), node 5 is dist 2 via the shortcut
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node_id")
    val d3 = Graph.bfs(edges, seeds, 3).as[(Long, Long)].collect().toMap
    assert(d3 == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 2L))
    // one round reaches only the direct neighbors
    val d1 = Graph.bfs(edges, seeds, 1).as[(Long, Long)].collect().toMap
    assert(d1 == Map(1L -> 0L, 2L -> 1L, 4L -> 1L))
  }

  test("q_bfs: seeds at dist 0, layers alternate node types on the bipartite graph") {
    val rows = Graph.qBfs(spark, sf).collect()
    assert(rows.nonEmpty)
    val dist = rows.map(r => r.getAs[Long]("node_id") -> r.getAs[Long]("dist")).toMap
    assert(dist.filter(_._2 == 0L).keySet.subsetOf(Set(2L, 4L, 6L)))
    rows.foreach { r =>
      val (id, tpe, d) = (r.getAs[Long]("node_id"), r.getAs[String]("node_type"), r.getAs[Long]("dist"))
      assert(d >= 0L && d <= 4L)
      // customer↔supplier edges only: even distance ⇔ customer node
      assert((d % 2 == 0) == (tpe == "customer"), s"node $id type $tpe at dist $d")
    }
  }

  test("hits: one round on a hand-computed bipartite graph") {
    // c1→{s11,s12}, c2→{s11}. h0 = 1e6 each.
    // a_raw: s11 = 2e6, s12 = 1e6; max 2e6 → auth s11 = 1e6, s12 = 5e5.
    // h_raw: c1 = 1.5e6, c2 = 1e6; max 1.5e6 → hub c1 = 1e6,
    // c2 = 1e12 div 1.5e6 = 666666 (floor).
    val edges = Seq((1L, 11L), (1L, 12L), (2L, 11L)).toDF("src", "dst")
    val got = Graph.hits(edges, 1)
      .as[(Long, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got == Map(
      (1L, "hub") -> 1000000L,
      (2L, "hub") -> 666666L,
      (11L, "authority") -> 1000000L,
      (12L, "authority") -> 500000L,
    ))
  }

  test("hits: duplicate edges collapse and scores stay on the (0, scale] grid") {
    val edges = Seq((1L, 11L), (1L, 11L), (1L, 12L), (2L, 11L)).toDF("src", "dst")
    val dup = Graph.hits(edges, 2).as[(Long, String, Long)].collect().toSet
    val single = Graph.hits(edges.distinct(), 2).as[(Long, String, Long)].collect().toSet
    assert(dup == single, "edge multiplicity must not affect scores")
    dup.foreach { case (_, _, s) => assert(s > 0L && s <= 1000000L) }
    assert(dup.count(_._3 == 1000000L) >= 2, "each side's max renormalizes to scale")
  }

  test("q_hits: hubs are customers, authorities suppliers, deterministic across runs") {
    val a = Graph.qHits(spark, sf).collect()
    val b = Graph.qHits(spark, sf).collect()
    assert(a.toSeq == b.toSeq, "integer HITS must be run-deterministic")
    assert(a.nonEmpty)
    a.foreach { r =>
      val (tpe, kind, s) =
        (r.getAs[String]("node_type"), r.getAs[String]("score_kind"), r.getAs[Long]("score"))
      assert((tpe == "customer") == (kind == "hub"))
      assert(s > 0L && s <= 1000000L)
    }
  }

  test("orc roundtrip preserves the documents projection byte-for-byte") {
    val orc = sources.Ingest.qOrcRoundtrip(spark, sf)
      .as[(Long, String, String, Long)].collect().toSeq
    val pq = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), col("source"), md5(col("text")).as("m"), octet_length(col("text")).cast("long"))
      .orderBy("doc_id")
      .as[(Long, String, String, Long)].collect().toSeq
    assert(orc == pq)
  }

  test("labelPropagation: two cliques with a bridge settle into two communities") {
    // cliques {1,2,3} and {10,11,12}, bridge 3-10; undirected
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
    val e = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("u", "v")
    val got = Graph.labelPropagation(e, 3).as[(Long, Long)].collect().toMap
    // min-label tie-breaks pull each clique onto its smallest member
    assert(got.filterKeys(Set(1L, 2L, 3L)).values.toSet.size == 1, s"clique A split: $got")
    assert(got.filterKeys(Set(10L, 11L, 12L)).values.toSet.size == 1, s"clique B split: $got")
    assert(got(1L) != got(11L), s"bridge merged the cliques: $got")
  }

  test("convergence exit: rounds past the fixpoint change nothing (LPA + HITS)") {
    // LPA on the two-clique fixture converges within a few rounds; a
    // 25-round budget must return the identical assignment (the early
    // exit is provably output-preserving — this pins it)
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
    val e = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("u", "v")
    val short = Graph.labelPropagation(e, 5).as[(Long, Long)].collect().sorted.toSeq
    val long = Graph.labelPropagation(e, 25).as[(Long, Long)].collect().sorted.toSeq
    assert(short == long, "extra LPA rounds after the fixpoint changed the assignment")
    // HITS on the integer grid reaches an exact fixpoint fast on the
    // small bipartite fixture
    val ed = Seq((1L, 11L), (1L, 12L), (2L, 11L), (3L, 12L)).toDF("src", "dst")
    val h12 = Graph.hits(ed, 12).as[(Long, String, Long)].collect().sorted.toSeq
    val h25 = Graph.hits(ed, 25).as[(Long, String, Long)].collect().sorted.toSeq
    assert(h12 == h25, "extra HITS rounds after the integer fixpoint changed scores")
  }

  test("q_communities equals a plain-Scala synchronous-LPA replay at sf0.001") {
    val l = GraftSession.table(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .as[(Long, Long)].collect()
    val e0 = l.groupBy(_._1).values.toSeq
      .flatMap { xs =>
        val ps = xs.map(_._2).toSeq
        for (a <- ps; b <- ps if a < b) yield (a, b)
      }
      // NB: .collect{... => p} on a Map would rebuild a Map (pair
      // results re-key!) and silently drop pairs sharing a left part
      .groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val adj = (e0 ++ e0.map(_.swap)).groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2) }
    var lab = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      lab = adj.map { case (u, vs) =>
        val counts = vs.groupBy(lab).map { case (lb, ys) => (lb, ys.size) }
        u -> counts.toSeq.minBy { case (lb, c) => (-c, lb) }._1
      }
    }
    val got = Graph.qCommunities(spark, sf).collect()
      .map(r => (r.getAs[Long]("node"), r.getAs[Long]("community"))).toMap
    assert(got == lab)
    assert(got.values.toSet.size > 1, "LPA collapsed the whole graph into one community")
  }
}
