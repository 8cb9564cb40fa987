package graft

import graft.operators.{Dedup, Relational, TextAnalysis, VectorOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the r3 additions beyond their DuckDB oracles:
  * the blocked implementations must equal their brute-force
  * formulations, and derived quantities must satisfy their bounds.
  */
class Round3OpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("fuzzy_pairs length-band blocking equals the brute-force cross join") {
    val names = GraftSession.table(spark, sf, "part").select(col("p_name").as("name"))
    val got = Dedup.fuzzyPairs(names, 2).select("name_a", "name_b").as[(String, String)].collect().toSet
    val d = names.distinct()
    val brute = d.select(col("name").as("a"))
      .crossJoin(d.select(col("name").as("b")))
      .filter(col("a") < col("b") && levenshtein(col("a"), col("b")) <= 2)
      .as[(String, String)].collect().toSet
    assert(got == brute)
    assert(got.nonEmpty, "part names should contain near-matches")
  }

  test("q_rangejoin bucketed interval join equals the brute-force non-equi join") {
    val got = Relational.qRangejoin(spark, sf)
      .select(col("event_id"), col("n_clicks")).as[(Long, Long)].collect().toMap
    val ev = GraftSession.table(spark, sf, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("pu"), unix_micros(col("ts")).as("p_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), unix_micros(col("ts")).as("c_us"))
    val brute = p.join(
        c,
        col("pu") === col("cu") && col("c_us") >= col("p_us") - lit(600000000L) && col("c_us") < col("p_us"),
        "left",
      )
      .groupBy(col("event_id")).agg(count(col("c_us")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == brute)
    assert(got.values.exists(_ > 0), "some purchase should have preceding clicks")
  }

  test("emb_quantize: error bounded by half a quantum, max element saturates") {
    val rows = VectorOps.embQuantize(spark, sf)
      .select(col("scale"), col("n_sat"), col("err_max"))
      .as[(Double, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (scale, nSat, errMax) =>
      assert(nSat >= 1, "the max-abs element must quantize to ±127")
      // |x/scale*127 - q| <= 0.5  =>  |q*scale/127 - x| <= scale/254 (+ 1 ulp slack)
      assert(errMax <= scale / 254 * (1 + 1e-9), s"errMax=$errMax scale=$scale")
    }
  }

  test("text_tfidf: ranks are 1..10 per source and score = tf*N/df") {
    val out = TextAnalysis.textTfidf(spark, sf)
    val n = GraftSession.table(spark, sf, "documents").count()
    val rows = out.select("source", "rk", "tf", "df", "score")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq)
      assert(rs.length <= 10)
    }
    rows.foreach { case (_, _, tf, df, score) =>
      assert(score == tf.toDouble * n / df)
    }
  }

  test("text_filter: keep iff reasons empty, and both verdicts occur") {
    val rows = operators.Pipeline.textFilter(spark, sf)
      .select("keep", "reasons").as[(Boolean, String)].collect()
    rows.foreach { case (keep, reasons) => assert(keep == reasons.isEmpty) }
    assert(rows.exists(_._1) && rows.exists(!_._1), "filter should split the corpus")
  }

  test("shard_assign: balanced-ish deterministic shards with dense positions") {
    val rows = operators.Pipeline.shardAssign(spark, sf, 16)
      .select("shard_id", "pos_in_shard").as[(Long, Long)].collect()
    val byShard = rows.groupBy(_._1)
    assert(byShard.keys.forall(s => s >= 0 && s < 16))
    byShard.foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq, "positions are dense 1..k")
    }
    // content-keyed md5 sharding: no shard takes more than ~3x its fair share
    assert(byShard.values.map(_.length).max <= rows.length / 16 * 3)
    // determinism across evaluations
    val again = operators.Pipeline.shardAssign(spark, sf, 16)
      .select("shard_id", "pos_in_shard").as[(Long, Long)].collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("exportShards: sharded write round-trips, one file per shard, manifest matches") {
    val out = java.nio.file.Files.createTempDirectory("graft_export").toString
    try {
      val docsDf = GraftSession.table(spark, sf, "documents").select("doc_id", "text")
      val written = operators.Pipeline.exportShards(docsDf, out, 16)
        .as[(Long, Long, Long, Long, String, String)].collect().toSeq
      val expected = operators.Pipeline.exportManifest(spark, sf, 16)
        .as[(Long, Long, Long, Long, String, String)].collect().toSeq
      assert(written == expected, "post-write manifest equals pre-write expectation")
      // round trip: every doc lands in exactly the shard shardAssign gives it
      val back = spark.read.parquet(out).select(col("doc_id"), col("shard_id").cast("long"))
        .as[(Long, Long)].collect().toMap
      val assign = operators.Pipeline.shardAssign(spark, sf, 16)
        .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
      assert(back == assign)
      // exactly one data file per shard dir: the one-writer-task-per-shard contract
      val shardDirs = new java.io.File(out).listFiles().filter(_.getName.startsWith("shard_id="))
      assert(shardDirs.length == 16)
      shardDirs.foreach { d =>
        val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(files.length == 1, s"${d.getName} has ${files.length} files")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
    }
  }

  test("connectedComponents: driver union-find fast path equals the distributed loop") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), // chain -> {1,2,3}
      (10L, 11L), // pair
      (20L, 21L), (21L, 22L), (20L, 22L), // triangle
      (30L, 31L), (32L, 31L), (33L, 30L), (34L, 33L), // deeper chain
    ).toDF("doc_a", "doc_b")
    val fast = operators.Pipeline.connectedComponents(pairs)
      .as[(Long, Long)].collect().toSet
    val dist = operators.Pipeline.connectedComponents(pairs, driverMaxEdges = -1L)
      .as[(Long, Long)].collect().toSet
    assert(fast == dist)
    assert(fast.filter(_._1 <= 3L).map(_._2) == Set(1L))
    assert(fast.filter(t => t._1 >= 30 && t._1 <= 34).map(_._2) == Set(30L))
  }

  test("multimodal_dedup: copies partition the table, dup_bytes consistent") {
    val media = multimodal.Multimodal.mediaTable(spark, sf)
    val rows = multimodal.Multimodal.multimodalDedup(spark, sf)
      .select("n_copies", "keep_id", "n_bytes", "dup_bytes")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).sum == media.count(), "every payload lands in exactly one group")
    rows.foreach { case (n, _, bytes, dup) => assert(dup == (n - 1) * bytes) }
    // keep_id is the min doc_id of its group -> keep_ids are distinct
    assert(rows.map(_._2).distinct.length == rows.length)
    // duplicate payloads (constructed): copies collapse to one group
    // keyed by the smallest doc_id, and dup_bytes counts the copies
    val withDups = media.unionByName(
      media.limit(10).withColumn("doc_id", col("doc_id") + lit(1000000L)))
    val dgroups = multimodal.Multimodal.multimodalDedupOn(withDups)
      .filter(col("n_copies") > 1)
      .select("n_copies", "keep_id", "n_bytes", "dup_bytes")
      .as[(Long, Long, Long, Long)].collect()
    assert(dgroups.length >= 10)
    dgroups.foreach { case (n, keep, bytes, dup) =>
      assert(keep < 1000000L, "survivor is the original, not the copy")
      assert(dup == (n - 1) * bytes)
    }
  }

  test("kmeansCentroids: distributed path (driverMaxPoints=0) matches the fast-path contract") {
    val e = GraftSession.table(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val cents = VectorOps.kmeansCentroids(e, 8, driverMaxPoints = 0L)
      .select("centroid_id", "cv").as[(Int, Seq[Long])].collect()
    assert(cents.map(_._1).sorted.toSeq == (0 until 8))
    cents.foreach { case (_, cv) =>
      assert(cv.length == 64)
      // centers live on the ×10000 quantized unit sphere
      val n = math.sqrt(cv.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 10000.0) < 150.0, s"center norm $n off the sphere")
    }
    // the fast path must also satisfy the same contract and fill every list
    val fast = VectorOps.kmeansCentroids(e, 8)
    val lists = VectorOps.annIvf(e, e.filter(col("id") < 5), 3, 2, fast)
    assert(lists.count() == 15)
  }

  test("annFiltered: equals brute-force top-k restricted to the query's label") {
    val e = GraftSession.table(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"), col("label"))
    val got = VectorOps.annFiltered(e, e.filter(col("id") < 10), 3, "label")
      .select("query_id", "rank", "neighbor_id").as[(Long, Long, Long)].collect().toSet
    // brute force: all (query, candidate) pairs, keep same-label, rank by the
    // same quantized cosine + id tiebreak
    val all = VectorOps.annBruteforce(e.select(col("id"), col("embedding")), e.filter(col("id") < 10), e.count().toInt)
      .join(e.select(col("id").as("query_id"), col("label").as("ql")), "query_id")
      .join(e.select(col("id").as("neighbor_id"), col("label").as("nl")), "neighbor_id")
      .filter(col("ql") === col("nl"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    val brute = all.withColumn("r", row_number().over(w).cast("long")).filter(col("r") <= 3)
      .select("query_id", "r", "neighbor_id").as[(Long, Long, Long)].collect().toSet
    assert(got == brute)
    assert(got.size == 30, "10 queries x top-3 within label")
  }

  test("dedup_ngram_exact: prefix filtering is lossless vs the brute-force all-pairs join") {
    val got = Dedup.dedupNgramExact(spark, sf)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val s = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), array_distinct(
        graft.functions.ArrayExprs.wordNgrams(split(col("text"), " "), 3)).as("sh"))
    val brute = s.as("a").join(s.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("j",
        size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh"))))
      .filter(col("j") >= 0.8)
      .select(col("a.doc_id"), col("b.doc_id"), col("j")).as[(Long, Long, Double)].collect().toSet
    assert(got == brute)
    assert(got.nonEmpty, "corpus should contain near-duplicate shingle sets")
    // exact join must cover everything the probabilistic MinHash path finds
    val minhash = Dedup.dedupMinhashLsh(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(minhash.subsetOf(got.map(t => (t._1, t._2))))
  }

  test("dedup_survivors: exactly one keeper per cluster, and it's the best-quality member") {
    val rows = operators.Pipeline.dedupSurvivors(spark, sf)
      .select("doc_id", "cluster_id", "quality_score", "keep")
      .as[(Long, Long, Double, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (cid, members) =>
      assert(members.count(_._4) == 1, s"cluster $cid must keep exactly one doc")
      val best = members.maxBy(m => (m._3, -m._1))
      assert(members.find(_._4).get._1 == best._1,
        s"cluster $cid keeper is not the (score desc, id asc) argmax")
    }
  }

  test("q_grouping_sets: finer sets roll up consistently") {
    val rows = Relational.qGroupingSets(spark, sf)
      .select(col("gid"), col("n_rows")).as[(Long, Long)].collect()
    val fine = rows.collect { case (0L, n) => n }.sum
    val mid = rows.collect { case (1L, n) => n }.sum
    val total = rows.collect { case (3L, n) => n }.sum
    assert(fine == total && mid == total && total > 0)
  }
}
