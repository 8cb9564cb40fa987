package graft

import graft.lake.{ChunkStore, LakeParams}
import graft.operators.{Graph, LakeOps, VectorOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}
import org.scalatest.funsuite.AnyFunSuite

/** Round-20 pins: the k-core fixpoint PRE-check (converged rounds
  * cost zero Spark jobs), the `ann_probe_sweep` recall-vs-probes
  * curve (candidate nesting, monotone hits, exhaustive anchor), the
  * oracled `lake_fsck` audit (planted counts replayed exactly in
  * plain Scala; a healthy universe is all-zero through the same
  * static algebra), and the `lake_tree_get` recursive-manifest point
  * read (payload equality with recomputation, bucket-pruned chunk
  * scans, depth ≥ 2 trees).
  */
class Round20OpsSpec extends AnyFunSuite {
  import TestSpark._

  private def sha256hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // ------------------------------------------------------ k-core exit

  private def jobsDuring(group: String)(body: => Unit): Int = {
    spark.sparkContext.setJobGroup(group, group)
    try body finally spark.sparkContext.clearJobGroup()
    // the status tracker is fed by the async listener bus; poll until
    // the count is stable rather than racing it
    var n = -1; var same = 0
    while (same < 3) {
      val m = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
      if (m == n) same += 1 else { same = 0; n = m }
      Thread.sleep(50)
    }
    n
  }

  test("kcorePeel: rounds after the fixpoint cost zero Spark jobs and emit identical stats") {
    import spark.implicits._
    // a 4-clique IS its own 3-core: the pre-check fires on round 1
    val clique = (for { a <- 0 to 3; b <- 0 to 3 if a != b }
      yield (a.toLong, b.toLong)).toDF("src", "dst")
    val j1 = jobsDuring("kcore-fix-1") { Graph.kcorePeel(clique, 3, 1).collect(): Unit }
    var out: Array[org.apache.spark.sql.Row] = Array.empty
    val j8 = jobsDuring("kcore-fix-8") { out = Graph.kcorePeel(clique, 3, 8).collect() }
    assert(j8 == j1, s"7 converged rounds must add zero jobs (rounds=1: $j1, rounds=8: $j8)")
    assert(out.length == 8 && out.forall(r =>
      r.getLong(1) == 4L && r.getLong(2) == 12L),
      s"every round reports the stable 3-core: ${out.mkString(", ")}")
  }

  test("kcorePeel: pre-check preserves the peel semantics on a non-trivial graph") {
    import spark.implicits._
    // triangle 0-1-2 plus pendant 3-0 (symmetric edge list)
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 0L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("src", "dst")
    val got = Graph.kcorePeel(edges, k = 2, rounds = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // round 1 peels the pendant; rounds 2-4 are the detected fixpoint
    assert(got.toSeq == Seq((1L, 3L, 6L), (2L, 3L, 6L), (3L, 3L, 6L), (4L, 3L, 6L)))
  }

  // -------------------------------------------------- ann_probe_sweep

  test("ann_probe_sweep: monotone hits per family, exhaustive anchor at 16/16") {
    val sweep = VectorOps.annProbeSweep(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(sweep.length == 12, s"4 families x 3 probe counts: ${sweep.mkString(", ")}")
    val nTruth = sweep.head._3
    assert(sweep.forall(_._3 == nTruth), "one shared brute-force truth set")
    for (m <- Seq("ivf", "ivf_indexed", "ivfpq", "lsh")) {
      val cur = sweep.filter(_._1 == m).sortBy(_._2)
      assert(cur.map(_._2).toSeq == (if (m == "lsh") Seq(1, 2, 4) else Seq(4, 8, 16)),
        s"$m probe axis")
      if (m == "ivfpq") {
        // NOT a theorem for IVF-PQ: the top-(16·k) ADC shortlist is
        // recomputed over the grown candidate set, so a truth item in
        // the shortlist at p=4 can be displaced at p=8 by higher-ADC/
        // lower-cosine candidates. Empirically monotone on this
        // corpus; assert only no-collapse (a widened probe must not
        // lose more than a shortlist-churn sliver) so data or seeding
        // drift can't flake the suite.
        assert(cur.sliding(2).forall(w => w(1)._4 >= w(0)._4 - math.max(1L, w(0)._4 / 10)),
          s"$m: n_hits collapsed as nProbes grew: ${cur.mkString(", ")}")
      } else
        assert(cur.sliding(2).forall(w => w(0)._4 <= w(1)._4),
          s"$m: n_hits must be non-decreasing in nProbes: ${cur.mkString(", ")}")
      assert(cur.forall(r => r._5 == r._4 * 1000000L / nTruth), s"$m: ppm arithmetic")
    }
    // 16-of-16 probes degenerates plain IVF (and its materialized twin)
    // to exhaustive search — recall 1.0 by construction. (IVF-PQ keeps
    // its ADC-shortlist approximation, so only monotonicity is a
    // theorem there.)
    for (m <- Seq("ivf", "ivf_indexed")) {
      val at16 = sweep.find(r => r._1 == m && r._2 == 16).get
      assert(at16._5 == 1000000L, s"$m at 16/16 probes must have recall 1.0, got ${at16._5} ppm")
    }
  }

  test("ann_probe_sweep derivation equals the standalone operators at every probe point") {
    // the sweep derives each operating point by prn-prefix filtering
    // ONE widest-probe scoring pass per family; each point's hit count
    // must equal the standalone operator run at that nProbes
    val data = GraftSession.table(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val qs = data.filter(col("id") < 20)
    val cents = VectorOps.kmeansCentroids(data, 16)
    val truth = VectorOps.annBruteforce(spark, sf)
      .select(col("query_id"), col("neighbor_id"))
    def hits(df: org.apache.spark.sql.DataFrame): Long =
      df.select(col("query_id"), col("neighbor_id"))
        .join(truth, Seq("query_id", "neighbor_id"), "left_semi").count()
    val sweep = VectorOps.annProbeSweep(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(3)).toMap
    for (p <- Seq(4, 8, 16)) {
      assert(sweep(("ivf", p)) == hits(VectorOps.annIvf(data, qs, 5, p, cents)),
        s"ivf point at p=$p diverges from the standalone operator")
      assert(sweep(("ivf_indexed", p)) == hits(VectorOps.annIvfIndexed(spark, sf, qs, 5, p)),
        s"ivf_indexed point at p=$p diverges from the standalone operator")
      assert(sweep(("ivfpq", p)) == hits(VectorOps.annIvfPq(spark, sf, qs, 5, p, shortlistFactor = 16)),
        s"ivfpq point at p=$p diverges from the standalone operator")
    }
    for (p <- Seq(1, 2, 4))
      assert(sweep(("lsh", p)) == hits(VectorOps.annLsh(data, qs, 5, p)),
        s"lsh point at p=$p diverges from the standalone operator")
  }

  test("IVF candidate sets nest as nProbes grows under one frozen quantizer") {
    val data = GraftSession.table(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val qs = data.filter(col("id") < 5)
    val cents = VectorOps.kmeansCentroids(data, 16)
    val n = data.count().toInt
    // k = corpus size → top-k keeps EVERY scored candidate, so the
    // result set IS the candidate set and containment is observable
    // through the public operator surface
    def cands(p: Int): Set[(Long, Long)] =
      VectorOps.annIvf(data, qs, n, p, cents).select("query_id", "neighbor_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val c4 = cands(4); val c8 = cands(8); val c16 = cands(16)
    assert(c4.subsetOf(c8) && c8.subsetOf(c16),
      s"probed candidate sets must nest: ${c4.size} / ${c8.size} / ${c16.size}")
    assert(c4.size < c16.size, "widening probes must actually widen the candidate pool")
  }

  // ------------------------------------------------------- lake_fsck

  test("lake_fsck: planted corruption counts replay exactly in plain Scala") {
    val got = LakeOps.lakeFsck(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

    val raw = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // blob grain: unique text, min doc_id
    val blobs = raw.groupBy(_._2).map { case (text, rows) =>
      (sha256hex(text), rows.map(_._1).min, text, text.length.toLong)
    }.toSeq
    def kind(len: Long) = if (len <= 64) "inline" else if (len <= 256) "single" else "tree"
    def parts(text: String): Seq[(Long, Long, String)] =
      (0L until (text.length + 255L) / 256L).map { i =>
        val p = text.substring((i * 256L).toInt, math.min(((i + 1) * 256L).toInt, text.length))
        (i, p.length.toLong, sha256hex(p))
      }
    val cat = blobs.filter(_._2 % 29 != 4).map { case (h, mid, text, len) =>
      val k = kind(len)
      val tot = len + (if (mid % 31 == 5 && k != "inline") 1L else 0L)
      val inl = if (k == "inline" && mid % 11 != 6) Some(text) else None
      val root = if (k != "inline" && mid % 37 != 7) Some(sha256hex(text.substring(0, math.min(256, text.length)))) else None
      // planted depth over-recording (the flat universe's true max level is 0)
      val depth = if (k != "inline" && mid % 41 == 8) 1 else 0
      (h, k, tot, inl, root, depth)
    }
    val manifest0 = blobs.filter(b => kind(b._4) != "inline").flatMap { case (h, mid, text, _) =>
      parts(text).map { case (pi, pl, ch) => (h, mid, pi, pl, ch) }
    }
    val mKept = manifest0.filter(_._2 % 23 != 3)
    val manifest = mKept ++ mKept.filter(_._2 % 19 == 2)
    val cKept = manifest0.map(_._5).distinct.filterNot(_.startsWith("0"))
    val chunks = cKept ++ cKept.filter(_.startsWith("f")) ++
      raw.map(_._1).distinct.filter(_ % 17 == 0).map(id => sha256hex(s"orphan-$id"))
    val chunkSet = chunks.toSet
    val refs = manifest.map(_._5).toSet ++ cat.flatMap(_._5)
    val mBlobSet = manifest.map(_._1).toSet
    val catBlobSet = cat.map(_._1).toSet
    val lenByBlob = manifest.map(t => (t._1, t._3, t._4)).distinct
      .groupBy(_._1).map { case (h, ps) => h -> ps.map(_._3).sum }
    val expected = Map(
      "manifest_missing_chunks" -> manifest.count(t => !chunkSet.contains(t._5)).toLong,
      "orphan_chunks" -> chunks.distinct.count(h => !refs.contains(h)).toLong,
      "duplicate_manifest_rows" -> manifest.groupBy(t => (t._1, t._3)).count(_._2.size > 1).toLong,
      "duplicate_chunks" -> chunks.groupBy(identity).count(_._2.size > 1).toLong,
      "catalog_without_manifest" -> cat.count(c => c._2 != "inline" && !mBlobSet.contains(c._1)).toLong,
      "manifest_without_catalog" -> mBlobSet.count(h => !catBlobSet.contains(h)).toLong,
      "blob_length_mismatch" -> cat.count(c =>
        c._2 != "inline" && lenByBlob.get(c._1).exists(_ != c._3)).toLong,
      "inline_missing_payload" -> cat.count(c => c._2 == "inline" && c._4.isEmpty).toLong,
      "chunked_missing_root" -> cat.count(c => c._2 != "inline" && c._5.isEmpty).toLong,
      "catalog_tree_depth_mismatch" -> cat.count(c =>
        c._2 != "inline" && mBlobSet.contains(c._1) && c._6 != 0).toLong,
    )
    assert(got == expected, s"got $got\nexpected $expected")
    // the planted classes that must actually fire at this SF (the
    // others depend on which min_id residues exist in the corpus)
    assert(got("orphan_chunks") > 0 && got("manifest_missing_chunks") > 0 &&
      got("duplicate_chunks") > 0, s"core planted corruptions must fire: $got")
  }

  test("lake_fsck: a healthy synthetic universe is all-zero through the same static algebra") {
    val d = GraftSession.table(spark, sf, "documents")
    val P = LakeParams(inlineMax = 64, chunkMax = 256, nBuckets = 64)
    val blobs = d.groupBy(sha2(col("text"), 256).as("blob_hash"))
      .agg(max(col("text")).as("text"),
        max(octet_length(col("text"))).cast(LongType).as("total_len"))
      .withColumn("kind", ChunkStore.kindOf(col("total_len"), P))
    val cat = blobs.select(col("blob_hash"), col("kind"), col("total_len"),
      when(col("kind") === "inline", col("text").cast(BinaryType))
        .otherwise(lit(null).cast(BinaryType)).as("inline_data"),
      when(col("kind") =!= "inline", sha2(expr("substring(text, 1, 256)"), 256))
        .otherwise(lit(null).cast(StringType)).as("root_hash"))
    val manifest = blobs.filter(col("kind") =!= "inline")
      .withColumn("part_idx",
        explode(sequence(lit(0L), expr("(total_len + 255) DIV 256") - 1)))
      .withColumn("part", expr("substring(text, cast(part_idx * 256 + 1 as int), 256)"))
      .select(col("blob_hash"), lit(0).as("level"), col("part_idx"),
        octet_length(col("part")).cast(LongType).as("part_len"),
        sha2(col("part"), 256).as("chunk_hash"))
    val chunks = manifest.select(col("chunk_hash")).distinct()
    val rep = ChunkStore.fsckReport(manifest, chunks, cat).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep.size == 9 && rep.values.forall(_ == 0L), s"healthy universe must be all-zero: $rep")
  }

  // --------------------------------------------------- lake_tree_get

  test("lake_tree_get: tree walk verifies, payloads match recomputation, trees are deep") {
    val got = LakeOps.lakeTreeGet(spark, sf).collect()
    assert(got.length == 3, "three point reads")
    assert(got.forall(_.getBoolean(2)), "verify-on-read must pass for every walked blob")
    val raw = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = raw.groupBy(_._1 % 8).collect { case (g, rows) if Set(0L, 3L, 6L)(g) =>
      val data = rows.sortBy(_._1).map(_._2).mkString("\n")
      sha256hex(data) -> data.length.toLong
    }.toMap
    assert(got.map(r => r.getString(0) -> r.getLong(1)).toMap == want,
      "reassembled payloads must hash- and length-match the recomputed group texts")
    // every demo blob took the tree path, at depth >= 2 (the walk the
    // query exists to time)
    val store = LakeOps.treeStore(spark, sf)
    val kinds = store.catalog.groupBy(col("kind")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kinds.keySet == Set("tree") && kinds("tree") == 8L, s"all 8 demo blobs are trees: $kinds")
    val minDepth = store.catalog.agg(min(col("tree_depth"))).head().getInt(0)
    assert(minDepth >= 2, s"walk must be at least two levels deep, got $minDepth")
  }

  test("lake_scrub: healthy store all-zero; planted bit-rot/misfile/truncation/null each land in their own counter") {
    val named = LakeOps.lakeScrub(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(named("scanned_chunks") > 0, "scrub must actually scan the tree store")
    assert(Seq("payload_hash_mismatch", "size_mismatch", "misplaced_bucket", "missing_payload")
      .forall(named(_) == 0L), s"healthy tree store must scrub clean: $named")

    // plant one corruption per invariant in a scratch store's chunk table
    val dir = java.nio.file.Files.createTempDirectory("graft-scrub").toString
    val store = ChunkStore.init(spark, dir)
    import spark.implicits._
    store.putBlobs(Seq((java.util.UUID.nameUUIDFromBytes("scrub".getBytes).toString * 60)
      .getBytes("UTF-8")).toDF("data"))
    val rows = store.chunks.collect()
    assert(rows.length >= 4, s"need >= 4 chunks to plant 4 distinct corruptions, got ${rows.length}")
    val mutated = rows.zipWithIndex.map { case (r, i) =>
      var sz = r.getLong(1)
      var data = r.getAs[Array[Byte]](3)
      var b = r.getInt(4)
      if (i == 0) { data = data.clone(); data(0) = (data(0) ^ 0x7f).toByte } // bit rot
      else if (i == 1) sz += 1                                              // truncation record
      else if (i == 2) b = (b + 1) % 64                                     // misfiled
      else if (i == 3) data = null                                          // lost cell
      (r.getString(0), sz, r.getString(2), data, b)
    }.toSeq
    mutated.toDF("chunk_hash", "size", "enc", "data", "bucket")
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$dir/chunks")
    val broken = store.scrub().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(broken("payload_hash_mismatch") == 1L, s"bit flip: $broken")
    assert(broken("size_mismatch") == 1L, s"size: $broken")
    assert(broken("misplaced_bucket") == 1L, s"misfile: $broken")
    assert(broken("missing_payload") == 1L, s"null cell: $broken")
    assert(broken("scanned_chunks") == rows.length.toLong)
  }

  test("lake_tree_get: every chunk read during the walk is a bucket-pruned scan") {
    val plans = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        plans.add(qe.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val store = LakeOps.treeStore(spark, sf)
      val oneHash = LakeOps.lakeTreeGet(spark, sf).collect().head.getString(0)
      store.getBlobsByHashes(Seq(oneHash)).collect(): Unit
      // listener delivery is async: poll for a pruned tree-store chunk
      // scan instead of racing the bus
      def prunedScanSeen: Boolean = {
        // snapshot under the list's own lock: the listener bus appends
        // concurrently and synchronizedList does NOT cover iteration
        val snapshot = plans.synchronized(plans.toArray(Array.empty[String])).toSeq
        snapshot.exists { p =>
          val ls = p.linesIterator.toVector
          ls.zipWithIndex.exists { case (l, i) =>
            l.contains("PartitionFilters") && l.contains("bucket") &&
              !l.matches(".*PartitionFilters: \\[\\s*\\].*") &&
              ls.take(i).reverse.find(_.contains("Location")).exists(_.contains("tree_store"))
          }
        }
      }
      val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
      while (!prunedScanSeen && System.nanoTime() < deadline) Thread.sleep(100)
      assert(prunedScanSeen,
        "expected at least one tree-store chunk scan with a literal bucket PartitionFilter")
    } finally spark.listenerManager.unregister(listener)
  }
}
