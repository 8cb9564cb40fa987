package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.lake.{ChunkStore, Convergent, LakeParams}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests over generated inputs (deterministic seeds).
  * scalacheck supplies the generators; sampling is explicit so each
  * property runs as one Spark job over the whole generated batch
  * instead of a job per case.
  */
class PropertySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("WordNgrams equals the HOF formulation on arbitrary word arrays") {
    val wordGen = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val gen = for {
      n <- Gen.chooseNum(0, 30)
      ws <- Gen.listOfN(n, wordGen)
    } yield ws.mkString(" ")
    val texts = sample(gen, 300, seed = 3L)
    for (n <- Seq(1, 2, 5)) {
      val ws = split(col("text"), " ")
      val hof = when(
        size(ws) >= n,
        transform(sequence(lit(0), size(ws) - n), i => concat_ws(" ", slice(ws, i + 1, lit(n)))),
      ).otherwise(array(col("text")))
      val bad = texts.toDF("text")
        .select(col("text"), graft.functions.ArrayExprs.wordNgrams(ws, n).as("fast"), hof.as("slow"))
        .filter(col("fast") =!= col("slow"))
        .collect()
      assert(bad.isEmpty, s"n=$n diverged on: ${bad.take(3).mkString("; ")}")
    }
  }

  test("chunk store roundtrips arbitrary binary blobs across the whole ladder") {
    val gen = for {
      n <- Gen.chooseNum(0, 2048)
      bytes <- Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield bytes
    val blobs = sample(gen, 40, seed = 1L).filter(_.nonEmpty)
    val store = ChunkStore.init(spark, Files.createTempDirectory("graft-prop").toString)
    val df = blobs.zipWithIndex.map { case (b, i) => (i.toLong, b) }.toDF("blob_id", "data")
    val res = store.putBlobs(df)
    // every distinct input must come back byte-identical under its hash
    val got = store.getBlobs(res.blobs.map(_.blobHash).toDF("blob_hash")).collect()
    assert(got.length == res.blobs.size)
    got.foreach(r => assert(r.getAs[Boolean]("verified"), "hash verify must hold"))
    val byHash = got.map(r => r.getAs[String]("blob_hash") -> r.getAs[Array[Byte]]("data")).toMap
    blobs.foreach { b =>
      val h = java.security.MessageDigest.getInstance("SHA-256").digest(b)
        .map("%02x".format(_)).mkString
      assert(byHash.contains(h), "blob missing from store")
      assert(java.util.Arrays.equals(byHash(h), b), "payload corrupted in roundtrip")
    }
  }

  test("10k-part blob roundtrips through a multi-level manifest tree in linear time") {
    // 48 KiB blob at chunkMax=4 → 12288 parts → fanout 64: 12288 → 192
    // → 3 → 1 = 3 tree levels. Pins BOTH the recursive manifest and the
    // single-allocation reassembly kernel (the old aggregate(concat)
    // HOF was O(parts²) and took minutes at this part count).
    val p = LakeParams(inlineMax = 2, chunkMax = 4, nBuckets = 64, treeFanout = 64)
    val store = ChunkStore.init(spark, Files.createTempDirectory("graft-tree").toString, params = p)
    val payload = new Array[Byte](48 * 1024)
    new scala.util.Random(11).nextBytes(payload)
    val res = store.putBlobs(Seq((1L, payload)).toDF("blob_id", "data"))
    val h = res.blobs.head.blobHash
    assert(store.manifest.filter(col("level") === 0).count() == 12288)
    assert(store.catalog.select("tree_depth").as[Int].head() == 3)
    assert(store.manifest.filter(col("level") === 3).count() == 1, "single root node")
    // tree-walk get and bulk get both reproduce the exact bytes
    assert(java.util.Arrays.equals(store.getBlob(h), payload))
    val bulk = store.getBlobs(Seq(h).toDF("blob_hash"))
    assert(bulk.filter(col("verified")).count() == 1)
    assert(java.util.Arrays.equals(bulk.select("data").as[Array[Byte]].head(), payload))
  }

  test("ladder kinds partition by length exactly at the configured bounds") {
    val p = LakeParams()
    val lens = Seq(0, 1, 63, 64, 65, 255, 256, 257, 1000)
    val df = lens.map(n => ("x" * n)).toDF("s")
      .select(octet_length(col("s")).cast("long").as("len"), ChunkStore.kindOf(octet_length(col("s")).cast("long"), p).as("kind"))
    val kinds = df.as[(Long, String)].collect().toMap
    lens.foreach { n =>
      val expect = if (n <= 64) "inline" else if (n <= 256) "single" else "tree"
      assert(kinds(n.toLong) == expect, s"len $n")
    }
  }

  test("convergent encryption: roundtrip + determinism + key-sensitivity on random strings") {
    val gen = Gen.listOfN(30, Gen.alphaNumStr.suchThat(_.nonEmpty))
    val strs = sample(gen, 1, seed = 7L).head.distinct
    val df = strs.toDF("s").select(
      col("s"),
      Convergent.encrypt(col("s")).as("ct"),
      sha2(Convergent.decrypt(Convergent.encrypt(col("s")), Convergent.contentKey(col("s"))), 256).as("round_sha"),
      sha2(col("s"), 256).as("orig_sha"),
    )
    val rows = df.collect()
    rows.foreach { r =>
      assert(r.getAs[String]("round_sha") == r.getAs[String]("orig_sha"), "decrypt∘encrypt != id")
    }
    // determinism: re-encrypting yields identical ciphertext
    val cts1 = df.select(hex(col("ct"))).as[String].collect()
    val cts2 = strs.toDF("s").select(hex(Convergent.encrypt(col("s")))).as[String].collect()
    assert(cts1.sorted.sameElements(cts2.sorted))
    // distinct plaintexts → distinct ciphertexts
    assert(cts1.distinct.length == strs.length)
  }

  test("winnowing guarantee on generated word sequences: shared window ⇒ shared fingerprint") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta", "iota", "kappa")
    val gen = for {
      shared <- Gen.listOfN(8, word) // ≥ w + k - 1 = 6 tokens
      pre <- Gen.listOfN(5, word)
      post <- Gen.listOfN(5, word)
    } yield (s"${pre.mkString(" ")} ${shared.mkString(" ")}", s"${shared.mkString(" ")} ${post.mkString(" ")}")
    val pairsIn = sample(gen, 20, seed = 99L)
    val df = pairsIn.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }.toDF("id", "ta", "tb")
      .select(
        col("id"),
        graft.functions.Winnowing.fingerprints(col("ta")).as("fa"),
        graft.functions.Winnowing.fingerprints(col("tb")).as("fb"),
      )
      .withColumn("shared", size(array_intersect(col("fa"), col("fb"))))
    assert(df.filter(col("shared") === 0).count() == 0, "8 shared tokens must give a shared fingerprint")
  }

  test("minhash similarity estimates track exact jaccard on generated sets") {
    // signature agreement rate ≈ jaccard (Broder): check |est - exact| < 0.35
    // at 64 perms for pairs with varying overlap
    val base = (0 until 40).map(i => s"tok$i")
    val gen = for {
      keep <- Gen.chooseNum(10, 35)
      extra <- Gen.chooseNum(1, 15)
    } yield (base.take(keep + extra).toArray, base.slice(extra, keep + 2 * extra).toArray)
    val pairsIn = sample(gen, 25, seed = 5L)
    val df = pairsIn.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }.toDF("id", "sa", "sb")
    val sig = (c: String) => operators.Dedup.signature(col(c))
    val agree = df.select(
      col("id"),
      aggregate(zip_with(sig("sa"), sig("sb"), (x, y) => when(x === y, 1L).otherwise(0L)), lit(0L), (acc, x) => acc + x)
        .cast("double").divide(64.0).as("est"),
      (size(array_intersect(col("sa"), col("sb"))).cast("double") / size(array_union(col("sa"), col("sb")))).as("exact"),
    ).collect()
    agree.foreach { r =>
      val (e, x) = (r.getAs[Double]("est"), r.getAs[Double]("exact"))
      assert(math.abs(e - x) < 0.35, s"minhash estimate $e too far from exact $x")
    }
  }

  test("pageRank equals an exact driver-side integer replay on random graphs") {
    // the distributed join+agg iteration must reproduce the reference
    // integer recurrence exactly — any floor/overflow/ordering slip
    // shows up as a mass mismatch on some graph
    val rnd = new scala.util.Random(17)
    for (trial <- 1 to 3) {
      val n = 20 + trial * 15
      val raw = (0 until n * 3).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct
      // both directions so every node with an edge has out-degree >= 1
      val und = (raw ++ raw.map(_.swap)).distinct
      val got = operators.Graph.pageRank(und.toDF("src", "dst"), 4)
        .as[(Long, Long)].collect().toMap
      // exact replay in plain Scala
      val deg = und.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val incoming = und.groupBy(_._2)
      var mass = deg.keys.map(_ -> 1000000000000L).toMap
      for (_ <- 1 to 4) {
        mass = deg.keys.map { v =>
          val in = incoming.getOrElse(v, Seq.empty)
            .map { case (s, _) => (85L * mass(s) / 100L) / deg(s) }.sum
          v -> (150000000000L + in)
        }.toMap
      }
      assert(got == mass, s"trial $trial: distributed != replay (n=$n, edges=${und.size})")
    }
  }

  test("contracted connectedComponents equals plain union-find on random graphs incl. adversarial shapes") {
    // the r15 per-partition contraction must not change the fixpoint on
    // ANY graph shape: random sparse, long paths (the pointer-jumping
    // stressor), stars, and disconnected singleton-ish fragments
    val rnd = new scala.util.Random(23)
    def check(edges: Seq[(Long, Long)], label: String): Unit = {
      val und = (edges ++ edges.map(_.swap)).distinct
      val got = operators.Graph.connectedComponents(und.toDF("u", "v"))
        .as[(Long, Long)].collect().toMap
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
      und.foreach { case (a, b) =>
        parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val want = parent.keys.map(x => x -> find(x)).toMap
      assert(got == want, s"$label: contraction fixpoint != union-find (n=${want.size})")
    }
    for (trial <- 1 to 3) {
      val n = 25 + trial * 20
      check((0 until n * 2).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }.distinct, s"random-$trial")
    }
    // one long path spanning many partitions: the O(log diameter) case
    check((0L until 120L).map(i => (i, i + 1)), "path-120")
    // a star (hub can't break min-rooting) + far-away disjoint pairs
    check((1L to 40L).map(i => (0L, i)) ++ Seq((1000L, 1001L), (2000L, 2001L)), "star+fragments")
  }

  test("NearestCentroidPacked equals the greatest-struct argmax on random vectors and centroids") {
    // random int vectors + random centroid tables (incl. a duplicated
    // centroid under a larger cid and a zero centroid → ±Inf/NaN
    // cosines): pack/decode must reproduce the struct-ordering argmax
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 3) {
      val dims = 8 + trial * 4
      val k = 3 + trial * 2
      val cents0 = (0 until k).map { i =>
        val cv = Seq.fill(dims)((rnd.nextInt(2001) - 1000).toLong)
        (i, cv, math.sqrt(cv.map(x => x.toDouble * x).sum))
      }
      // duplicate centroid 0 under the LARGEST cid (tie → smaller wins).
      // Zero norms are EXCLUDED from the equality domain on purpose:
      // under ANSI SQL the struct formulation's double division THROWS
      // on a zero divisor, while the kernel degrades deterministically
      // (NaN-greatest pick, sim_ppm 0) — pinned separately below.
      val cents = cents0 :+ ((k, cents0.head._2, cents0.head._3))
      val vecs = (0 until 150).map { i =>
        (i.toLong, Seq.fill(dims)((rnd.nextInt(2001) - 1000).toLong))
      }
      val d = vecs.toDF("id", "qv")
        .withColumn("norm", sqrt(graft.functions.ArrayExprs.longDot(col("qv"), col("qv")).cast("double")))
      val viaKernel = d
        .withColumn("p", graft.functions.ArrayExprs.nearestCentroidPacked(col("qv"), col("norm"), cents))
        .select(col("id"), expr("p DIV 4000000").cast("int").as("cid"),
          (expr("p % 4000000") - 2000000L).as("ppm"))
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
      val scored = cents.map { case (cid, cv, cnorm) =>
        struct(
          (graft.functions.ArrayExprs.longDot(col("qv"), typedlit(cv)).cast("double") /
            (col("norm") * lit(cnorm))).as("cos"),
          lit(-cid.toLong).as("nid"))
      }
      val viaStructs = d
        .withColumn("m", greatest(scored: _*))
        .select(col("id"), (-col("m.nid")).cast("int").as("cid"),
          floor(col("m.cos") * 1000000 + 0.5).cast("long").as("ppm"))
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
      assert(viaKernel == viaStructs, s"trial $trial (dims=$dims, k=${cents.size})")
    }
    // zero-norm edge: the kernel must not throw (ANSI Divide would) and
    // must be deterministic — the all-NaN scan keeps the FIRST (lowest
    // cid) centroid and quantizes the undefined cosine to ppm 0
    val zCents = Seq((0, Seq(1L, 2L), math.sqrt(5.0)), (1, Seq(3L, 4L), 5.0))
    val z = Seq((0L, Seq(0L, 0L))).toDF("id", "qv")
      .withColumn("norm", sqrt(graft.functions.ArrayExprs.longDot(col("qv"), col("qv")).cast("double")))
      .withColumn("p", graft.functions.ArrayExprs.nearestCentroidPacked(col("qv"), col("norm"), zCents))
      .select(expr("p DIV 4000000").cast("int"), (expr("p % 4000000") - 2000000L))
      .collect().head
    assert(z.getInt(0) == 0 && z.getLong(1) == 0L, s"zero-norm edge: $z")
  }

  test("boruvkaMsf equals Kruskal on random graphs with duplicate weights") {
    // the per-component argmin + contraction rounds must land on the
    // exact forest Kruskal picks under the (w, u, v) total order —
    // duplicate weights force the lexicographic tie-break to carry,
    // multi-component graphs exercise the forest (not tree) case
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      val n = 15 + trial * 10
      val edges = (0 until n * 2)
        .map { _ =>
          val a = rnd.nextInt(n); val b = rnd.nextInt(n)
          (math.min(a, b).toLong, math.max(a, b).toLong, (rnd.nextInt(5) + 1).toLong)
        }
        .filter { case (u, v, _) => u != v }
        .groupBy { case (u, v, _) => (u, v) }
        .map { case (_, xs) => xs.minBy(_._3) } // one weight per edge
        .toSeq
      val got = operators.Graph.boruvkaMsf(edges.toDF("u", "v", "w"))
        .as[(Long, Long, Long)].collect().toSet
      // Kruskal replay under the identical total order
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      val want = edges.sortBy { case (u, v, w) => (w, u, v) }.flatMap { case (u, v, w) =>
        val (ru, rv) = (find(u), find(v))
        if (ru == rv) None else { parent(ru) = rv; Some((u, v, w)) }
      }.toSet
      assert(got == want, s"trial $trial: forest diverged (n=$n, edges=${edges.size})")
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.size
      val comps = nodes - want.size
      assert(comps >= 1 && got.size == nodes - comps)
    }
  }

  test("semDedup at 10k vectors: pair space stays bounded as numClusters scales, planted dups caught") {
    // SemDeDup's scaling claim: the quadratic term is per-cluster, so
    // with numClusters ∝ corpus size the within-cluster pair space is
    // ~n²/k, not n². 10k vectors in 40 planted directions, k=40.
    val dim = 64
    val nGroups = 40
    val perGroup = 250 // 10k total
    // well-separated unit directions: one-hot on coord g with
    // deterministic per-member jitter on the upper coords
    val rows = for (g <- 0 until nGroups; i <- 0 until perGroup) yield {
      val src = if (i % 50 == 1) i - 1 else i // every 50th pair: exact copy of predecessor
      val v = Array.fill(dim)(0.0)
      v(g) = 1.0
      v(40 + (g * 7 + src) % 24) += 0.04 + 0.0001 * src
      v(40 + (g * 13 + 3 * src) % 24) += 0.03
      (g * perGroup.toLong + i, v.toSeq)
    }
    val df = rows.toDF("id", "embedding").repartition(8)
    val out = operators.VectorOps.semDedup(df, nGroups, 0.99)
      .select("vec_id", "cluster_id", "dup_of", "is_semantic_dup")
      .as[(Long, Long, Option[Long], Boolean)].collect()
    assert(out.length == nGroups * perGroup)
    // bounded pair space: sum over clusters of n_c² must be far below
    // n² — the within-cluster join's actual row count
    val n = out.length.toDouble
    val pairSpace = out.groupBy(_._2).view.mapValues(_.length.toDouble).values.map(c => c * c).sum
    info(f"within-cluster pair space = ${pairSpace / (n * n)}%.4f of n²")
    assert(pairSpace <= n * n / 8.0,
      s"clustering degenerated: pair space $pairSpace vs n²=${n * n}")
    // every planted exact copy must be flagged against its predecessor
    // (the only lower-id cluster-mate at cosine exactly 1)
    val byId = out.map(r => r._1 -> r).toMap
    var nPlanted = 0
    for (g <- 0 until nGroups; i <- 0 until perGroup if i % 50 == 1 && i > 1) {
      nPlanted += 1
      val id = g * perGroup.toLong + i
      val (_, cid, dupOf, isDup) = byId(id)
      assert(cid == byId(id - 1)._2, s"identical vectors $id/${id - 1} split across clusters")
      assert(isDup, s"planted exact dup $id not flagged")
      assert(dupOf.contains(id - 1), s"planted dup $id: dup_of=$dupOf, expected ${id - 1}")
    }
    assert(nPlanted == nGroups * (perGroup / 50 - 1))
  }

  test("containment prefix filter is lossless at 5k docs: every planted subset pair found") {
    // 5k synthetic gram-set docs; every 25th doc is a planted subset
    // of its predecessor (90% of its grams) → containment ≥ 0.9 one
    // way. The prefix filter must recall ALL of them — losslessness
    // is a pigeonhole argument, so it has to survive scale-up and a
    // gram vocabulary (40k) far above any one doc's size.
    val rnd = new scala.util.Random(11)
    val docs = (0 until 5000).map { i =>
      if (i % 25 == 1) {
        null // filled below from predecessor
      } else {
        (i.toLong, Seq.fill(30 + rnd.nextInt(40))(s"g${rnd.nextInt(40000)}").distinct)
      }
    }.toArray
    for (i <- 0 until 5000 if i % 25 == 1) {
      val base = docs(i - 1)._2
      val keep = base.take(math.max(1, (base.size * 0.9).toInt))
      docs(i) = (i.toLong, keep)
    }
    val df = docs.toSeq.toDF("doc_id", "sh").repartition(8)
    val got = operators.Dedup.containmentPairs(df, 0.8).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    var planted = 0
    for (i <- 0 until 5000 if i % 25 == 1) {
      planted += 1
      assert(got((i.toLong, (i - 1).toLong)), s"planted subset pair ($i, ${i - 1}) missed")
    }
    assert(planted == 200)
    // sanity on the pair values: re-verify a planted pair's containment exactly
    val a = docs(26)._2.toSet; val b = docs(25)._2.toSet
    assert(a.intersect(b).size.toDouble / a.size >= 0.8)
  }

  test("gear CDC chunking: coverage and size bounds on random payloads") {
    val gen = for {
      n <- Gen.chooseNum(0, 4096)
      bytes <- Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue))
    } yield bytes
    val cdc = graft.functions.GearCdcChunks(null, 32, 6, 256)
    sample(gen, 200, seed = 41L).foreach { b =>
      val lens = cdc.chunkLengths(b).toIntArray()
      assert(lens.sum == b.length, "chunks must cover the payload exactly")
      lens.dropRight(1).foreach(l => assert(l >= 32 && l <= 256, s"interior chunk $l out of bounds"))
      if (lens.nonEmpty) assert(lens.last >= 1 && lens.last <= 256)
      // determinism
      assert(cdc.chunkLengths(b).toIntArray().toSeq == lens.toSeq)
    }
  }

  test("seqmine's first<last trick equals the exists-pair subsequence definition on random streams") {
    // a→b for a user ⟺ ∃ i<j with type(i)=a, type(j)=b — the operator
    // computes it as first_pos(a) < last_pos(b); prove the equivalence
    // on random small streams (incl. duplicates and self-patterns)
    val types = Seq("u", "v", "w", "x")
    val gen = for {
      n <- Gen.chooseNum(1, 12)
      ts <- Gen.listOfN(n, Gen.oneOf(types))
    } yield ts
    sample(gen, 400, seed = 77L).foreach { stream =>
      val idx = stream.zipWithIndex
      val brute = (for {
        (a, i) <- idx
        (b, j) <- idx
        if i < j
      } yield (a, b)).toSet
      val spans = idx.groupBy(_._1).map { case (t, occ) =>
        t -> (occ.map(_._2).min, occ.map(_._2).max)
      }
      // iterate Seq views: a for-yield over the Maps themselves would
      // rebuild a Map and collapse each a to a single b
      val trick = (for {
        (a, (fa, _)) <- spans.toSeq
        (b, (_, lb)) <- spans.toSeq
        if fa < lb
      } yield (a, b)).toSet
      assert(trick == brute, s"stream=$stream trick=$trick brute=$brute")
    }
  }

  test("block-parity phash: single byte flip moves at most one bit") {
    val gen = for {
      n <- Gen.chooseNum(62, 2048)
      bytes <- Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue))
      pos <- Gen.chooseNum(0, n - 1)
    } yield (bytes, pos)
    val ph = graft.functions.BlockParityHash(null)
    sample(gen, 200, seed = 42L).foreach { case (b, pos) =>
      val flipped = b.clone(); flipped(pos) = (flipped(pos) ^ 1).toByte
      val h = java.lang.Long.bitCount(ph.hashBytes(b) ^ ph.hashBytes(flipped))
      assert(h <= 1, s"single-byte flip moved $h bits")
    }
  }
}
