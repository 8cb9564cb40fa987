package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.lake._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LakeSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tmp(): String = Files.createTempDirectory("graft-lake").toString

  private def blobDf(blobs: (Long, String)*) =
    blobs.toSeq.toDF("blob_id", "s").select(col("blob_id"), col("s").cast("binary").as("data"))

  private val tiny = "short blob" // inline (≤64)
  private val mid = "m" * 200 // single chunk
  private val big = ("the quick brown fox " * 40).trim // tree (800 B → 4 parts)

  test("put/get roundtrip across the whole size ladder") {
    val store = ChunkStore.init(spark, tmp())
    val res = store.putBlobs(blobDf(1L -> tiny, 2L -> mid, 3L -> big))
    assert(res.blobs.map(_.kind).sorted == Seq("inline", "single", "tree"))
    res.blobs.foreach { b =>
      val back = new String(store.getBlob(b.blobHash), StandardCharsets.UTF_8)
      assert(Set(tiny, mid, big).contains(back), s"roundtrip failed for ${b.kind}")
      assert(back.length.toLong == b.totalLen)
    }
  }

  test("compact: many small puts collapse to few files, contents and fsck intact") {
    val store = ChunkStore.init(spark, tmp())
    val payloads = (1L to 8L).map(i => i -> (s"payload-$i-" + ("z" * 300)))
    payloads.foreach { case (i, s) => store.putBlobs(blobDf(i -> s)) } // 8 separate appends
    val hashes = store.catalog.select("blob_hash").as[String].collect().toSeq
    val report = store.compact().collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    report.foreach { case (t, (before, after)) =>
      assert(after < before, s"$t: $before -> $after files")
    }
    // contents untouched: every blob still roundtrips, audit stays clean
    payloads.foreach { case (i, s) =>
      val h = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes(StandardCharsets.UTF_8)).map("%02x".format(_)).mkString
      assert(hashes.contains(h))
      assert(new String(store.getBlob(h), StandardCharsets.UTF_8) == s)
    }
    assert(store.fsck().filter(col("violations") > 0).count() == 0)
  }

  test("crash-safe swap: interrupted gc/compact recovers without data loss") {
    val dir = tmp()
    val store = ChunkStore.init(spark, dir)
    val payloads = (1L to 4L).map(i => i -> (s"crash-$i-" + ("y" * 300)))
    payloads.foreach { case (i, s) => store.putBlobs(blobDf(i -> s)) }
    val hashes = store.catalog.select("blob_hash").as[String].collect().toSeq
    def assertIntact(s: ChunkStore): Unit = {
      assert(s.catalog.count() == 4)
      payloads.foreach { case (_, p) =>
        val h = java.security.MessageDigest.getInstance("SHA-256")
          .digest(p.getBytes(StandardCharsets.UTF_8)).map("%02x".format(_)).mkString
        assert(new String(s.getBlob(h), StandardCharsets.UTF_8) == p)
      }
      assert(s.fsck().filter(col("violations") > 0).count() == 0)
    }

    // crash AFTER commit, mid-swap: chunks moved aside but tmp copy not
    // yet renamed in — the worst case the old delete-then-rename
    // protocol turned into silent truncation on the next run
    val root = Paths.get(dir)
    def simulateCommittedCrash(): Unit = {
      Files.createDirectory(root.resolve(".compact_tmp"))
      Files.createFile(root.resolve(".compact_tmp/_COMMIT"))
      // tmp "rewrite" = byte-identical copy of the live tables
      Seq("chunks", "manifest", "catalog").foreach { t =>
        val src = root.resolve(t)
        val dst = root.resolve(s".compact_tmp/$t")
        Files.walk(src).forEach { p =>
          val q = dst.resolve(src.relativize(p))
          if (Files.isDirectory(p)) Files.createDirectories(q) else Files.copy(p, q)
        }
      }
      // the crash point: live chunks renamed aside, nothing renamed in
      Files.move(root.resolve("chunks"), root.resolve("chunks.old"))
    }
    simulateCommittedCrash()
    assertIntact(ChunkStore.load(spark, dir, readonly = false)) // load-time roll-forward
    assert(!Files.exists(root.resolve(".compact_tmp")) && !Files.exists(root.resolve("chunks.old")))

    // crash BEFORE commit: tmp is an incomplete rewrite → rolled back,
    // live tables untouched
    Files.createDirectory(root.resolve(".gc_tmp"))
    Files.createDirectory(root.resolve(".gc_tmp/chunks")) // partial debris, no _COMMIT
    assertIntact(ChunkStore.load(spark, dir, readonly = false))
    assert(!Files.exists(root.resolve(".gc_tmp")))
    assert(hashes.toSet == ChunkStore.load(spark, dir, readonly = false)
      .catalog.select("blob_hash").as[String].collect().toSet)
  }

  test("idempotent put: same content twice stores chunks once") {
    val store = ChunkStore.init(spark, tmp())
    store.putBlobs(blobDf(1L -> big))
    val n1 = store.chunks.count()
    store.putBlobs(blobDf(9L -> big))
    assert(store.chunks.count() == n1, "re-put must not add chunks")
    assert(store.catalog.count() == 1)
  }

  test("shared chunks dedup across different blobs (through convergent encryption)") {
    val store = ChunkStore.init(spark, tmp())
    // two blobs sharing their first 256-byte part; convergent encryption
    // must keep the shared part's ciphertext identical → stored once
    val shared = "x" * 256
    store.putBlobs(blobDf(1L -> (shared + "tailA" * 20), 2L -> (shared + "tailB" * 20)))
    val hashes = store.chunks.select("chunk_hash").as[String].collect()
    assert(hashes.length == hashes.distinct.length)
    assert(store.manifest.filter(col("level") === 0).count() == 4, "2 blobs × 2 parts")
    assert(store.manifest.filter(col("level") === 1).count() == 2, "one manifest node per tree blob")
    assert(store.chunks.filter(col("data").isNotNull).count() == 5, "3 unique parts + 2 tree nodes")
  }

  test("chunks are encrypted at rest; keys decrypt them; raw fallback for incompressible parts") {
    val store = ChunkStore.init(spark, tmp())
    val compressible = "repeat me " * 30 // 300 B of text → deflate+GCM < raw
    val rnd = new scala.util.Random(42)
    val incompressible = Array.fill[Byte](300)(rnd.nextInt().toByte) // random bytes grow under deflate+GCM
    store.putBlobs(
      Seq((1L, compressible.getBytes(StandardCharsets.UTF_8)), (2L, incompressible))
        .toDF("blob_id", "data"),
    )
    val encRows = store.chunks.filter(col("enc") === "gcm")
    val rawRows = store.chunks.filter(col("enc") === "raw")
    assert(encRows.count() > 0, "compressible parts must be stored encrypted")
    assert(rawRows.count() > 0, "incompressible parts must fall back to raw")
    // ciphertext at rest: no stored gcm payload equals any plaintext part
    val plainParts = Set(compressible.substring(0, 256), compressible.substring(256))
    encRows.select("data").as[Array[Byte]].collect().foreach { d =>
      assert(!plainParts.contains(new String(d, StandardCharsets.UTF_8)), "plaintext at rest")
    }
    // and the manifest key decrypts back to the plaintext part
    val dec = store.manifest
      .filter(col("level") === 0 && col("key").isNotNull)
      .join(store.chunks.filter(col("enc") === "gcm"), Seq("chunk_hash", "bucket"))
      .select(Convergent.decryptDeflated(col("data"), unhex(col("key"))).cast("string").as("part"))
      .as[String].collect()
    assert(dec.nonEmpty && dec.forall(p => compressible.contains(p)))
    // both roundtrip
    val hashes = store.catalog.select("blob_hash").as[String].collect()
    hashes.foreach(h => assert(store.getBlob(h).nonEmpty))
  }

  test("recursive manifest: many-part blob builds a multi-level tree and roundtrips") {
    val p = LakeParams(inlineMax = 4, chunkMax = 8, treeFanout = 4)
    val store = ChunkStore.init(spark, tmp(), params = p)
    // 600 B → 75 parts → fanout 4: 75 → 19 → 5 → 2 → 1 = depth 4
    val payload = (0 until 75).map(i => f"part$i%04d").mkString
    val res = store.putBlobs(blobDf(1L -> payload))
    val h = res.blobs.head.blobHash
    val depth = store.catalog.select("tree_depth").as[Int].head()
    assert(depth >= 2, s"expected a multi-level tree, got depth $depth")
    assert(store.manifest.filter(col("level") === 2).count() > 0)
    assert(new String(store.getBlob(h), StandardCharsets.UTF_8) == payload)
    // bulk path agrees with the tree path
    val bulk = store.getBlobs(Seq(h).toDF("blob_hash")).select("data").as[Array[Byte]].head()
    assert(new String(bulk, StandardCharsets.UTF_8) == payload)
  }

  test("fsck: healthy store is all-zero; corruption is detected") {
    val store = ChunkStore.init(spark, tmp())
    store.putBlobs(blobDf(1L -> tiny, 2L -> mid, 3L -> big))
    val healthy = store.fsck().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(healthy.values.forall(_ == 0L), s"healthy store reported: $healthy")
    // corrupt: delete the chunks dir → every manifest row dangles
    val chunksPath = Paths.get(store.path, "chunks")
    Files.walk(chunksPath).sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]()).forEach(f => Files.delete(f))
    val broken = store.fsck().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(broken("manifest_missing_chunks") > 0)
  }

  test("fsck: under-recorded tree_depth is surfaced even though the read path tolerates it") {
    val store = ChunkStore.init(spark, tmp())
    val h = store.putBlobs(blobDf(1L -> big)).blobs.head.blobHash
    // corrupt the catalog in place: record the tree one level shallower
    // than it is — exactly the class the depth-bounded walk degrades on
    val rows = store.catalog.collect().toIndexedSeq.map { r =>
      val d = r.getInt(r.fieldIndex("tree_depth"))
      org.apache.spark.sql.Row(r(0), r(1), r(2), r(3), r(4), r(5), r(6), math.max(0, d - 1))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows), ChunkStore.catalogSchema)
      .write.mode("overwrite").parquet(s"${store.path}/catalog")
    val reloaded = ChunkStore.load(spark, store.path, readonly = false)
    val rep = reloaded.fsck().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep("catalog_tree_depth_mismatch") == 1, s"depth mismatch must be flagged: $rep")
    assert(rep.count(_._2 > 0) == 1, s"only the depth check may fire: $rep")
    // availability wins on the read path: the depth-agnostic fallback
    // walk still reconstructs the blob the audit just flagged
    assert(new String(reloaded.getBlob(h), StandardCharsets.UTF_8) == big)
  }

  test("delete + gc: tombstone hides the blob, gc reclaims unique chunks, shared chunks survive") {
    val store = ChunkStore.init(spark, tmp())
    val shared = "x" * 256
    val a = shared + ("tailA" * 20)
    val b = shared + ("tailB" * 20)
    val ha = store.putBlobs(blobDf(1L -> a)).blobs.head.blobHash
    val hb = store.putBlobs(blobDf(2L -> b)).blobs.head.blobHash
    val chunksBefore = store.chunks.count()

    assert(store.deleteBlobs(Seq(ha)) == 1)
    assert(store.deleteBlobs(Seq(ha)) == 0, "tombstoning is idempotent")
    intercept[BlobNotFoundException] { store.getBlob(ha) }
    assert(!store.containsBlob(ha) && store.containsBlob(hb))
    assert(new String(store.getBlob(hb), StandardCharsets.UTF_8) == b, "sibling blob unaffected by tombstone")

    val stats = store.gc().collect().head
    assert(stats.getAs[Long]("blobs_deleted") == 1)
    // a's unique tail part + a's manifest node go; the shared first
    // part must survive (b's manifest still references it)
    assert(stats.getAs[Long]("chunks_reclaimed") == 2, s"reclaimed ${stats.getAs[Long]("chunks_reclaimed")}")
    assert(store.chunks.count() == chunksBefore - 2)
    assert(store.tombstones.count() == 0, "gc clears tombstones")
    assert(new String(store.getBlob(hb), StandardCharsets.UTF_8) == b, "sibling blob survives gc")
    val fsckAfter = store.fsck().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fsckAfter.values.forall(_ == 0L), s"gc left inconsistencies: $fsckAfter")

    // deleted content can be re-put and read again
    store.putBlobs(blobDf(3L -> a))
    assert(new String(store.getBlob(ha), StandardCharsets.UTF_8) == a)
  }

  test("write lock: concurrent writer is refused, stale lock is taken over, put releases") {
    val store = ChunkStore.init(spark, tmp())
    val lock = Paths.get(store.path, "_GRAFT_WRITE_LOCK")
    // a fresh foreign lock refuses the put
    Files.write(lock, "pid=9999 ts=now".getBytes(StandardCharsets.UTF_8))
    intercept[StoreLockedException] { store.putBlobs(blobDf(1L -> tiny)) }
    // a stale lock (crashed writer) is taken over
    Files.setLastModifiedTime(
      lock,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis() - ChunkStore.LockTtlMs - 1000),
    )
    store.putBlobs(blobDf(1L -> tiny))
    assert(store.catalog.count() == 1)
    // and a successful put releases the lock
    assert(!Files.exists(lock))
  }

  test("readonly store rejects writes") {
    val p = tmp()
    ChunkStore.init(spark, p)
    val ro = ChunkStore.load(spark, p, readonly = true)
    intercept[StoreReadOnlyException](ro.putBlobs(blobDf(1L -> mid)))
  }

  test("magic verification rejects non-store dirs and corrupted markers") {
    val p = tmp()
    intercept[InvalidMagicException](ChunkStore.load(spark, p, readonly = false))
    Files.write(Paths.get(p, "_GRAFT_STORE"), "not the magic".getBytes)
    intercept[InvalidMagicException](ChunkStore.load(spark, p, readonly = false))
  }

  test("capacity: put exceeding maxBytes raises OutOfSpace before writing") {
    val store = ChunkStore.init(spark, tmp(), maxBytes = 100)
    intercept[StoreOutOfSpaceException](store.putBlobs(blobDf(1L -> big)))
    assert(store.chunks.count() == 0, "failed put must not leave partial chunks")
  }

  test("lake routes puts past full stores (spill-over) and reads across stores") {
    val (p1, p2) = (tmp(), tmp())
    val cfg = LakeConfig(Seq(StoreEntry(p1, maxBytes = 300), StoreEntry(p2)))
    val lake = Lake.init(spark, cfg)
    // fills p1 (200 B mid fits; big 800 B spills to p2)
    val r1 = lake.put(blobDf(1L -> mid))
    val r2 = lake.put(blobDf(2L -> big))
    assert(lake.stores(0).containsBlob(r1.blobs.head.blobHash))
    assert(!lake.stores(0).containsBlob(r2.blobs.head.blobHash))
    assert(lake.stores(1).containsBlob(r2.blobs.head.blobHash))
    // fallback read finds both wherever they live
    assert(new String(lake.getBlob(r1.blobs.head.blobHash), StandardCharsets.UTF_8) == mid)
    assert(new String(lake.getBlob(r2.blobs.head.blobHash), StandardCharsets.UTF_8) == big)
    // bulk get across stores
    val got = lake.get(Seq(r1.blobs.head.blobHash, r2.blobs.head.blobHash).toDF("blob_hash"))
    assert(got.count() == 2)
    assert(got.filter(!col("verified")).count() == 0)
  }

  test("lake with no writable store raises LakeOutOfStores") {
    val p = tmp()
    ChunkStore.init(spark, p)
    val lake = Lake.init(spark, LakeConfig(Seq(StoreEntry(p, readonly = true))))
    intercept[LakeOutOfStoresException](lake.put(blobDf(1L -> mid)))
  }

  test("config TOML round-trip preserves entries") {
    val cfg = LakeConfig(Seq(StoreEntry("/a", readonly = true), StoreEntry("/b", maxBytes = 12345)))
    val back = LakeConfig.fromToml(cfg.toToml)
    assert(back == cfg)
  }

  test("convergent encryption is deterministic (same content → same ciphertext)") {
    val df = Seq("payload one", "payload one", "payload two")
      .toDF("s")
      .select(lake.Convergent.encrypt(col("s")).as("ct"))
    val cts = df.select(hex(col("ct"))).as[String].collect()
    assert(cts(0) == cts(1), "equal plaintexts must encrypt identically")
    assert(cts(0) != cts(2))
  }

  test("putBlobsDf: collect-free put returns the distributed summary") {
    val store = ChunkStore.init(spark, tmp())
    val out = store.putBlobsDf(blobDf(1L -> tiny, 2L -> big))
    assert(out.count() == 2)
    val kinds = out.select("kind").as[String].collect().sorted
    assert(kinds.sameElements(Array("inline", "tree")))
    // idempotent like putBlobs
    assert(store.putBlobsDf(blobDf(3L -> big)).count() == 1)
    assert(store.catalog.count() == 2)
  }

  test("file ingest: whole files land content-addressed and read back identical") {
    val dataDir = Files.createTempDirectory("graft-ingest")
    val f1 = dataDir.resolve("a.bin"); Files.write(f1, ("file one " * 40).getBytes)
    val f2 = dataDir.resolve("b.bin"); Files.write(f2, "tiny".getBytes)
    val lake = Lake.init(spark, LakeConfig(Seq(StoreEntry(tmp()))))
    val (res, mapping) = sources.Ingest.ingestFiles(lake, dataDir.toString + "/*.bin")
    assert(res.blobs.size == 2)
    val m = mapping.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m.size == 2)
    m.foreach { case (path, hash) =>
      val orig = Files.readAllBytes(Paths.get(path.stripPrefix("file:")))
      assert(java.util.Arrays.equals(lake.getBlob(hash), orig), s"roundtrip $path")
    }
  }

  test("readAuto/writeAuto roundtrip csv and json with schema intact") {
    val base = Files.createTempDirectory("graft-fmt").toString
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", -2.25)).toDF("id", "name", "score")
    for (ext <- Seq("csv", "json")) {
      val p = s"$base/t.$ext"
      sources.Ingest.writeAuto(df, p)
      val back = sources.Ingest.readAuto(spark, p).orderBy("id")
      assert(back.count() == 2)
      val r = back.collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("name"), r.getAs[Double]("score")))
      assert(r.toSeq == Seq((1L, "alpha", 1.5), (2L, "beta", -2.25)), s"$ext roundtrip")
    }
  }

  test("catalog: lake views registered and describable") {
    val lake = Lake.init(spark, LakeConfig(Seq(StoreEntry(tmp()), StoreEntry(tmp(), readonly = false))))
    lake.put(blobDf(1L -> big))
    LakeCatalog.register(lake, "lakespec")
    val tables = LakeCatalog.lakeTables(spark, "lakespec")
    assert(tables.contains("lakespec_chunks") && tables.contains("lakespec_s1_catalog"), tables.mkString(","))
    assert(spark.sql("SELECT count(*) FROM lakespec_chunks").head.getLong(0) > 0)
    val d = LakeCatalog.describe(lake).collect()
    assert(d.length == 2)
    assert(d.map(_.getAs[Long]("n_blobs")).sum == 1)
  }

  test("replicateTo: missing blobs copy by content address, shared chunks dedup, idempotent") {
    val a = ChunkStore.init(spark, tmp())
    val b = ChunkStore.init(spark, tmp())
    a.putBlobs(blobDf(1L -> tiny, 2L -> mid, 3L -> big))
    b.putBlobs(blobDf(1L -> mid)) // overlap: `mid` already present in target
    assert(a.diff(b).filter(col("status") === "only_here").count() == 2)

    val copied = a.replicateTo(b)
    assert(copied == 2, s"expected 2 missing blobs copied, got $copied")
    // every blob now reads back from the target byte-identically
    Seq(tiny, mid, big).foreach { s =>
      val h = a.catalog.filter(col("total_len") === s.length).select("blob_hash").as[String].head()
      assert(new String(b.getBlob(h), StandardCharsets.UTF_8) == s)
    }
    // fully in sync, target store healthy, no duplicated chunk rows
    assert(a.diff(b).filter(col("status") =!= "in_sync").count() == 0)
    assert(b.fsck().filter(col("violations") > 0).count() == 0)
    // idempotent: nothing left to copy, chunk count stable
    val chunksBefore = b.chunks.count()
    assert(a.replicateTo(b) == 0)
    assert(b.chunks.count() == chunksBefore)
  }

  test("replicateTo and diff respect tombstones: deletes do not resurrect") {
    val a = ChunkStore.init(spark, tmp())
    a.putBlobs(blobDf(1L -> tiny, 2L -> mid, 3L -> big))
    val delHash = a.catalog.filter(col("total_len") === mid.length).select("blob_hash").as[String].head()
    assert(a.deleteBlobs(Seq(delHash)) == 1)

    // fresh-target replicate ships only the live blobs
    val b = ChunkStore.init(spark, tmp())
    assert(a.replicateTo(b) == 2, "tombstoned blob must not replicate")
    assert(!b.containsBlob(delHash), "deleted blob resurrected in replica")
    assert(a.diff(b).filter(col("status") =!= "in_sync").count() == 0)

    // target that already holds the blob live: diff reports only_other
    // (live views), and replicate does not push the delete
    val c = ChunkStore.init(spark, tmp())
    c.putBlobs(blobDf(2L -> mid))
    assert(a.diff(c).filter(col("blob_hash") === delHash)
      .select("status").as[String].head() == "only_other")
    a.replicateTo(c)
    assert(c.containsBlob(delHash), "replicate is additive, not a delete-sync")

    // target that tombstoned the blob itself: replicate must not
    // resurrect it there (anti-join keys on the raw target catalog)
    val d = ChunkStore.init(spark, tmp())
    d.putBlobs(blobDf(2L -> mid))
    d.deleteBlobs(Seq(delHash))
    val a2 = ChunkStore.init(spark, tmp())
    a2.putBlobs(blobDf(2L -> mid))
    assert(a2.replicateTo(d) == 0)
    assert(!d.containsBlob(delHash), "target's own delete must stay deleted")
  }

  test("replicateTo honors the target capacity gate and readonly flag") {
    val a = ChunkStore.init(spark, tmp())
    a.putBlobs(blobDf(1L -> big))
    val small = ChunkStore.init(spark, tmp(), maxBytes = 100L)
    intercept[StoreOutOfSpaceException](a.replicateTo(small))
    assert(small.catalog.count() == 0, "failed replicate must not leave catalog rows")
    val roDir = tmp()
    ChunkStore.init(spark, roDir)
    val ro = ChunkStore.load(spark, roDir, readonly = true)
    intercept[StoreReadOnlyException](a.replicateTo(ro))
  }

  test("bucket pruning: chunk reads filter to the hash-prefix partition") {
    val store = ChunkStore.init(spark, tmp())
    store.putBlobs(blobDf(1L -> big, 2L -> (mid + big)))
    val buckets = store.chunks.select("bucket").distinct().as[Int].collect()
    assert(buckets.nonEmpty && buckets.forall(b => b >= 0 && b < 64))
    // partition layout on disk: chunks/bucket=N/
    val dirs = Files.list(Paths.get(store.path, "chunks")).toArray.map(_.toString)
    assert(dirs.exists(_.contains("bucket=")), dirs.mkString(","))
  }
}
