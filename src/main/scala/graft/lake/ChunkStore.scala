package graft.lake

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Errors mirroring the reference's DataLakeError variants
  * (error.rs:5-52), as exceptions since DataFrame pipelines are
  * eager-failing at action time anyway.
  */
final class StoreReadOnlyException(path: String)
    extends RuntimeException(s"store is read-only: $path")
final class StoreOutOfSpaceException(path: String)
    extends RuntimeException(s"store is out of space: $path")
final class StoreLockedException(path: String, holder: String)
    extends RuntimeException(s"store is locked by another writer ($holder): $path")
final class LakeOutOfStoresException extends RuntimeException("lake is out of writable stores")
final class InvalidMagicException(path: String)
    extends RuntimeException(s"not a graft store (bad magic): $path")
final class BlobNotFoundException(hash: String)
    extends RuntimeException(s"blob not found: $hash")

/** Size-ladder / layout parameters.
  *
  * The reference's ladder (store/mod.rs:430-457): raw-inline below
  * MAX_SIZE_RAW, single encrypted chunk below MAX_DECRYPTED_SIZE,
  * recursive chunk tree (LongHkey) above. `treeFanout` = manifest
  * entries per tree node (the analog of how many part keys fit in one
  * stored LongHkey blob). Defaults here are test-scale; production
  * would use e.g. (256, 1 MiB, 1024 buckets, 4096 fanout).
  */
final case class LakeParams(
    inlineMax: Long = 64L,
    chunkMax: Long = 256L,
    nBuckets: Int = 64,
    treeFanout: Int = 64,
) { require(treeFanout >= 2, "treeFanout must be >= 2") }

object LakeParams {
  /** Reference-parity sizing (helpers/sieve.rs:4 `get_le_prime`): the
    * bucket count derived as the largest prime at or below
    * `indexSize`, the rule the reference applies to its hash index.
    * Optional here — hash-prefix partitioning is uniform under any
    * modulus — but a user porting a reference config gets the same
    * bucket count they had.
    */
  def primeBuckets(indexSize: Int, base: LakeParams = LakeParams()): LakeParams =
    base.copy(nBuckets = Sieve.getLePrime(indexSize))
}

/** A content-addressed, convergently-encrypted chunk store
  * re-expressed Spark-first.
  *
  * Reference analog: one `DataStore` (store/mod.rs) — an mmap'd flat
  * file with a hash index and bump-allocated pages. Here instead:
  *
  *  - `chunks/` — parquet partitioned by `bucket` (the index-modulo
  *    analog, store/mod.rs:252-257): `get(hash)` prunes to a single
  *    hash-prefix partition instead of probing an index, which at
  *    100 TB means a 1/nBuckets partition read, and chunk writes
  *    distribute uniformly with no coordinator. Payloads are stored
  *    deflate-compressed + AES-GCM encrypted with a key derived from
  *    the plaintext (convergent; reference put_chunk → chunk.encrypt(),
  *    store/mod.rs:399-417), falling back to the raw bytes when the
  *    ciphertext would be larger (store/mod.rs:380-385). The chunk is
  *    addressed by the hash of what is actually stored, so dedup
  *    still works across writers (identical plaintext → identical
  *    ciphertext).
  *  - `manifest/` — the LongHkey tree, one row per (level, part):
  *    level 0 rows are data parts carrying the per-part decryption
  *    key (the reference's Hkey::Encrypted(hash, key)); level k > 0
  *    rows are manifest *nodes* — the manifest itself is chunked
  *    recursively in groups of `treeFanout` until a single root
  *    remains (LongHkeyExpanded::from_blob → shrink,
  *    store/mod.rs:419-426).
  *  - `catalog/` — one row per blob: hash, length, kind
  *    (inline|single|tree), inline payload for tiny blobs (the
  *    reference's raw Hkey, which embeds data in the key itself),
  *    and the tree root (hash, key, bucket, depth).
  *  - `_GRAFT_STORE` — the magic marker (store/mod.rs MAGIC +
  *    lake/util.rs verify_magic). All paths go through Hadoop's
  *    FileSystem, so hdfs:///s3a:// store dirs work like local ones.
  *
  * Write order is chunks → manifest → catalog: a blob becomes visible
  * only once fully written, so a failed-and-retried put (the normal
  * streaming foreachBatch failure mode) re-runs idempotently — chunk
  * appends are anti-joined away, and any manifest rows the failed
  * attempt left behind are deduplicated on read and surfaced by
  * [[fsck]]. Concurrent multi-writer atomicity (the reference's
  * single-writer mmap guard, store/atomic.rs) is out of scope for
  * plain parquet dirs; a table format (Iceberg/Delta) would supply it
  * without changing this class's dataflow.
  */
final class ChunkStore private (
    val spark: SparkSession,
    val path: String,
    val readonly: Boolean,
    val maxBytes: Long,
    val params: LakeParams,
) {
  import ChunkStore._

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def chunksDir = s"$path/chunks"
  private def manifestDir = s"$path/manifest"
  private def catalogDir = s"$path/catalog"
  private def tombstonesDir = s"$path/tombstones"

  private def emptyDf(schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  private def readOr(dir: String, schema: StructType): DataFrame = {
    val p = new HPath(dir)
    if (p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p))
      spark.read.schema(schema).parquet(dir)
    else emptyDf(schema)
  }

  def chunks: DataFrame = readOr(chunksDir, chunkSchema)
  def manifest: DataFrame = readOr(manifestDir, manifestSchema)
  def catalog: DataFrame = readOr(catalogDir, catalogSchema)
  def tombstones: DataFrame = readOr(tombstonesDir, tombstoneSchema)

  /** catalog minus tombstoned blobs — what readers see. Deletes are
    * two-phase (content-addressed chunks are shared, so nothing can be
    * dropped eagerly): [[deleteBlobs]] tombstones, [[gc]] reclaims.
    */
  def liveCatalog: DataFrame = catalog.join(tombstones, Seq("blob_hash"), "left_anti")

  /** Bytes currently stored (at-rest chunk payloads + inline payloads). */
  def currentBytes: Long = {
    val c = chunks.agg(coalesce(sum(col("size")), lit(0L))).head.getLong(0)
    val i = catalog
      .filter(col("kind") === "inline")
      .agg(coalesce(sum(octet_length(col("inline_data")).cast(LongType)), lit(0L)))
      .head
      .getLong(0)
    c + i
  }

  /** Collect-free put for large batches: same semantics as
    * [[putBlobs]] but the per-blob summary stays distributed (at
    * 100 TB the driver must never hold one row per blob).
    */
  def putBlobsDf(blobs: DataFrame): DataFrame = {
    putBlobsInternal(blobs, collectSummary = false)
    catalog.join(
      blobs.select(sha2(col("data"), 256).as("blob_hash")).distinct(),
      Seq("blob_hash"),
      "left_semi",
    ).select(col("blob_hash"), col("total_len"), col("kind"))
  }

  /** Stores every blob in `blobs` (column `data`: binary). Content-
    * addressed: already-present blobs and chunks are skipped
    * (idempotent put, store/mod.rs:330-344).
    */
  def putBlobs(blobs: DataFrame): PutResult =
    putBlobsInternal(blobs, collectSummary = true).getOrElse(PutResult(Nil))

  /** Convergent encrypt-at-rest pipeline for one level of parts.
    * In: (blob_hash, part_idx, part). Out adds: part_len (plaintext),
    * enc ('gcm'|'raw'), stored (at-rest bytes), stored_len,
    * chunk_hash (address of the STORED bytes), key (hex, null when
    * raw), bucket. Mirrors put_chunk/put_encrypted_chunk:
    * deflate+encrypt, keep raw when that is not smaller.
    */
  private def encryptParts(df: DataFrame): DataFrame =
    df.withColumn("part_len", octet_length(col("part")).cast(LongType))
      .withColumn("ct", Convergent.encryptDeflated(col("part")))
      .withColumn("enc", when(octet_length(col("ct")) <= col("part_len"), lit("gcm")).otherwise(lit("raw")))
      .withColumn("stored", when(col("enc") === "gcm", col("ct")).otherwise(col("part")))
      .withColumn("chunk_hash", sha2(col("stored"), 256))
      .withColumn("key", when(col("enc") === "gcm", sha2(col("part"), 256)).otherwise(lit(null).cast(StringType)))
      .withColumn("bucket", bucketOf(col("chunk_hash"), params.nBuckets))
      .withColumn("stored_len", octet_length(col("stored")).cast(LongType))
      .select("blob_hash", "part_idx", "chunk_hash", "key", "bucket", "part_len", "enc", "stored", "stored_len")

  private def lockFile = new HPath(path, "_GRAFT_WRITE_LOCK")

  /** Single-writer guard, the parquet-dir analog of the reference's
    * exclusive mmap writer (store/atomic.rs, store/shared.rs): two
    * concurrent `putBlobs` against one store dir would race the
    * capacity gate and double-append chunks, so the second writer must
    * fail fast instead of corrupting silently. The lock file is created
    * with `FileSystem.create(overwrite = false)` — atomic on local/HDFS
    * (object stores without atomic create should front the store with a
    * table format instead, as the class doc notes). A lock older than
    * [[ChunkStore.LockTtlMs]] is presumed to belong to a crashed writer
    * and is taken over.
    */
  private def withWriteLock[T](body: => T): T = {
    val fs = lockFile.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(lockFile)) {
      val st = fs.getFileStatus(lockFile)
      if (System.currentTimeMillis() - st.getModificationTime < LockTtlMs) {
        val holder =
          try {
            val in = fs.open(lockFile)
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
            finally in.close()
          } catch { case _: java.io.IOException => "unknown" }
        throw new StoreLockedException(path, holder)
      }
      fs.delete(lockFile, false) // stale lock from a crashed writer
    }
    val out =
      try fs.create(lockFile, false) // atomic create-if-absent
      catch { case _: java.io.IOException => throw new StoreLockedException(path, "concurrent writer") }
    try out.write(s"pid=${ProcessHandle.current().pid()} ts=${System.currentTimeMillis()}".getBytes(StandardCharsets.UTF_8))
    finally out.close()
    try body
    finally fs.delete(lockFile, false)
  }

  // Writable load: if a crashed gc/compact left swap debris, recover
  // it before any read can observe a half-swapped store (readOr treats
  // a missing table dir as empty — silent truncation). Skipped when a
  // live writer holds the lock: that writer owns the swap in flight.
  locally {
    if (!readonly) {
      val conf0 = spark.sessionState.newHadoopConf()
      val hasDebris =
        Seq(".gc_tmp", ".compact_tmp", "chunks.old", "manifest.old", "catalog.old").exists { d =>
          val p = new HPath(path, d)
          p.getFileSystem(conf0).exists(p)
        }
      if (hasDebris)
        try withWriteLock(recoverInterruptedSwap())
        catch { case _: StoreLockedException => () }
    }
  }

  private def putBlobsInternal(blobs: DataFrame, collectSummary: Boolean): Option[PutResult] = {
    if (readonly) throw new StoreReadOnlyException(path)
    withWriteLock {
      putBlobsLocked(blobs, collectSummary)
    }
  }

  private def putBlobsLocked(blobs: DataFrame, collectSummary: Boolean): Option[PutResult] = {
    val ladder = blobs
      .select(col("data"))
      .filter(col("data").isNotNull)
      .withColumn("blob_hash", sha2(col("data"), 256))
      .withColumn("total_len", octet_length(col("data")).cast(LongType))
      .withColumn("kind", kindOf(col("total_len"), params))
      .dropDuplicates("blob_hash")

    val known = catalog.select(col("blob_hash").as("known_hash"))
    val fresh = ladder
      .join(known, col("blob_hash") === col("known_hash"), "left_anti")
      .cache()
    val cached = scala.collection.mutable.ListBuffer[DataFrame](fresh)
    try {
      val inline = fresh.filter(col("kind") === "inline")
      val chunked = fresh.filter(col("kind") =!= "inline")

      // split into fixed-size parts; SQL substring is 1-based and
      // byte-addressed on BinaryType
      val parts = encryptParts(
        chunked
          .withColumn(
            "part_idx",
            explode(sequence(lit(0L), (col("total_len") + lit(params.chunkMax - 1)).divide(lit(params.chunkMax)).cast(LongType) - 1)),
          )
          .withColumn("part", expr(s"substring(data, cast(part_idx * ${params.chunkMax} + 1 as int), ${params.chunkMax})"))
          .select(col("blob_hash"), col("part_idx"), col("part"))
      ).cache()
      cached += parts

      // ---- recursive manifest tree (LongHkeyExpanded::from_blob →
      // shrink): fold level-k entries into fanout-sized node blobs,
      // store each node as a (convergently encrypted) chunk, repeat
      // until every blob is down to a single root node. O(log_fanout n)
      // rounds; each round is one distributed groupBy.
      var roots = parts
        .join(chunked.filter(col("kind") === "single").select("blob_hash"), Seq("blob_hash"), "left_semi")
        .select(
          col("blob_hash"), col("chunk_hash").as("root_hash"), col("key").as("root_key"),
          col("bucket").as("root_bucket"), lit(0).as("tree_depth"),
        )
      var cur = parts
        .join(chunked.filter(col("kind") === "tree").select("blob_hash"), Seq("blob_hash"), "left_semi")
        .select(col("blob_hash"), col("part_idx").as("idx"), col("chunk_hash"), col("key"), col("part_len").as("len"), lit("L").as("ck"))
      var depth = 0
      var nodeLevels = List.empty[DataFrame]
      var manifestNodeRows = List.empty[DataFrame]
      var remaining = cur.limit(1).count() // tree blobs have ≥2 level-0 entries

      while (remaining > 0) {
        depth += 1
        val nodesRaw = cur
          .withColumn("node_idx", expr(s"idx DIV ${params.treeFanout}"))
          .withColumn("line", concat_ws(",", col("idx"), col("chunk_hash"), coalesce(col("key"), lit("-")), col("len"), col("ck")))
          .groupBy(col("blob_hash"), col("node_idx"))
          .agg(array_join(
            transform(array_sort(collect_list(struct(col("idx"), col("line")))), s => s.getField("line")),
            "\n",
          ).as("node_text"))
          .select(col("blob_hash"), col("node_idx").as("part_idx"), col("node_text").cast(BinaryType).as("part"))
        val nodes = encryptParts(nodesRaw).cache()
        cached += nodes
        nodeLevels ::= nodes
        manifestNodeRows ::= nodes.select(
          col("blob_hash"), lit(depth).as("level"), col("part_idx"), col("chunk_hash"), col("key"), col("bucket"), col("part_len"),
        )

        val counts = nodes.groupBy(col("blob_hash")).agg(count(lit(1)).as("n"))
        roots = roots.unionByName(
          nodes
            .join(counts.filter(col("n") === 1).select("blob_hash"), Seq("blob_hash"), "left_semi")
            .select(
              col("blob_hash"), col("chunk_hash").as("root_hash"), col("key").as("root_key"),
              col("bucket").as("root_bucket"), lit(depth).as("tree_depth"),
            )
        )
        cur = nodes
          .join(counts.filter(col("n") > 1).select("blob_hash"), Seq("blob_hash"), "left_semi")
          .select(col("blob_hash"), col("part_idx").as("idx"), col("chunk_hash"), col("key"), col("part_len").as("len"), lit("N").as("ck"))
        remaining = cur.limit(1).count()
      }

      val newChunks = (parts :: nodeLevels)
        .map(_.select(col("chunk_hash"), col("bucket"), col("stored_len").as("size"), col("enc"), col("stored").as("data")))
        .reduce(_ unionByName _)
        .dropDuplicates("chunk_hash")
        .join(chunks.select(col("chunk_hash").as("kh")), col("chunk_hash") === col("kh"), "left_anti")
        .drop("kh")

      // capacity gate (reference: DataStoreOutOfSpace before any write)
      val newChunkBytes =
        newChunks.agg(coalesce(sum(col("size")), lit(0L))).head.getLong(0)
      val newInlineBytes =
        inline.agg(coalesce(sum(col("total_len")), lit(0L))).head.getLong(0)
      if (maxBytes != Long.MaxValue && currentBytes + newChunkBytes + newInlineBytes > maxBytes)
        throw new StoreOutOfSpaceException(path)

      newChunks.write.mode(SaveMode.Append).partitionBy("bucket").parquet(chunksDir)
      (parts.select(col("blob_hash"), lit(0).as("level"), col("part_idx"), col("chunk_hash"), col("key"), col("bucket"), col("part_len")) :: manifestNodeRows)
        .reduce(_ unionByName _)
        .write.mode(SaveMode.Append).parquet(manifestDir)
      fresh
        .join(roots, Seq("blob_hash"), "left")
        .select(
          col("blob_hash"),
          col("total_len"),
          col("kind"),
          when(col("kind") === "inline", col("data")).otherwise(lit(null).cast(BinaryType)).as("inline_data"),
          col("root_hash"), col("root_key"), col("root_bucket"),
          coalesce(col("tree_depth"), lit(0)).as("tree_depth"),
        )
        .write.mode(SaveMode.Append).parquet(catalogDir)

      if (collectSummary) {
        val summary = ladder.select(col("blob_hash"), col("total_len"), col("kind")).collect()
        Some(PutResult(summary.map(r => BlobRef(r.getString(0), r.getLong(1), r.getString(2))).toSeq))
      } else None
    } finally cached.foreach(_.unpersist())
  }

  /** Decrypt stored chunk bytes back to the plaintext part. */
  private def decoded(stored: Column, enc: Column, keyHex: Column): Column =
    when(enc === "raw", stored).otherwise(Convergent.decryptDeflated(stored, unhex(keyHex)))

  /** manifest-rows → (blob_hash, data) via decrypt + single-allocation
    * ordered concat (linear in blob size; the aggregate(concat) HOF it
    * replaces re-copied the accumulated prefix per part — O(parts²)).
    */
  private def reassemble(m: DataFrame, chunkSrc: DataFrame): DataFrame =
    m.join(chunkSrc.select(col("chunk_hash"), col("bucket"), col("enc"), col("data").as("stored")), Seq("chunk_hash", "bucket"))
      .withColumn("part", decoded(col("stored"), col("enc"), col("key")))
      .groupBy(col("blob_hash"))
      .agg(Codec.concatBinary(
        transform(array_sort(collect_list(struct(col("part_idx"), col("part")))), p => p.getField("part"))
      ).as("data"))

  /** Join-based bulk get: `hashDf` must have a `blob_hash` column.
    * Returns (blob_hash, data, verified). Missing hashes are absent
    * from the result (the caller — e.g. [[Lake]] — decides NotFound).
    *
    * Bulk restores read the flat level-0 manifest rows directly (one
    * distributed join, no tree walk); the recursive tree is the
    * point-lookup path ([[getBlobsByHashes]]).
    */
  def getBlobs(hashDf: DataFrame): DataFrame = {
    val want = hashDf.select(col("blob_hash")).distinct()
    val cat = liveCatalog.join(want, Seq("blob_hash"))

    val inline = cat
      .filter(col("kind") === "inline")
      .select(col("blob_hash"), col("inline_data").as("data"))

    val m = manifest
      .filter(col("level") === 0)
      .join(want, Seq("blob_hash"))
      // replay-safe: a failed-then-retried put may have appended
      // duplicate manifest rows (see class doc); rows are identical
      .dropDuplicates("blob_hash", "part_idx")

    inline
      .unionByName(reassemble(m, chunks))
      .withColumn("verified", sha2(col("data"), 256) === col("blob_hash"))
  }

  /** Point lookups via the recursive manifest tree: walk down from the
    * catalog root (reference LongHkey expansion), fetching each level
    * with literal bucket + hash predicates so every chunk scan
    * statically prunes to its 1/nBuckets hash-prefix partitions
    * (store/mod.rs:252-257 — and the difference between reading
    * 100 TB and reading 100 GB). Depth is log_fanout(parts), so the
    * walk is a handful of pruned reads even for huge blobs.
    */
  def getBlobsByHashes(hashes: Seq[String]): DataFrame = {
    import spark.implicits._
    val cat = liveCatalog.filter(col("blob_hash").isin(hashes: _*))
    val inline = cat
      .filter(col("kind") === "inline")
      .select(col("blob_hash"), col("inline_data").as("data"))

    var leaves = cat
      .filter(col("kind") === "single")
      .select(col("blob_hash"), lit(0L).as("part_idx"), col("root_hash").as("chunk_hash"), col("root_key").as("key"), col("root_bucket").as("bucket"))
    var frontier = cat
      .filter(col("kind") === "tree")
      .select(col("blob_hash"), col("root_hash").as("chunk_hash"), col("root_key").as("key"), col("root_bucket").as("bucket"))

    // The catalog records each tree's depth at put time, so the walk
    // runs EXACTLY maxDepth levels instead of paying an extra
    // frontier-isEmpty materialization job per level to discover the
    // bottom (a deep point read is all fixed per-job cost at test
    // scale — this removes one job per level, ~25% of the walk). A
    // blob shallower than maxDepth just empties out of the frontier
    // early; trust in the recorded depth is backstopped by the
    // leftover-frontier throw below and by verify-on-read.
    val maxDepth = cat.filter(col("kind") === "tree")
      .agg(coalesce(max(col("tree_depth")), lit(0))).head().getInt(0)

    val perLevel = Seq.newBuilder[DataFrame]
    def expandLevel(): Unit = {
      val entries = frontier
        .join(
          prunedChunks(frontier).select(col("chunk_hash"), col("bucket"), col("enc"), col("data").as("stored")),
          Seq("chunk_hash", "bucket"),
        )
        .select(col("blob_hash"), decoded(col("stored"), col("enc"), col("key")).cast(StringType).as("text"))
        .select(col("blob_hash"), explode(split(col("text"), "\n")).as("line"))
        .withColumn("f", split(col("line"), ","))
        .select(
          col("blob_hash"),
          col("f").getItem(0).cast(LongType).as("idx"),
          col("f").getItem(1).as("chunk_hash"),
          when(col("f").getItem(2) === "-", lit(null).cast(StringType)).otherwise(col("f").getItem(2)).as("key"),
          col("f").getItem(4).as("ck"),
        )
        .withColumn("bucket", bucketOf(col("chunk_hash"), params.nBuckets))
        .cache()
      perLevel += entries
      leaves = leaves.unionByName(
        entries.filter(col("ck") === "L").select(col("blob_hash"), col("idx").as("part_idx"), col("chunk_hash"), col("key"), col("bucket"))
      )
      frontier = entries.filter(col("ck") === "N").select(col("blob_hash"), col("chunk_hash"), col("key"), col("bucket"))
    }
    // The leaf set of a point read is bounded by the requested blobs'
    // part counts (the point-lookup contract — bulk restores go
    // through [[getBlobs]]), so land it on the driver: one action
    // that also materializes every per-level cache exactly once.
    // After this the level caches can be RELEASED — nothing
    // downstream reads them — and the returned frame carries no
    // cached state at all, so repeated point reads with fresh hash
    // sets leak nothing into the block manager (each caller action
    // re-scans only the bucket-pruned leaf files below). The walk AND
    // the collect sit inside try/finally: a non-terminating-manifest
    // throw or a failed collect must not strand up to maxDepth+64
    // cached level frames in the block manager for the session.
    val leafRows =
      try {
        for (_ <- 1 to maxDepth) expandLevel()
        // A frontier surviving maxDepth expansions means a catalog row
        // under-reports its tree's depth. The tree itself may still be
        // intact (every node verified by its content address as we
        // decode it), so availability wins: fall back to the
        // depth-agnostic probe loop and finish the walk, paying one
        // isEmpty job per extra level — only on this repair path. The
        // hard cap bounds cyclic/garbage manifests; verify-on-read still
        // backstops the payload.
        var extraLevels = 0
        while (!frontier.isEmpty) {
          extraLevels += 1
          if (extraLevels > 64)
            throw new InvalidMagicException(
              s"manifest tree does not terminate within tree_depth=$maxDepth+64 in $path")
          log.warn(
            s"tree deeper than recorded tree_depth=$maxDepth in $path " +
              s"(extra level $extraLevels); continuing depth-agnostic walk")
          expandLevel()
        }
        leaves.dropDuplicates("blob_hash", "part_idx").collect().toIndexedSeq
      } finally {
        perLevel.result().foreach(_.unpersist())
      }
    val leafSchema = leaves.schema
    val m = spark.createDataFrame(
      spark.sparkContext.parallelize(leafRows, math.max(1, leafRows.size / 1000)), leafSchema)
    // Leaf fetch: node levels are fanout-bounded so literal (bucket,
    // hash) predicates are right for them, but the LEAF set of a big
    // blob is parts-sized — thousands of hash literals make the scan
    // predicate itself the cost (measured ~5 s for 3×1500-part blobs
    // at sf0.1). Keep the partition pruning (bucket IN, ≤ nBuckets
    // literals) and do the hash membership as a broadcast semi join.
    val leafBuckets = leafRows.map(_.getAs[Int]("bucket")).distinct.sorted
    val leafHashes = leafRows.map(_.getAs[String]("chunk_hash")).distinct
    val leafChunks =
      if (leafBuckets.isEmpty) chunks.limit(0)
      else chunks.filter(col("bucket").isin(leafBuckets.map(Integer.valueOf): _*))
        .join(broadcast(leafHashes.toDF("chunk_hash")), Seq("chunk_hash"), "left_semi")
    inline
      .unionByName(reassemble(m, leafChunks))
      .withColumn("verified", sha2(col("data"), 256) === col("blob_hash"))
      .orderBy("blob_hash")
  }

  /** chunks filtered by literal (bucket, hash) sets from `refs` —
    * collected to the driver, which is exactly right for point lookups
    * (the ref set is small by definition) and turns the chunk read
    * into a partition-pruned scan.
    */
  private def prunedChunks(refs: DataFrame): DataFrame = {
    import spark.implicits._
    val wanted = refs.select(col("chunk_hash"), col("bucket")).distinct().as[(String, Int)].collect()
    if (wanted.isEmpty) chunks.limit(0)
    else chunks.filter(
      col("bucket").isin(wanted.map(_._2).distinct.toSeq: _*) &&
        col("chunk_hash").isin(wanted.map(_._1).distinct.toSeq: _*)
    )
  }

  /** Single-blob convenience get with verify-on-read. */
  def getBlob(hash: String): Array[Byte] = {
    val rows = getBlobsByHashes(Seq(hash)).collect()
    if (rows.isEmpty) throw new BlobNotFoundException(hash)
    val r = rows.head
    if (!r.getAs[Boolean]("verified")) throw new InvalidMagicException(s"hash mismatch for $hash")
    r.getAs[Array[Byte]]("data")
  }

  def containsBlob(hash: String): Boolean = {
    import spark.implicits._
    liveCatalog.join(Seq(hash).toDF("blob_hash"), Seq("blob_hash"), "left_semi").limit(1).count() > 0
  }

  /** Tombstone blobs for deletion (no data is reclaimed yet — chunks
    * are shared across blobs by content addressing, so the space comes
    * back at the next [[gc]]). Unknown and already-deleted hashes are
    * ignored. Returns the number of newly tombstoned blobs.
    */
  def deleteBlobsDf(hashDf: DataFrame): Long = {
    if (readonly) throw new StoreReadOnlyException(path)
    withWriteLock {
      val fresh = hashDf.select(col("blob_hash")).distinct()
        .join(catalog.select("blob_hash"), Seq("blob_hash"), "left_semi")
        .join(tombstones, Seq("blob_hash"), "left_anti")
        .cache()
      try {
        val n = fresh.count()
        if (n > 0) fresh.write.mode(SaveMode.Append).parquet(tombstonesDir)
        n
      } finally fresh.unpersist()
    }
  }

  def deleteBlobs(hashes: Seq[String]): Long = {
    import spark.implicits._
    deleteBlobsDf(hashes.toDF("blob_hash"))
  }

  /** Garbage collection: rewrite the store keeping only chunks
    * reachable from live (non-tombstoned) catalog entries. One
    * distributed anti-join cascade — catalog → manifest rows →
    * referenced chunk hashes — then an atomic-ish swap (write to a
    * temp dir, delete old, rename). Also compacts away replayed
    * duplicate manifest rows and orphan chunks from failed puts (the
    * same classes [[fsck]] reports).
    *
    * Requires the write lock; concurrent READERS during the swap
    * window would see a partial store — at 100 TB, front the store
    * with a table format for snapshot-isolated GC, as the class doc
    * notes. Returns a one-row stats frame.
    */
  def gc(): DataFrame = {
    if (readonly) throw new StoreReadOnlyException(path)
    import spark.implicits._
    withWriteLock {
      val conf = spark.sessionState.newHadoopConf()
      val tmpRoot = new HPath(path, ".gc_tmp")
      val fs = tmpRoot.getFileSystem(conf)
      recoverInterruptedSwap() // finish or roll back a crashed prior swap

      val beforeChunks = chunks.agg(count(lit(1)), coalesce(sum(col("size")), lit(0L))).as[(Long, Long)].head()
      val deadBlobs = tombstones.count()

      val liveCat = liveCatalog
      val liveMan = manifest
        .dropDuplicates("blob_hash", "level", "part_idx")
        .join(liveCat.select("blob_hash"), Seq("blob_hash"), "left_semi")
      val liveChunks = chunks
        .dropDuplicates("chunk_hash")
        .join(liveMan.select("chunk_hash").distinct(), Seq("chunk_hash"), "left_semi")

      // materialize the survivors BEFORE touching the source dirs (the
      // frames above read them lazily)
      liveChunks.write.partitionBy("bucket").parquet(s"$path/.gc_tmp/chunks")
      liveMan.write.parquet(s"$path/.gc_tmp/manifest")
      liveCat.write.parquet(s"$path/.gc_tmp/catalog")

      swapCommitted(fs, tmpRoot, Seq("chunks", "manifest", "catalog"), "gc")
      fs.delete(new HPath(tombstonesDir), true)

      val afterChunks = chunks.agg(count(lit(1)), coalesce(sum(col("size")), lit(0L))).as[(Long, Long)].head()
      Seq((
        deadBlobs,
        beforeChunks._1 - afterChunks._1,
        beforeChunks._2 - afterChunks._2,
        afterChunks._1,
        afterChunks._2,
      )).toDF("blobs_deleted", "chunks_reclaimed", "bytes_reclaimed", "chunks_live", "bytes_live")
    }
  }

  /** Crash-safe table swap shared by [[gc]] and [[compact]]. After the
    * rewrite fully lands in `tmpRoot`, a `_COMMIT` marker is created;
    * each table is then swapped by renaming the live dir ASIDE
    * (`<d>.old`) before renaming the tmp dir in, so a complete copy of
    * every table exists on disk at every instant. The previous
    * delete-then-rename protocol had a window where the only copy
    * lived in the tmp dir and the next run deleted it as debris.
    */
  private def swapCommitted(fs: FileSystem, tmpRoot: HPath, tables: Seq[String], what: String): Unit = {
    fs.create(new HPath(tmpRoot, "_COMMIT"), true).close()
    tables.foreach { d =>
      val dst = new HPath(path, d)
      val old = new HPath(path, s"$d.old")
      fs.delete(old, true)
      if (fs.exists(dst) && !fs.rename(dst, old))
        throw new java.io.IOException(s"$what: rename-aside failed for $d in $path")
      if (!fs.rename(new HPath(tmpRoot, d), dst))
        throw new java.io.IOException(s"$what: rename failed for $d in $path")
      fs.delete(old, true)
    }
    fs.delete(tmpRoot, true)
  }

  /** Recover from a crash mid-[[gc]]/[[compact]]: roll a committed
    * swap forward (the `_COMMIT` marker means every tmp table is a
    * complete rewrite), restore any renamed-aside table of an
    * uncommitted one, then clear debris. Idempotent; runs at writable
    * load and under the write lock before either rewrite.
    */
  private[lake] def recoverInterruptedSwap(): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val tables = Seq("chunks", "manifest", "catalog")
    Seq(".gc_tmp", ".compact_tmp").foreach { t =>
      val tmpRoot = new HPath(path, t)
      val fs = tmpRoot.getFileSystem(conf)
      val committed = fs.exists(new HPath(tmpRoot, "_COMMIT"))
      tables.foreach { d =>
        val dst = new HPath(path, d)
        val old = new HPath(path, s"$d.old")
        val tmp = new HPath(tmpRoot, d)
        if (committed && fs.exists(tmp)) {
          // roll forward: the committed tmp copy is the new truth
          if (fs.exists(dst)) { fs.delete(old, true); fs.rename(dst, old) }
          if (!fs.rename(tmp, dst))
            throw new java.io.IOException(s"swap recovery: rename failed for $d in $path")
        } else if (!fs.exists(dst) && fs.exists(old)) {
          // roll back: restore the renamed-aside live copy
          if (!fs.rename(old, dst))
            throw new java.io.IOException(s"swap recovery: restore failed for $d in $path")
        }
        if (fs.exists(dst)) fs.delete(old, true)
      }
      fs.delete(tmpRoot, true)
    }
  }

  private def countDataFiles(dir: String): Long = {
    val p = new HPath(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) 0L
    else {
      val it = fs.listFiles(p, true)
      var n = 0L
      while (it.hasNext) if (it.next().getPath.getName.endsWith(".parquet")) n += 1
      n
    }
  }

  /** Small-file compaction. Every put appends its own parquet files, so
    * a long-lived store fragments — the classic append-ingest killer at
    * scale (namenode/listing pressure, an open() per tiny file, no
    * row-group locality), and the thing the reference's bump-allocated
    * pages (store/mod.rs:330-390) never suffer: the Spark translation
    * owes this maintenance op back. Rewrites chunks co-partitioned by
    * `bucket` (one file per bucket per shuffle task — so the pruned
    * point read of [[getBlobsByHashes]] opens ~one file per probed
    * bucket again) and manifest/catalog repartitioned on `blob_hash`,
    * under the write lock with the same tmp-dir + rename swap as
    * [[gc]].
    *
    * With `reclaim = true` the rewrite is additionally GC-aware: the
    * same liveness filter [[gc]] applies (live catalog; manifest rows
    * of live blobs, replay-duplicates dropped; chunks referenced by at
    * least one live manifest row — shared chunks of tombstoned blobs
    * survive) is fused INTO the consolidation pass, and tombstones are
    * cleared after the swap. A 100 TB store pays ONE full rewrite for
    * both layout and reclamation instead of two.
    *
    * Default `reclaim = false` keeps the original contract: contents
    * untouched, only the file layout changes. Returns per-table
    * before/after file counts either way.
    */
  /** Maintenance planner — the WHEN for [[compact]]/[[gc]], completing
    * the plan → execute → verify loop ([[compact]] executes,
    * [[fsck]]/[[scrub]] verify). One row of integer health metrics:
    *  - fragmentation: chunk file count, buckets used, files per used
    *    bucket (milli — every put batch appends ~one file per touched
    *    bucket, so this ≈ put batches since the last compact; it is
    *    the number of opens a pruned point read pays per probed
    *    bucket),
    *  - liveness: chunks whose every referencing blob is tombstoned
    *    (what [[gc]] or compact(reclaim=true) would reclaim), as a
    *    count and ppm,
    *  - `recommend` — "compact_reclaim" when both thresholds trip,
    *    "compact" for fragmentation only, "reclaim" for dead mass
    *    only, "none" otherwise. Thresholds: > `maxFilesPerBucketMilli`
    *    (default 2000 = two files/bucket) and dead_ppm >
    *    `maxDeadPpm` (default 300000 — the q_compact_plan 30%
    *    dead-fraction trigger convention).
    *
    * Cost: one recursive listing of chunks/ (driver-side, bounded by
    * file count — the same listing pressure the report exists to
    * flag) + two metadata-sized aggregates. Read-only; safe on a
    * readonly store.
    */
  def maintenanceReport(maxFilesPerBucketMilli: Long = 2000L, maxDeadPpm: Long = 300000L): DataFrame = {
    import spark.implicits._
    val nFiles = countDataFiles(chunksDir)
    val nBucketsUsed = {
      val p = new HPath(chunksDir)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(p)) 0L
      else fs.listStatus(p).count(s => s.isDirectory && s.getPath.getName.startsWith("bucket=")).toLong
    }
    val filesPerBucketMilli = if (nBucketsUsed == 0) 0L else nFiles * 1000L / nBucketsUsed
    // ONE pass over the chunk table for both liveness counts (was two:
    // a distinct count, then a semi-join + distinct count that re-read
    // every chunk row): the distinct chunk set left-joins the live
    // reference set once, and a single scalar aggregate yields total
    // and live together. Identical numbers — the semi-join's "exists"
    // is the left join's matched marker.
    val liveRefs = manifest
      .dropDuplicates("blob_hash", "level", "part_idx")
      .join(liveCatalog.select("blob_hash"), Seq("blob_hash"), "left_semi")
      .select("chunk_hash").distinct()
      .withColumn("live_", lit(1L))
    val cnts = chunks.select(col("chunk_hash")).distinct()
      .join(liveRefs, Seq("chunk_hash"), "left")
      .agg(count(lit(1)).as("n"), coalesce(sum(col("live_")), lit(0L)).as("nl"))
      .head()
    val nChunks = cnts.getLong(0)
    val nLive = cnts.getLong(1)
    val nDead = nChunks - nLive
    val deadPpm = if (nChunks == 0) 0L else nDead * 1000000L / nChunks
    val frag = filesPerBucketMilli > maxFilesPerBucketMilli
    val dead = deadPpm > maxDeadPpm
    val recommend =
      if (frag && dead) "compact_reclaim"
      else if (frag) "compact"
      else if (dead) "reclaim"
      else "none"
    Seq((nFiles, nBucketsUsed, filesPerBucketMilli, nChunks, nDead, deadPpm, recommend))
      .toDF("n_chunk_files", "n_buckets_used", "files_per_bucket_milli",
        "n_chunks", "n_dead_chunks", "dead_ppm", "recommend")
  }

  def compact(reclaim: Boolean = false): DataFrame = {
    if (readonly) throw new StoreReadOnlyException(path)
    import spark.implicits._
    withWriteLock {
      val conf = spark.sessionState.newHadoopConf()
      val tmpRoot = new HPath(path, ".compact_tmp")
      val fs = tmpRoot.getFileSystem(conf)
      recoverInterruptedSwap() // finish or roll back a crashed prior swap

      val before = Map(
        "chunks" -> countDataFiles(chunksDir),
        "manifest" -> countDataFiles(manifestDir),
        "catalog" -> countDataFiles(catalogDir),
      )
      val (outCat, outMan, outChunks) =
        if (!reclaim) (catalog, manifest, chunks)
        else {
          val liveCat = liveCatalog
          val liveMan = manifest
            .dropDuplicates("blob_hash", "level", "part_idx")
            .join(liveCat.select("blob_hash"), Seq("blob_hash"), "left_semi")
          val liveChunks = chunks
            .dropDuplicates("chunk_hash")
            .join(liveMan.select("chunk_hash").distinct(), Seq("chunk_hash"), "left_semi")
          (liveCat, liveMan, liveChunks)
        }
      // materialize into tmp BEFORE touching the source dirs (the
      // frames above read them lazily)
      outChunks.repartition(col("bucket")).write.partitionBy("bucket")
        .parquet(s"$path/.compact_tmp/chunks")
      outMan.repartition(col("blob_hash")).write.parquet(s"$path/.compact_tmp/manifest")
      outCat.repartition(col("blob_hash")).write.parquet(s"$path/.compact_tmp/catalog")

      swapCommitted(fs, tmpRoot, Seq("chunks", "manifest", "catalog"), "compact")
      if (reclaim) fs.delete(new HPath(tombstonesDir), true)

      Seq("chunks", "manifest", "catalog").map { d =>
        val dir = d match {
          case "chunks" => chunksDir
          case "manifest" => manifestDir
          case _ => catalogDir
        }
        (d, before(d), countDataFiles(dir))
      }.toDF("table", "files_before", "files_after")
    }
  }

  /** Store consistency audit — the Spark analog of the reference's
    * load-time corruption checks (store/mod.rs:107-170 bounds/overlap/
    * modulo sanity). Returns one row per invariant with its violation
    * count; a healthy store is all zeros.
    */
  def fsck(): DataFrame = ChunkStore.fsckReport(manifest, chunks, catalog)

  /** Payload scrub — the bit-rot half of the integrity story
    * ([[fsck]] audits STRUCTURE across the three relations; scrub
    * audits the BYTES at rest). Chunks are addressed by the hash of
    * what is actually stored (ciphertext or raw — encryptParts), so
    * re-hashing every payload against its address detects any flipped
    * bit with no key material and no decryption: the scheduled-scrub
    * pass an object store runs, here ONE map-side scan of the chunk
    * table (conditional int64 sums, no shuffle beyond the final 1-row
    * combine) rolled up to one row per invariant:
    *  - `payload_hash_mismatch` — sha256(data) ≠ chunk_hash (bit rot)
    *  - `size_mismatch` — recorded size ≠ octet_length(data)
    *    (truncated or padded write)
    *  - `misplaced_bucket` — bucket ≠ hash-prefix bucket: the chunk
    *    EXISTS but every pruned point read ([[getBlobsByHashes]])
    *    looks in the wrong partition and misses it — invisible
    *    corruption to the read path, only a scrub finds it
    *  - `missing_payload` — null data cell
    * plus `scanned_chunks` so an empty scan can't read as a clean
    * store. A healthy store is all-zero.
    */
  def scrub(): DataFrame = {
    import spark.implicits._
    val agg = chunks.agg(
      count(lit(1)).as("n"),
      coalesce(sum(when(sha2(col("data"), 256) =!= col("chunk_hash"), 1L).otherwise(0L)), lit(0L)).as("h"),
      coalesce(sum(when(col("size") =!= octet_length(col("data")).cast(LongType), 1L).otherwise(0L)), lit(0L)).as("s"),
      coalesce(sum(when(col("bucket") =!= ChunkStore.bucketOf(col("chunk_hash"), params.nBuckets), 1L).otherwise(0L)), lit(0L)).as("b"),
      coalesce(sum(when(col("data").isNull, 1L).otherwise(0L)), lit(0L)).as("m"),
    ).head()
    Seq(
      ("misplaced_bucket", agg.getLong(3)),
      ("missing_payload", agg.getLong(4)),
      ("payload_hash_mismatch", agg.getLong(1)),
      ("scanned_chunks", agg.getLong(0)),
      ("size_mismatch", agg.getLong(2)),
    ).toDF("check", "violations").orderBy("check")
  }

  /** Catalog-level diff vs another store: one row per blob seen by
    * either side with its reconciliation status. Content addressing
    * makes this exact with nothing but a full-outer join on the hash
    * — `length_mismatch` can only mean corruption, since equal hashes
    * imply equal content. Compares the *live* views: a tombstoned
    * blob reads as absent on its side (it is, to readers), so a blob
    * deleted here but live over there reports `only_other`, not
    * `in_sync`.
    */
  def diff(other: ChunkStore): DataFrame =
    liveCatalog.select(col("blob_hash"), col("total_len").as("len_here"))
      .join(
        other.liveCatalog.select(col("blob_hash"), col("total_len").as("len_other")),
        Seq("blob_hash"),
        "full_outer",
      )
      .select(
        col("blob_hash"),
        when(col("len_other").isNull, "only_here")
          .when(col("len_here").isNull, "only_other")
          .when(col("len_here") =!= col("len_other"), "length_mismatch")
          .otherwise("in_sync")
          .as("status"),
        col("len_here"),
        col("len_other"),
      )

  /** Replicate every *live* blob this store has and `target` lacks, by
    * content address: the missing catalog rows, their manifest rows
    * (keys travel with them, so convergent-encrypted parts stay
    * decryptable), and only the chunk payloads the target does not
    * already hold — cross-store dedup is the same anti-join the put
    * path uses, so shared chunks are never re-shipped. Idempotent;
    * honors the target's capacity gate and write lock; follows the
    * chunks → manifest → catalog visibility order so a failed copy
    * leaves no readable half-blob. Returns the number of blobs copied.
    *
    * Replication is additive and respects deletes on both ends: the
    * source side is [[liveCatalog]] (a blob tombstoned here — even
    * before [[gc]] reclaims it — must not resurrect as a readable
    * blob in the replica), while the anti-join keys on the target's
    * *raw* catalog (a blob the target itself tombstoned still owns
    * its catalog row until gc, so it is not re-shipped and the
    * target's delete stays deleted). Deletes are not pushed to blobs
    * the target already holds — this is a copy, not a delete-sync.
    */
  def replicateTo(target: ChunkStore): Long = {
    if (target.readonly) throw new StoreReadOnlyException(target.path)
    target.withWriteLock {
      val missing = liveCatalog
        .join(target.catalog.select("blob_hash"), Seq("blob_hash"), "left_anti")
        .cache()
      try {
        val n = missing.count()
        if (n > 0) {
          val mRows = manifest
            .join(missing.select("blob_hash"), Seq("blob_hash"), "left_semi")
            .cache()
          val wanted = mRows.select(col("chunk_hash")).distinct()
          val newChunks = chunks
            .join(wanted, Seq("chunk_hash"), "left_semi")
            .join(target.chunks.select("chunk_hash"), Seq("chunk_hash"), "left_anti")
          val addBytes = newChunks.agg(coalesce(sum(col("size")), lit(0L))).head.getLong(0)
          val inlineBytes = missing.filter(col("kind") === "inline")
            .agg(coalesce(sum(col("total_len")), lit(0L))).head.getLong(0)
          if (target.maxBytes != Long.MaxValue &&
            target.currentBytes + addBytes + inlineBytes > target.maxBytes)
            throw new StoreOutOfSpaceException(target.path)
          newChunks.write.mode(SaveMode.Append).partitionBy("bucket").parquet(target.chunksDir)
          mRows.write.mode(SaveMode.Append).parquet(target.manifestDir)
          missing.write.mode(SaveMode.Append).parquet(target.catalogDir)
          mRows.unpersist()
        }
        n
      } finally missing.unpersist()
    }
  }
}

final case class BlobRef(blobHash: String, totalLen: Long, kind: String)
final case class PutResult(blobs: Seq[BlobRef])

object ChunkStore {
  /** Magic marker content (reference: store/mod.rs MAGIC = b"DataLake..."). */
  val Magic = "GraftStore v1"

  /** Write locks older than this are presumed dead and taken over (a
    * crashed driver must not brick the store forever; a healthy put
    * refreshes nothing, so size the TTL well above the longest put).
    */
  val LockTtlMs: Long = 30L * 60 * 1000

  val chunkSchema: StructType = StructType(Seq(
    StructField("chunk_hash", StringType),
    StructField("size", LongType),
    StructField("enc", StringType),
    StructField("data", BinaryType),
    StructField("bucket", IntegerType),
  ))
  val manifestSchema: StructType = StructType(Seq(
    StructField("blob_hash", StringType),
    StructField("level", IntegerType),
    StructField("part_idx", LongType),
    StructField("chunk_hash", StringType),
    StructField("key", StringType),
    StructField("bucket", IntegerType),
    StructField("part_len", LongType),
  ))
  val catalogSchema: StructType = StructType(Seq(
    StructField("blob_hash", StringType),
    StructField("total_len", LongType),
    StructField("kind", StringType),
    StructField("inline_data", BinaryType),
    StructField("root_hash", StringType),
    StructField("root_key", StringType),
    StructField("root_bucket", IntegerType),
    StructField("tree_depth", IntegerType),
  ))
  val tombstoneSchema: StructType = StructType(Seq(
    StructField("blob_hash", StringType),
  ))

  /** Size ladder (store/mod.rs:430-457). */
  def kindOf(len: Column, p: LakeParams): Column =
    when(len <= p.inlineMax, "inline")
      .when(len <= p.chunkMax, "single")
      .otherwise("tree")

  /** Hash-prefix bucket (the index-modulo analog, store/mod.rs:252-257). */
  def bucketOf(hashHex: Column, nBuckets: Int): Column =
    (conv(substring(hashHex, 1, 4), 16, 10).cast(IntegerType) % nBuckets).cast(IntegerType)

  /** The [[ChunkStore.fsck]] invariant algebra over ARBITRARY
    * (manifest, chunks, catalog) relations — static so the audit can
    * be oracled against DuckDB on a synthetic corrupted universe
    * (`lake_fsck` in LakeOps) with the exact code a real store runs.
    * One row per invariant with its violation count; a healthy store
    * is all zeros. Inputs only need the referenced columns (manifest:
    * blob_hash/level/part_idx/part_len/chunk_hash; chunks: chunk_hash;
    * catalog: blob_hash/kind/total_len/inline_data/root_hash).
    *
    * Shape: ONE plan — the count-aggregates unioned — instead of
    * sequential driver count() jobs; every check is an anti/equi
    * join or grouped filter on a hash key, so at store scale each is
    * a hash-partitioned shuffle with map-side partial counts and the
    * report is metadata-sized.
    *
    * The `catalog_tree_depth_mismatch` check (recorded tree_depth vs
    * the manifest's actual max level — the corruption class the read
    * path TOLERATES via its depth-agnostic fallback walk, which is
    * exactly why verification must still surface it) activates only
    * when the inputs carry `tree_depth`/`level`; synthetic universes
    * that model a flat manifest keep the column-minimal contract.
    */
  def fsckReport(m: DataFrame, c: DataFrame, cat: DataFrame): DataFrame = {
    val refs = m.select(col("chunk_hash"))
      .union(cat.filter(col("root_hash").isNotNull).select(col("root_hash")))
      .distinct()
    val level0 = m.filter(col("level") === 0)
    val checks: Seq[(String, DataFrame)] = Seq(
      // every manifest row's chunk must exist
      "manifest_missing_chunks" ->
        m.join(c.select("chunk_hash"), Seq("chunk_hash"), "left_anti"),
      // every stored chunk must be referenced (manifest part or catalog root)
      "orphan_chunks" ->
        c.select("chunk_hash").distinct().join(refs, Seq("chunk_hash"), "left_anti"),
      "duplicate_manifest_rows" ->
        m.groupBy("blob_hash", "level", "part_idx").count().filter(col("count") > 1),
      "duplicate_chunks" ->
        c.groupBy("chunk_hash").count().filter(col("count") > 1),
      // every chunked catalog entry needs level-0 manifest rows…
      "catalog_without_manifest" ->
        cat.filter(col("kind") =!= "inline")
          .join(level0.select("blob_hash").distinct(), Seq("blob_hash"), "left_anti"),
      // …and every manifest row a catalog owner
      "manifest_without_catalog" ->
        m.select("blob_hash").distinct()
          .join(cat.select("blob_hash"), Seq("blob_hash"), "left_anti"),
      // level-0 part lengths must reassemble to the catalog length
      "blob_length_mismatch" ->
        cat.filter(col("kind") =!= "inline")
          .join(
            level0.dropDuplicates("blob_hash", "part_idx")
              .groupBy("blob_hash").agg(sum(col("part_len")).as("plen")),
            Seq("blob_hash"),
          )
          .filter(col("plen") =!= col("total_len")),
      "inline_missing_payload" ->
        cat.filter(col("kind") === "inline" && col("inline_data").isNull),
      "chunked_missing_root" ->
        cat.filter(col("kind") =!= "inline" && col("root_hash").isNull),
    ) ++ (
      // recorded depth must equal the tree's actual max level (a null
      // recording counts as a mismatch); inner join so blobs with no
      // manifest at all stay the catalog_without_manifest finding
      if (cat.columns.contains("tree_depth") && m.columns.contains("level"))
        Seq("catalog_tree_depth_mismatch" ->
          cat.filter(col("kind") =!= "inline")
            .join(
              m.groupBy("blob_hash").agg(max(col("level")).as("actual_depth")),
              Seq("blob_hash"),
            )
            .filter(coalesce(col("tree_depth"), lit(-1)) =!= col("actual_depth")))
      else Seq.empty
    )
    checks.map { case (name, df) =>
      df.agg(count(lit(1)).as("violations")).select(lit(name).as("check"), col("violations"))
    }.reduce(_ unionByName _).orderBy("check")
  }

  private def markerPath(path: String) = new HPath(path, "_GRAFT_STORE")

  private def hadoopConf(spark: SparkSession) = spark.sessionState.newHadoopConf()

  /** Magic check through Hadoop's FileSystem so hdfs:///s3a:// store
    * paths resolve with the session's configuration (a java.nio check
    * would wrongly report remote stores absent).
    */
  def isStore(spark: SparkSession, path: String): Boolean = {
    val m = markerPath(path)
    val fs = m.getFileSystem(hadoopConf(spark))
    fs.exists(m) && {
      val in = fs.open(m)
      try {
        val buf = new Array[Byte](Magic.length)
        in.readFully(buf)
        new String(buf, StandardCharsets.UTF_8) == Magic
      } catch { case _: java.io.EOFException => false }
      finally in.close()
    }
  }

  /** Initialize a fresh store directory (reference: DataStore::init). */
  def init(spark: SparkSession, path: String, maxBytes: Long = Long.MaxValue, params: LakeParams = LakeParams()): ChunkStore = {
    val root = new HPath(path)
    val fs = root.getFileSystem(hadoopConf(spark))
    fs.mkdirs(root)
    val out = fs.create(markerPath(path), true)
    try out.write(s"$Magic\nnBuckets=${params.nBuckets}\n".getBytes(StandardCharsets.UTF_8))
    finally out.close()
    new ChunkStore(spark, path, readonly = false, maxBytes, params)
  }

  /** Load an existing store, verifying the magic (DataStore::load +
    * verify_magic, lake/util.rs).
    */
  def load(spark: SparkSession, path: String, readonly: Boolean, maxBytes: Long = Long.MaxValue, params: LakeParams = LakeParams()): ChunkStore = {
    if (!isStore(spark, path)) throw new InvalidMagicException(path)
    new ChunkStore(spark, path, readonly, maxBytes, params)
  }
}
