package graft.lake

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

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
final class LakeOutOfStoresException extends RuntimeException("lake is out of writable stores")
final class InvalidMagicException(path: String)
    extends RuntimeException(s"not a graft store (bad magic): $path")
final class BlobNotFoundException(hash: String)
    extends RuntimeException(s"blob not found: $hash")

/** Size-ladder / layout parameters.
  *
  * The reference's ladder (store/mod.rs:430-457): raw-inline below
  * MAX_SIZE_RAW, single encrypted chunk below MAX_DECRYPTED_SIZE,
  * recursive chunk tree (LongHkey) above. Defaults here are test-scale;
  * production would use e.g. (256, 1 MiB, 1024 buckets).
  */
final case class LakeParams(inlineMax: Long = 64L, chunkMax: Long = 256L, nBuckets: Int = 64)

/** A content-addressed chunk store re-expressed Spark-first.
  *
  * Reference analog: one `DataStore` (store/mod.rs) — an mmap'd flat
  * file with a hash index and bump-allocated pages. Here instead:
  *
  *  - `chunks/` — parquet partitioned by `bucket` (the index-modulo
  *    analog, store/mod.rs:252-257): `get(hash)` prunes to a single
  *    hash-prefix partition instead of probing an index, which at
  *    100 TB means a 1/nBuckets partition read, and chunk writes
  *    distribute uniformly with no coordinator.
  *  - `manifest/` — the LongHkey tree analog: (blob_hash, part_idx,
  *    chunk_hash, bucket, part_len) rows.
  *  - `catalog/` — one row per blob: hash, length, kind
  *    (inline|single|tree), inline payload for tiny blobs (the
  *    reference's raw Hkey, which embeds data in the key itself).
  *  - `_GRAFT_STORE` — the magic marker (store/mod.rs MAGIC +
  *    lake/util.rs verify_magic).
  *
  * Content addressing gives idempotent, deduplicating puts exactly as
  * in the reference (store/mod.rs:330-344: existing hash → return
  * existing chunk). Concurrent multi-writer atomicity (the reference's
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

  private def chunksDir = s"$path/chunks"
  private def manifestDir = s"$path/manifest"
  private def catalogDir = s"$path/catalog"

  private def emptyDf(schema: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  private def readOr(dir: String, schema: StructType): DataFrame =
    if (Files.exists(Paths.get(dir))) spark.read.schema(schema).parquet(dir)
    else emptyDf(schema)

  def chunks: DataFrame = readOr(chunksDir, chunkSchema)
  def manifest: DataFrame = readOr(manifestDir, manifestSchema)
  def catalog: DataFrame = readOr(catalogDir, catalogSchema)

  /** Bytes currently stored (chunk payloads + inline payloads). */
  def currentBytes: Long = {
    val c = chunks.agg(coalesce(sum(col("size")), lit(0L))).head.getLong(0)
    val i = catalog
      .filter(col("kind") === "inline")
      .agg(coalesce(sum(octet_length(col("inline_data")).cast(LongType)), lit(0L)))
      .head
      .getLong(0)
    c + i
  }

  /** Stores every blob in `blobs` (column `data`: binary, plus any
    * caller id columns which are ignored here). Content-addressed:
    * already-present blobs and chunks are skipped (idempotent put,
    * store/mod.rs:330-344). Returns a summary per distinct input blob.
    */
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

  def putBlobs(blobs: DataFrame): PutResult =
    putBlobsInternal(blobs, collectSummary = true).getOrElse(PutResult(Nil))

  private def putBlobsInternal(blobs: DataFrame, collectSummary: Boolean): Option[PutResult] = {
    if (readonly) throw new StoreReadOnlyException(path)

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
    try {
      val inline = fresh.filter(col("kind") === "inline")
      val chunked = fresh.filter(col("kind") =!= "inline")

      // split into fixed-size parts; SQL substring is 1-based and
      // byte-addressed on BinaryType
      val parts = chunked
        .withColumn(
          "part_idx",
          explode(sequence(lit(0L), (col("total_len") + lit(params.chunkMax - 1)).divide(lit(params.chunkMax)).cast(LongType) - 1)),
        )
        .withColumn("part", expr(s"substring(data, cast(part_idx * ${params.chunkMax} + 1 as int), ${params.chunkMax})"))
        .select(
          col("blob_hash"),
          col("part_idx"),
          col("part"),
          sha2(col("part"), 256).as("chunk_hash"),
          octet_length(col("part")).cast(LongType).as("part_len"),
        )
        .withColumn("bucket", bucketOf(col("chunk_hash"), params.nBuckets))
        .cache()

      val newChunks = parts
        .select(col("chunk_hash"), col("bucket"), col("part_len").as("size"), col("part").as("data"))
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
      parts
        .select(col("blob_hash"), col("part_idx"), col("chunk_hash"), col("bucket"), col("part_len"))
        .write.mode(SaveMode.Append).parquet(manifestDir)
      fresh
        .select(
          col("blob_hash"),
          col("total_len"),
          col("kind"),
          when(col("kind") === "inline", col("data")).otherwise(lit(null).cast(BinaryType)).as("inline_data"),
        )
        .write.mode(SaveMode.Append).parquet(catalogDir)

      if (collectSummary) {
        val summary = ladder.select(col("blob_hash"), col("total_len"), col("kind")).collect()
        Some(PutResult(summary.map(r => BlobRef(r.getString(0), r.getLong(1), r.getString(2))).toSeq))
      } else None
    } finally fresh.unpersist()
  }

  /** Join-based bulk get: `hashDf` must have a `blob_hash` column.
    * Returns (blob_hash, data, verified). Missing hashes are absent
    * from the result (the caller — e.g. [[Lake]] — decides NotFound).
    *
    * Reassembly = the reference's LongHkey expansion: manifest rows
    * joined to chunk payloads, partition-pruned by bucket, then an
    * ordered binary concat per blob.
    */
  def getBlobs(hashDf: DataFrame): DataFrame = {
    val want = hashDf.select(col("blob_hash")).distinct()
    val cat = catalog.join(want, Seq("blob_hash"))

    val inline = cat
      .filter(col("kind") === "inline")
      .select(col("blob_hash"), col("inline_data").as("data"))

    val m = manifest.join(want, Seq("blob_hash"))
    val reassembled = m
      .join(chunks.select(col("chunk_hash"), col("bucket"), col("data").as("chunk_data")), Seq("chunk_hash", "bucket"))
      .groupBy(col("blob_hash"))
      .agg(
        aggregate(
          transform(
            array_sort(collect_list(struct(col("part_idx"), col("chunk_data")))),
            p => p.getField("chunk_data"),
          ),
          lit(Array.emptyByteArray),
          (acc, x) => concat(acc, x),
        ).as("data")
      )

    inline
      .unionByName(reassembled)
      .withColumn("verified", sha2(col("data"), 256) === col("blob_hash"))
  }

  /** Point lookups: literal bucket + hash predicates so the parquet
    * scan statically prunes to the 1/nBuckets hash-prefix partitions
    * (the reference's index-bucket probe, store/mod.rs:252-257 — and
    * the difference between reading 100 TB and reading 100 GB).
    */
  def getBlobsByHashes(hashes: Seq[String]): DataFrame = {
    import spark.implicits._
    val cat = catalog.filter(col("blob_hash").isin(hashes: _*))
    val inline = cat
      .filter(col("kind") === "inline")
      .select(col("blob_hash"), col("inline_data").as("data"))
    val m = manifest.filter(col("blob_hash").isin(hashes: _*)).cache()
    val wanted = m.select(col("chunk_hash"), col("bucket")).distinct().as[(String, Int)].collect()
    val buckets = wanted.map(_._2).distinct.toSeq
    val chunkHashes = wanted.map(_._1).distinct.toSeq
    val pruned = chunks
      .filter(col("bucket").isin(buckets: _*) && col("chunk_hash").isin(chunkHashes: _*))
    val reassembled = m
      .join(pruned.select(col("chunk_hash"), col("bucket"), col("data").as("chunk_data")), Seq("chunk_hash", "bucket"))
      .groupBy(col("blob_hash"))
      .agg(
        aggregate(
          transform(
            array_sort(collect_list(struct(col("part_idx"), col("chunk_data")))),
            p => p.getField("chunk_data"),
          ),
          lit(Array.emptyByteArray),
          (acc, x) => concat(acc, x),
        ).as("data")
      )
    inline
      .unionByName(reassembled)
      .withColumn("verified", sha2(col("data"), 256) === col("blob_hash"))
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
    catalog.join(Seq(hash).toDF("blob_hash"), Seq("blob_hash"), "left_semi").limit(1).count() > 0
  }
}

final case class BlobRef(blobHash: String, totalLen: Long, kind: String)
final case class PutResult(blobs: Seq[BlobRef])

object ChunkStore {
  /** Magic marker content (reference: store/mod.rs MAGIC = b"DataLake..."). */
  val Magic = "GraftStore v1"

  val chunkSchema: StructType = StructType(Seq(
    StructField("chunk_hash", StringType),
    StructField("size", LongType),
    StructField("data", BinaryType),
    StructField("bucket", IntegerType),
  ))
  val manifestSchema: StructType = StructType(Seq(
    StructField("blob_hash", StringType),
    StructField("part_idx", LongType),
    StructField("chunk_hash", StringType),
    StructField("bucket", IntegerType),
    StructField("part_len", LongType),
  ))
  val catalogSchema: StructType = StructType(Seq(
    StructField("blob_hash", StringType),
    StructField("total_len", LongType),
    StructField("kind", StringType),
    StructField("inline_data", BinaryType),
  ))

  /** Size ladder (store/mod.rs:430-457). */
  def kindOf(len: Column, p: LakeParams): Column =
    when(len <= p.inlineMax, "inline")
      .when(len <= p.chunkMax, "single")
      .otherwise("tree")

  /** Hash-prefix bucket (the index-modulo analog, store/mod.rs:252-257). */
  def bucketOf(hashHex: Column, nBuckets: Int): Column =
    (conv(substring(hashHex, 1, 4), 16, 10).cast(IntegerType) % nBuckets).cast(IntegerType)

  private def markerPath(path: String) = Paths.get(path, "_GRAFT_STORE")

  def isStore(path: String): Boolean =
    Files.exists(markerPath(path)) &&
      new String(Files.readAllBytes(markerPath(path)), StandardCharsets.UTF_8).startsWith(Magic)

  /** Initialize a fresh store directory (reference: DataStore::init). */
  def init(spark: SparkSession, path: String, maxBytes: Long = Long.MaxValue, params: LakeParams = LakeParams()): ChunkStore = {
    Files.createDirectories(Paths.get(path))
    Files.write(markerPath(path), s"$Magic\nnBuckets=${params.nBuckets}\n".getBytes(StandardCharsets.UTF_8))
    new ChunkStore(spark, path, readonly = false, maxBytes, params)
  }

  /** Load an existing store, verifying the magic (DataStore::load +
    * verify_magic, lake/util.rs).
    */
  def load(spark: SparkSession, path: String, readonly: Boolean, maxBytes: Long = Long.MaxValue, params: LakeParams = LakeParams()): ChunkStore = {
    if (!isStore(path)) throw new InvalidMagicException(path)
    new ChunkStore(spark, path, readonly, maxBytes, params)
  }
}
