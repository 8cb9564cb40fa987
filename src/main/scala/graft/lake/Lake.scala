package graft.lake

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Store entry in a lake config (reference: lake/config.rs
  * ConfigStoreEntry {filename, readonly}), extended with a capacity
  * bound so the reference's spill-over-on-full routing
  * (lake/mod.rs:77-118) is expressible.
  */
final case class StoreEntry(path: String, readonly: Boolean = false, maxBytes: Long = Long.MaxValue)

/** Lake config with a minimal TOML round-trip matching the reference's
  * on-disk format (lake/config.rs from_toml_str/to_toml_string). No
  * external TOML dep — the subset used by the config (array-of-tables
  * with string/bool/int keys) is parsed directly.
  */
final case class LakeConfig(stores: Seq[StoreEntry]) {
  def toToml: String =
    stores.map { s =>
      val mb = if (s.maxBytes == Long.MaxValue) "" else s"max_bytes = ${s.maxBytes}\n"
      s"""[[stores]]\nfilename = "${s.path}"\nreadonly = ${s.readonly}\n$mb"""
    }.mkString("\n")
}

object LakeConfig {
  def fromToml(toml: String): LakeConfig = {
    val entries = scala.collection.mutable.ListBuffer.empty[StoreEntry]
    var cur: Option[(String, Boolean, Long)] = None
    def flush(): Unit = cur.foreach { case (p, r, m) => if (p.nonEmpty) entries += StoreEntry(p, r, m) }
    toml.linesIterator.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).foreach {
      case "[[stores]]" =>
        flush(); cur = Some(("", false, Long.MaxValue))
      case l if l.contains("=") =>
        val Array(k, v) = l.split("=", 2).map(_.trim)
        cur = cur.map { case (p, r, m) =>
          k match {
            case "filename" => (v.stripPrefix("\"").stripSuffix("\""), r, m)
            case "readonly" => (p, v == "true", m)
            case "max_bytes" => (p, r, v.toLong)
            case _ => (p, r, m)
          }
        }
      case _ => ()
    }
    flush()
    LakeConfig(entries.toList)
  }
}

/** Multi-store lake (reference: DataLake, lake/mod.rs).
  *
  * Routing mirrors lake/mod.rs exactly:
  *  - init: readonly entries load read-only; writable entries are
  *    initialized if the magic is absent, loaded otherwise
  *    (lake/mod.rs:36-53 verify_magic branch);
  *  - get: first store that has the blob wins (lake/mod.rs:59-75
  *    fallback chain) — implemented as a priority-ranked union so one
  *    distributed job covers all stores;
  *  - put: first writable store with space; OutOfSpace/ReadOnly →
  *    try next; none left → LakeOutOfStores (lake/mod.rs:77-118).
  */
final class Lake private (val spark: SparkSession, val config: LakeConfig, val stores: Seq[ChunkStore]) {

  def readable: Seq[ChunkStore] = stores
  def writable: Seq[ChunkStore] = stores.filterNot(_.readonly)

  def put(blobs: DataFrame): PutResult = {
    var lastErr: Throwable = null
    writable.foreach { s =>
      try return s.putBlobs(blobs)
      catch {
        case e: StoreOutOfSpaceException => lastErr = e
        case e: StoreReadOnlyException => lastErr = e
      }
    }
    throw (if (lastErr != null) new LakeOutOfStoresException else new LakeOutOfStoresException)
  }

  /** Bulk get across all stores; first (config-order) store holding a
    * hash provides the payload.
    */
  def get(hashDf: DataFrame): DataFrame = {
    val perStore = stores.zipWithIndex.map { case (s, i) =>
      s.getBlobs(hashDf).withColumn("store_priority", lit(i))
    }
    val all = perStore.reduceLeft(_ unionByName _)
    val w = Window.partitionBy(col("blob_hash")).orderBy(col("store_priority"))
    all
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn", "store_priority")
  }

  def getBlob(hash: String): Array[Byte] = {
    stores.foreach { s =>
      if (s.containsBlob(hash)) return s.getBlob(hash)
    }
    throw new BlobNotFoundException(hash)
  }

  /** Tombstone blobs in every writable store that holds them (a blob
    * put before a spill-over may live in several). Returns the number
    * of (store, blob) tombstones written.
    */
  def delete(hashes: Seq[String]): Long =
    writable.map(_.deleteBlobs(hashes)).sum

  /** GC every writable store; returns per-store stats keyed by path. */
  def gc(): DataFrame =
    writable.map(s => s.gc().withColumn("store", lit(s.path)))
      .reduceLeft(_ unionByName _)

  /** Compact every writable store (small-file consolidation; with
    * `reclaim` the GC liveness filter is fused into the same rewrite —
    * see [[ChunkStore.compact]]). The lake-level maintenance sibling
    * of [[gc]]: per-store per-table before/after file counts keyed by
    * path.
    */
  def compact(reclaim: Boolean = false): DataFrame =
    writable.map(s => s.compact(reclaim).withColumn("store", lit(s.path)))
      .reduceLeft(_ unionByName _)

  /** Scrub every store, readable included (payload verification needs
    * no write access); per-store per-invariant violation counts keyed
    * by path — the fleet-wide form of the scheduled scrub.
    */
  def scrub(): DataFrame =
    stores.map(s => s.scrub().withColumn("store", lit(s.path)))
      .reduceLeft(_ unionByName _)

  /** Fleet-level maintenance planner — the WHEN for [[compact]]/[[gc]]
    * at the grain the reference's multi-store routing implies
    * (lake/mod.rs:59-118): one [[ChunkStore.maintenanceReport]] row
    * per store, keyed by path. Readonly stores still MEASURE
    * (fragmentation and dead fraction are read-side observable, and a
    * degraded readonly member explains slow lake reads) but never
    * recommend a write action: their tripped recommendation degrades
    * to `read_only` so a scheduler executing this column can never be
    * steered into a StoreReadOnlyException. Completes the fleet-level
    * plan → execute ([[compact]]) → verify ([[scrub]]/fsck) loop.
    */
  def maintenanceReport(
      maxFilesPerBucketMilli: Long = 2000L,
      maxDeadPpm: Long = 300000L,
  ): DataFrame = {
    // Per-store reports are independent measurement jobs — run them
    // from driver threads so each store's listing + liveness aggregate
    // back-fills executors freed by the previous one's tail (the
    // overlap-independent-jobs idiom; Spark's FIFO scheduler handles
    // concurrent driver actions). Results are awaited in store order,
    // so the fleet report is byte-identical to the sequential fold.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    stores.map { s =>
      Future {
        val base = s.maintenanceReport(maxFilesPerBucketMilli, maxDeadPpm)
          .withColumn("store", lit(s.path))
          .withColumn("readonly", lit(s.readonly))
        if (s.readonly)
          base.withColumn(
            "recommend",
            when(col("recommend") === "none", lit("none")).otherwise(lit("read_only")))
        else base
      }
    }.map(Await.result(_, Duration.Inf)).reduceLeft(_ unionByName _)
  }
}

object Lake {
  /** DataLake::init (lake/mod.rs:32-57). */
  def init(spark: SparkSession, config: LakeConfig, params: LakeParams = LakeParams()): Lake = {
    val stores = config.stores.map { e =>
      if (e.readonly) ChunkStore.load(spark, e.path, readonly = true, e.maxBytes, params)
      else if (ChunkStore.isStore(spark, e.path)) ChunkStore.load(spark, e.path, readonly = false, e.maxBytes, params)
      else ChunkStore.init(spark, e.path, e.maxBytes, params)
    }
    new Lake(spark, config, stores)
  }
}
