package graft.multimodal

import graft.GraftSession.table
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.6 — multimodal columns.
  *
  * Media payloads are opaque `binary` columns with a typed metadata
  * struct alongside; decode / feature-extraction runs as batched
  * per-partition processing (the Scala analog of Arrow-batched
  * `mapInPandas`): partition → fixed-size batches → decoder → typed
  * rows. The Spark-side plumbing (schema, partitioning, batch shape,
  * encoders) is real and tested; the decoder itself is a
  * clearly-marked STUB (this container has no image/audio codecs) —
  * swapping in a real JNI/FFmpeg decoder changes only `decodeBatch`.
  *
  * The test tables carry no binary media, so the payload is the
  * document text cast to binary — byte-identical semantics to a real
  * blob column for everything exercised here.
  */
object Multimodal {

  /** Typed row for a media payload entering the pipeline. */
  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])

  /** Typed row leaving the (stub) decoder. */
  final case class MediaFeatures(
      doc_id: Long,
      kind: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      brightness: Double,
  )

  /** Batch size for the per-partition decode loop (the Arrow-batch
    * analog; bounds decoder memory independent of partition size).
    */
  val DecodeBatchSize = 64

  /** STUB decoder: deterministic fake "decode" of a media batch.
    *
    * Real implementation would hand `batch.map(_.payload)` to a codec
    * (libjpeg/FFmpeg) here; everything around it — batching, schema,
    * null-safety, partition layout — is production plumbing. The fake
    * derives dimensions from the first payload bytes and a brightness
    * proxy from the byte mean, all deterministic.
    */
  def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { m =>
      val b = m.payload
      val w = if (b.length > 0) (b(0) & 0xff) + 1 else 1
      val h = if (b.length > 1) (b(1) & 0xff) + 1 else 1
      val frames = if (m.kind == "vid") 1 + b.length / 64 else 1
      val brightness =
        if (b.isEmpty) 0.0
        else b.foldLeft(0L)((acc, x) => acc + (x & 0xff)).toDouble / b.length
      MediaFeatures(m.doc_id, m.kind, b.length.toLong, w, h, frames, brightness)
    }

  /** The documents table as a media table: payload + metadata struct,
    * kind derived deterministically so all three modalities occur.
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")
      .select(
        col("doc_id"),
        expr("CASE WHEN doc_id % 3 = 0 THEN 'img' WHEN doc_id % 3 = 1 THEN 'aud' ELSE 'vid' END").as("kind"),
        col("text").cast(BinaryType).as("payload"),
      )

  /** §2.6 #34 — metadata extraction over the opaque payload: pure
    * column expressions, fully oracle-checkable.
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(
        col("doc_id"),
        col("kind"),
        octet_length(col("payload")).cast(LongType).as("n_bytes"),
        sha2(col("payload"), 256).as("payload_sha"),
      )
      .orderBy("doc_id")

  val multimodalMetaSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'img' WHEN doc_id % 3 = 1 THEN 'aud' ELSE 'vid' END AS kind,
      |  CAST(len(text) AS BIGINT) AS n_bytes,
      |  sha256(text) AS payload_sha
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** §2.6 #35 — batched per-partition decode + feature extraction.
    * The decode itself is the stub above, but its outputs are
    * deterministic functions of the payload bytes, so the whole
    * pipeline is still oracle-checkable (width/height = first byte
    * values + 1; brightness = byte mean).
    */
  def multimodalFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media: Dataset[MediaRow] = mediaTable(spark, dir).as[MediaRow]
    media
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap(b => decodeBatch(b.toSeq)))
      .toDF()
      .orderBy("doc_id")
  }

  val multimodalFeaturesSql: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'img' WHEN doc_id % 3 = 1 THEN 'aud' ELSE 'vid' END AS kind,
      |  CAST(len(text) AS BIGINT) AS n_bytes,
      |  CAST(ord(substring(text, 1, 1)) + 1 AS INT) AS width,
      |  CAST(ord(substring(text, 2, 1)) + 1 AS INT) AS height,
      |  CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + len(text) // 64 ELSE 1 END AS INT) AS n_frames,
      |  CAST(list_sum(list_transform(range(1, len(text) + 1), i -> ord(substring(text, CAST(i AS INT), 1)))) AS DOUBLE) / len(text) AS brightness
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Typed row for one sampled video frame. */
  final case class FrameRow(doc_id: Long, frame_idx: Long, n_frames: Long, luma: Double)

  /** Frames sampled per video — a budget, not a stride: real pipelines
    * cap decoder work per asset regardless of media length.
    */
  val MaxFrameSamples = 8

  /** STUB frame sampler: deterministic fake per-frame decode. A real
    * implementation seeks the codec to the sampled frame here; the
    * sampling schedule (budgeted stride), batch shape, and typed
    * output schema are the production plumbing. The fake's "luma" is
    * the byte mean of the frame's 64-byte slice.
    */
  def sampleFramesBatch(batch: Seq[MediaRow]): Seq[FrameRow] =
    batch.filter(_.kind == "vid").flatMap { m =>
      val frames = 1L + m.payload.length / 64
      val stride = math.max(1L, math.ceil(frames.toDouble / MaxFrameSamples).toLong)
      (0L until frames by stride).map { f =>
        val from = (f * 64).toInt
        val slice = m.payload.slice(from, math.min(from + 64, m.payload.length))
        val luma =
          if (slice.isEmpty) 0.0
          else slice.foldLeft(0L)((acc, x) => acc + (x & 0xff)).toDouble / slice.length
        FrameRow(m.doc_id, f, frames, luma)
      }
    }

  /** §2.6 #35b — frame sampling: one row per sampled frame of each
    * `vid` payload, ≤ [[MaxFrameSamples]] per video. Same batched
    * mapPartitions shape as [[multimodalFeatures]]; the explode happens
    * inside the decoder (bounded by the sample budget), so output size
    * is O(videos × budget) at any media length.
    */
  def multimodalFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRow]
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap(b => sampleFramesBatch(b.toSeq)))
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  val multimodalFramesSql: String =
    """WITH v AS (
      |  SELECT doc_id, text, CAST(1 + len(text) // 64 AS BIGINT) AS n_frames
      |  FROM documents WHERE doc_id % 3 = 2
      |), s AS (
      |  SELECT doc_id, text, n_frames,
      |    greatest(1, CAST(ceil(CAST(n_frames AS DOUBLE) / 8) AS BIGINT)) AS stride
      |  FROM v
      |), f AS (
      |  SELECT doc_id, n_frames, unnest(range(0, n_frames, stride)) AS frame_idx, text FROM s
      |), sl AS (
      |  SELECT doc_id, frame_idx, n_frames,
      |    substring(text, CAST(frame_idx * 64 + 1 AS INT), 64) AS sub
      |  FROM f
      |)
      |SELECT doc_id, frame_idx, n_frames,
      |  CASE WHEN len(sub) = 0 THEN 0.0
      |       ELSE CAST(list_sum(list_transform(range(1, len(sub) + 1), i -> ord(substring(sub, CAST(i AS INT), 1)))) AS DOUBLE) / len(sub)
      |  END AS luma
      |FROM sl
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** §2.6 #34b — media dedup by content address: the binary-column
    * twin of the document/store dedup family (the same sha-256
    * grouping a media-heavy training pipeline runs before decode, so
    * duplicate assets are fetched/decoded once). One hash shuffle with
    * map-side combine; per-kind stats ride the same aggregate.
    */
  def multimodalDedup(spark: SparkSession, dir: String): DataFrame =
    multimodalDedupOn(mediaTable(spark, dir))

  /** [[multimodalDedup]] over an arbitrary (doc_id, kind, payload)
    * frame.
    */
  def multimodalDedupOn(media: DataFrame): DataFrame =
    media
      .groupBy(sha2(col("payload"), 256).as("payload_sha"))
      .agg(
        count(lit(1)).as("n_copies"),
        min(col("doc_id")).as("keep_id"),
        min(octet_length(col("payload")).cast(LongType)).as("n_bytes"),
        concat_ws(",", array_sort(collect_set(col("kind")))).as("kinds"),
      )
      .withColumn("dup_bytes", (col("n_copies") - 1) * col("n_bytes"))
      .orderBy("payload_sha")

  val multimodalDedupSql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'img' WHEN doc_id % 3 = 1 THEN 'aud' ELSE 'vid' END AS kind,
      |    text AS payload
      |  FROM documents
      |)
      |SELECT sha256(payload) AS payload_sha,
      |  count(*) AS n_copies,
      |  min(doc_id) AS keep_id,
      |  CAST(min(len(payload)) AS BIGINT) AS n_bytes,
      |  array_to_string(list_sort(list_distinct(list(kind))), ',') AS kinds,
      |  (count(*) - 1) * CAST(min(len(payload)) AS BIGINT) AS dup_bytes
      |FROM m
      |GROUP BY sha256(payload)
      |ORDER BY payload_sha""".stripMargin

  /** §2.6 #34c — perceptual hash of every payload: 62-bit block-parity
    * hash (see `graft.functions.BlockParityHash` — the block-mean-hash
    * structure of a real pHash with a deterministic byte-sum stub
    * feature), computed map-side by one codegen kernel, zero shuffle.
    * Fully oracle-checkable: the hash is a pure byte function the SQL
    * replays with the same j·62/n block mapping.
    */
  def multimodalPhash(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(
        col("doc_id"),
        col("kind"),
        graft.functions.ArrayExprs.blockParityHash(col("payload")).as("phash"),
      )
      .orderBy("doc_id")

  val multimodalPhashSql: String =
    """WITH b AS (
      |  SELECT doc_id, len(text) AS n,
      |    unnest(range(0, len(text))) AS j, text
      |  FROM documents
      |), sums AS (
      |  SELECT doc_id, CAST(j * 62 // n AS INT) AS blk,
      |    sum(ord(substring(text, CAST(j + 1 AS INT), 1))) AS s
      |  FROM b GROUP BY doc_id, CAST(j * 62 // n AS INT)
      |), bits AS (
      |  SELECT doc_id, sum(CAST(s % 2 AS BIGINT) << blk) AS phash FROM sums GROUP BY doc_id
      |)
      |SELECT d.doc_id,
      |  CASE WHEN d.doc_id % 3 = 0 THEN 'img' WHEN d.doc_id % 3 = 1 THEN 'aud' ELSE 'vid' END AS kind,
      |  CAST(coalesce(bits.phash, 0) AS BIGINT) AS phash
      |FROM documents d LEFT JOIN bits ON d.doc_id = bits.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** The phash pair corpus: every payload plus a deterministic
    * "re-encoded copy" of every 7th one (doc_id+100000, one byte at
    * position len/3 bit-flipped — the same-length byte noise a real
    * re-encode produces, spliced so the SQL oracle replays it
    * exactly). Same-length noise is the case perceptual hashing
    * exists for; the corpus' own near-dups are length-changing edits,
    * which shift every downstream block and land at hamming ≥ 14 —
    * correctly OUTSIDE a positional block hash's match radius.
    */
  def phashCorpus(spark: SparkSession, dir: String): DataFrame = {
    val d = table(spark, dir, "documents")
    val flipped = concat(
      substring(col("text"), lit(1), (length(col("text")) / 3).cast(IntegerType)),
      expr("char(ascii(substring(text, CAST(length(text) / 3 AS INT) + 1, 1)) ^ 1)"),
      expr("substring(text, CAST(length(text) / 3 AS INT) + 2)"),
    )
    d.select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
      .unionByName(
        d.filter(col("doc_id") % 7 === 0 && length(col("text")) >= 3)
          .select((col("doc_id") + 100000).as("doc_id"), flipped.cast(BinaryType).as("payload")))
  }

  /** §2.6 #34d — perceptual near-dup pairs over [[phashCorpus]]:
    * payloads within hamming distance 3 of each other's phash.
    * Candidates come from the 4-way segment pigeonhole (3 differing
    * bits cannot touch all 4 disjoint segments, so every true pair
    * shares at least one exact segment — a lossless blocking; the
    * join shuffles (segment, value) keys, never the O(n²) pair
    * space). The oracle is the brute-force all-pairs hamming scan,
    * so passing proves the blocking lossless.
    */
  def multimodalPhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val hashed = phashCorpus(spark, dir).select(
      col("doc_id"),
      graft.functions.ArrayExprs.blockParityHash(col("payload")).as("phash"),
    )
    val segs = hashed.select(
      col("doc_id"),
      col("phash"),
      explode(
        array((0 until 4).map(j =>
          struct(lit(j).as("seg_idx"), pmod(shiftright(col("phash"), j * 16), lit(65536L)).as("seg_val"))): _*)
      ).as("seg"),
    ).select(col("doc_id"), col("phash"), col("seg.seg_idx").as("seg_idx"), col("seg.seg_val").as("seg_val"))
    segs
      .select(col("doc_id").as("doc_a"), col("phash").as("ph_a"), col("seg_idx"), col("seg_val"))
      .join(
        segs.select(col("doc_id").as("doc_b"), col("phash").as("ph_b"), col("seg_idx"), col("seg_val")),
        Seq("seg_idx", "seg_val"),
      )
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast(LongType).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("doc_a", "doc_b")
  }

  val multimodalPhashPairsSql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id,
      |    substring(text, 1, CAST(len(text) // 3 AS INT))
      |      || chr(xor(ord(substring(text, CAST(len(text) // 3 AS INT) + 1, 1)), 1))
      |      || substring(text, CAST(len(text) // 3 AS INT) + 2) AS text
      |  FROM documents WHERE doc_id % 7 = 0 AND len(text) >= 3
      |), b AS (
      |  SELECT doc_id, len(text) AS n,
      |    unnest(range(0, len(text))) AS j, text
      |  FROM corpus
      |), sums AS (
      |  SELECT doc_id, CAST(j * 62 // n AS INT) AS blk,
      |    sum(ord(substring(text, CAST(j + 1 AS INT), 1))) AS s
      |  FROM b GROUP BY doc_id, CAST(j * 62 // n AS INT)
      |), bits AS (
      |  SELECT doc_id, sum(CAST(s % 2 AS BIGINT) << blk) AS phash FROM sums GROUP BY doc_id
      |), h AS (
      |  SELECT c.doc_id, CAST(coalesce(bits.phash, 0) AS BIGINT) AS phash
      |  FROM corpus c LEFT JOIN bits ON c.doc_id = bits.doc_id
      |)
      |SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b,
      |  CAST(bit_count(xor(a.phash, b2.phash)) AS BIGINT) AS hamming
      |FROM h a JOIN h b2 ON a.doc_id < b2.doc_id
      |WHERE bit_count(xor(a.phash, b2.phash)) <= 3
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Typed row for one output cell of the resize grid. */
  final case class CellRow(doc_id: Long, cy: Int, cx: Int, n_px: Long, mean_val: Long)

  /** Resize grid side: every image downsamples to ≤ Grid×Grid cells. */
  val ResizeGrid = 4

  /** STUB resizer: deterministic average-pool "resize" of the fake
    * w×h byte image (pixel(y,x) = payload[(y·w + x) mod len]) to a
    * [[ResizeGrid]]² grid — cell (cy,cx) covers rows [⌊cy·h/G⌋,
    * ⌊(cy+1)·h/G⌋) × the analogous columns, value = integer floor-mean
    * of covered bytes. A real implementation hands the decoded frame
    * to a SIMD scaler here; the batch shape, integer-exact pooling,
    * and long-form output schema are the production plumbing. Cells
    * that cover zero pixels (h or w < G) are skipped in both engines.
    */
  def resizeBatch(batch: Seq[MediaRow]): Seq[CellRow] =
    batch.filter(_.kind == "img").flatMap { m =>
      val b = m.payload
      if (b.isEmpty) Seq.empty
      else {
        val w = (b(0) & 0xff) + 1
        val h = if (b.length > 1) (b(1) & 0xff) + 1 else 1
        def px(y: Int, x: Int): Long = (b((y * w + x) % b.length) & 0xff).toLong
        for {
          cy <- 0 until ResizeGrid
          cx <- 0 until ResizeGrid
          r0 = cy * h / ResizeGrid; r1 = (cy + 1) * h / ResizeGrid
          c0 = cx * w / ResizeGrid; c1 = (cx + 1) * w / ResizeGrid
          n = (r1 - r0).toLong * (c1 - c0)
          if n > 0
        } yield {
          var s = 0L
          var y = r0
          while (y < r1) { var x = c0; while (x < c1) { s += px(y, x); x += 1 }; y += 1 }
          CellRow(m.doc_id, cy, cx, n, s / n)
        }
      }
    }

  /** §2.6 #35c — image resize / downsample: every `img` payload
    * average-pooled to the fixed grid in the same batched
    * mapPartitions shape as [[multimodalFeatures]] — output is
    * O(images × G²) regardless of resolution, the property that lets
    * a thumbnail pass run over petabytes of media without the decoded
    * pixels ever hitting a shuffle. Integer floor-mean pooling keeps
    * it bit-exact, so the whole pipeline is DuckDB-oracled despite
    * the decode stub.
    */
  def multimodalResize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRow]
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap(b => resizeBatch(b.toSeq)))
      .toDF()
      .orderBy("doc_id", "cy", "cx")
  }

  val multimodalResizeSql: String =
    """WITH img AS (
      |  SELECT doc_id, text,
      |    len(text) AS len,
      |    ord(substring(text, 1, 1)) + 1 AS w,
      |    CASE WHEN len(text) > 1 THEN ord(substring(text, 2, 1)) + 1 ELSE 1 END AS h
      |  FROM documents WHERE doc_id % 3 = 0 AND len(text) > 0
      |), cells AS (
      |  SELECT doc_id, text, len, w, h,
      |    unnest(range(0, 4)) AS cy
      |  FROM img
      |), cells2 AS (
      |  SELECT doc_id, text, len, w, h, cy, unnest(range(0, 4)) AS cx
      |  FROM cells
      |), bounds AS (
      |  SELECT doc_id, text, len, w, h, cy, cx,
      |    cy * h // 4 AS r0, (cy + 1) * h // 4 AS r1,
      |    cx * w // 4 AS c0, (cx + 1) * w // 4 AS c1
      |  FROM cells2
      |), pooled AS (
      |  SELECT doc_id, CAST(cy AS INT) AS cy, CAST(cx AS INT) AS cx,
      |    (r1 - r0) * (c1 - c0) AS n_px,
      |    list_sum(flatten(list_transform(range(r0, r1), y ->
      |      list_transform(range(c0, c1), x ->
      |        ord(substring(text, CAST((y * w + x) % len + 1 AS INT), 1)))))) AS s
      |  FROM bounds
      |  WHERE r1 > r0 AND c1 > c0
      |)
      |SELECT doc_id, cy, cx, CAST(n_px AS BIGINT) AS n_px,
      |  CAST(s // n_px AS BIGINT) AS mean_val
      |FROM pooled
      |ORDER BY doc_id, cy, cx""".stripMargin

  // ------------------------------------------------------ audio energy

  /** Typed row leaving the (stub) audio decoder: per-asset energy
    * profile from the frame-windowed VAD pass.
    */
  final case class AudioFeatures(
      doc_id: Long,
      n_samples: Long,
      n_frames: Long,
      n_active: Long,
      peak_avg: Long,
      active_ppm: Long,
  )

  /** Samples per analysis frame (≈16 ms at 16 kHz — the standard VAD
    * frame).
    */
  val AudioFrameSamples = 256

  /** A frame whose mean per-sample energy reaches this is "active"
    * (speech/sound vs silence in a real decoder).
    */
  val AudioActiveThreshold = 2500L

  /** STUB audio decode: payload bytes as unsigned 8-bit PCM, centered
    * at 128. A real implementation hands the batch to a PCM/opus
    * decoder here; the frame windowing, integer energy math,
    * activity gate, and typed output schema are the production
    * plumbing and identical for real samples. All integer: per frame
    * energy = Σ(v²), mean = energy div frame_len (partial tail frame
    * normalized by ITS length, so short tails are comparable).
    */
  def decodeAudioBatch(batch: Seq[MediaRow]): Seq[AudioFeatures] =
    batch.filter(m => m.kind == "aud" && m.payload.nonEmpty).map { m =>
      val avgs = m.payload.grouped(AudioFrameSamples).map { fr =>
        val energy = fr.foldLeft(0L) { (acc, b) =>
          val v = (b & 0xff) - 128L
          acc + v * v
        }
        energy / fr.length
      }.toVector
      val nActive = avgs.count(_ >= AudioActiveThreshold).toLong
      AudioFeatures(m.doc_id, m.payload.length.toLong, avgs.length.toLong,
        nActive, avgs.max, nActive * 1000000L / avgs.length)
    }

  /** §2.6 #35d — audio activity detection (the VAD/energy-gate pass an
    * ASR/TTS data pipeline runs to drop silence and score assets
    * before the expensive transcription stage): every `aud` payload is
    * windowed into [[AudioFrameSamples]]-sample frames, each frame's
    * integer mean energy gates it active/silent, and the per-asset
    * profile (frame counts, active share in ppm, peak frame energy)
    * comes back as one typed row. Same batched mapPartitions decode
    * shape as [[multimodalFeatures]] — swapping in a real codec
    * changes only [[decodeAudioBatch]].
    *
    * Scale shape: pure map-side (no shuffle before the final
    * orderBy); decoder memory is bounded by [[DecodeBatchSize]] ×
    * frame buffer regardless of partition size. All arithmetic is
    * int64, so the whole pipeline is DuckDB-oracle-checkable
    * byte-for-byte.
    */
  def multimodalAudio(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRow]
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap(b => decodeAudioBatch(b.toSeq)))
      .toDF()
      .orderBy("doc_id")
  }

  val multimodalAudioSql: String =
    """WITH a AS (
      |  SELECT doc_id, len(text) AS n,
      |    unnest(range(0, len(text))) AS j, text
      |  FROM documents WHERE doc_id % 3 = 1 AND len(text) > 0
      |), v AS (
      |  SELECT doc_id, j // 256 AS frame,
      |    CAST(ord(substring(text, CAST(j + 1 AS INT), 1)) - 128 AS BIGINT) AS s
      |  FROM a
      |), fr AS (
      |  SELECT doc_id, frame, count(*) AS fn, sum(s * s) AS energy
      |  FROM v GROUP BY 1, 2
      |), fa AS (
      |  SELECT doc_id, frame, fn, CAST(energy // fn AS BIGINT) AS avg_e FROM fr
      |)
      |SELECT doc_id,
      |  CAST(sum(fn) AS BIGINT) AS n_samples,
      |  CAST(count(*) AS BIGINT) AS n_frames,
      |  CAST(sum(CASE WHEN avg_e >= 2500 THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
      |  CAST(max(avg_e) AS BIGINT) AS peak_avg,
      |  CAST(sum(CASE WHEN avg_e >= 2500 THEN 1 ELSE 0 END) * 1000000 // count(*)
      |    AS BIGINT) AS active_ppm
      |FROM fa
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  // ------------------------------------------------- audio fingerprint

  /** Typed landmark row leaving the (stub) fingerprint extractor:
    * one constellation hash anchored at frame `t` of `doc_id`.
    */
  final case class AudioLandmark(doc_id: Long, hash: Long, t: Long)

  /** Samples per fingerprint frame (shorter than the VAD frame so a
    * few-KB asset still yields a usable constellation).
    */
  val AfpFrameSamples = 64

  /** Frequency bands per frame (a real extractor FFTs; the stub's
    * band b = samples at j % 4 == b, a deterministic stand-in with
    * the same shape).
    */
  val AfpBands = 4

  /** Landmarks per hash above which the hash is a STOP HASH — too
    * common to discriminate (the audio twin of stop-words; standard
    * in constellation matching). This is the scale guard: the
    * hash-keyed self-join can never exceed `cap²`/hash.
    */
  val AfpStopHashCap = 64L

  /** Minimum offset-aligned landmark count for a match. */
  val AfpMinAligned = 4L

  /** STUB fingerprint extraction (Shazam-style constellation,
    * Wang '03): frames → per-band integer mean energy → peak band +
    * log2-bucketed magnitude per frame → landmark hashes pairing
    * each frame's peak with its next two frames' peaks. All integer
    * (band mean = Σs² div n; magnitude bucket = bit length of
    * mean+1, i.e. DuckDB `length(bin(mean+1))`), so the entire
    * pipeline is DuckDB-oracle-checkable. A real extractor swaps the
    * band energies for FFT magnitudes; hashing, target zone, stop
    * hashes, and offset-histogram matching are unchanged.
    */
  def fingerprintBatch(batch: Seq[MediaRow]): Seq[AudioLandmark] =
    batch.filter(m => m.kind == "aud" && m.payload.nonEmpty).flatMap { m =>
      val peaks = m.payload.grouped(AfpFrameSamples).map { fr =>
        val e = Array.fill(AfpBands)(0L)
        val n = Array.fill(AfpBands)(0L)
        var j = 0
        while (j < fr.length) {
          val v = (fr(j) & 0xff) - 128L
          e(j % AfpBands) += v * v
          n(j % AfpBands) += 1
          j += 1
        }
        val means = Array.tabulate(AfpBands)(b => if (n(b) == 0) 0L else e(b) / n(b))
        // peak band: max mean, tie -> lowest band (deterministic)
        var pb = 0
        var bi = 1
        while (bi < AfpBands) { if (means(bi) > means(pb)) pb = bi; bi += 1 }
        val eq = math.min(15L, 64L - java.lang.Long.numberOfLeadingZeros(means(pb) + 1))
        (pb.toLong, eq)
      }.toVector
      for {
        i <- peaks.indices
        dt <- 1 to 2
        if i + dt < peaks.length
      } yield {
        val (b1, e1) = peaks(i)
        val (b2, e2) = peaks(i + dt)
        AudioLandmark(m.doc_id,
          (((b1 * AfpBands + b2) * 2 + (dt - 1)) * 16 + e1) * 16 + e2, i.toLong)
      }
    }

  /** §2.6 #35f — audio near-dup by constellation fingerprint: the
    * audio leg of the dedup family (pHash covers images; exact sha
    * covers byte-identical media). Landmarks from the batched stub
    * extractor, stop hashes dropped corpus-wide, then the classic
    * offset-histogram match: two assets sharing ≥ [[AfpMinAligned]]
    * landmarks at ONE CONSISTENT time offset are near-dups — the
    * offset alignment is what separates real overlap (a clip, a
    * re-encode, a silence-padded copy) from coincidental hash hits.
    *
    * Scale shape: extraction is map-side batched (no per-byte
    * explode); the only wide ops are the hash-keyed self-join —
    * bounded per hash by the stop-hash cap, the dedup_minhash_lsh
    * band-bucket pattern — and two metadata-sized rollups. Output is
    * the matched-pair report (best offset, aligned count, total
    * cross hits), fully integer → DuckDB-hash-oracled.
    */
  def multimodalAfp(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lm = mediaTable(spark, dir).as[MediaRow]
      .mapPartitions(_.grouped(DecodeBatchSize).flatMap(b => fingerprintBatch(b.toSeq)))
      .toDF()
    val stop = lm.groupBy(col("hash")).count().filter(col("count") > AfpStopHashCap)
      .select(col("hash"))
    val keep = lm.join(broadcast(stop), Seq("hash"), "left_anti")
    val a = keep.select(col("hash"), col("doc_id").as("doc_a"), col("t").as("ta"))
    val b = keep.select(col("hash"), col("doc_id").as("doc_b"), col("t").as("tb"))
    a.join(b, Seq("hash"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), (col("ta") - col("tb")).as("offset"))
      .agg(count(lit(1)).as("aligned"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(
        // best offset: max aligned count, tie -> smallest offset
        max(struct(col("aligned"), (-col("offset")).as("no"))).as("m"),
        sum(col("aligned")).as("n_cross"),
      )
      .select(col("doc_a"), col("doc_b"),
        col("m.aligned").as("n_aligned"), (-col("m.no")).as("best_offset"),
        col("n_cross"))
      .filter(col("n_aligned") >= AfpMinAligned)
      .orderBy("doc_a", "doc_b")
  }

  val multimodalAfpSql: String =
    """WITH a AS (
      |  SELECT doc_id, unnest(range(0, len(text))) AS j, text
      |  FROM documents WHERE doc_id % 3 = 1 AND len(text) > 0
      |), v AS (
      |  SELECT doc_id, j // 64 AS frame, CAST(j % 4 AS BIGINT) AS band,
      |    CAST(ord(substring(text, CAST(j + 1 AS INT), 1)) - 128 AS BIGINT) AS s
      |  FROM a
      |), be AS (
      |  SELECT doc_id, frame, band, sum(s * s) // count(*) AS mean_e
      |  FROM v GROUP BY 1, 2, 3
      |), pk AS (
      |  SELECT doc_id, frame, band AS pb,
      |    least(15, length(bin(mean_e + 1))) AS eq
      |  FROM (
      |    SELECT doc_id, frame, band, mean_e,
      |      row_number() OVER (PARTITION BY doc_id, frame ORDER BY mean_e DESC, band) AS rk
      |    FROM be
      |  ) WHERE rk = 1
      |), lm AS (
      |  SELECT p1.doc_id,
      |    (((p1.pb * 4 + p2.pb) * 2 + (p2.frame - p1.frame - 1)) * 16 + p1.eq) * 16 + p2.eq AS hash,
      |    p1.frame AS t
      |  FROM pk p1 JOIN pk p2
      |    ON p1.doc_id = p2.doc_id AND p2.frame - p1.frame IN (1, 2)
      |), keep AS (
      |  SELECT * FROM lm WHERE hash NOT IN (
      |    SELECT hash FROM lm GROUP BY hash HAVING count(*) > 64
      |  )
      |), hits AS (
      |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, x.t - y.t AS off_t
      |  FROM keep x JOIN keep y ON x.hash = y.hash AND x.doc_id < y.doc_id
      |), ag AS (
      |  SELECT doc_a, doc_b, off_t, count(*) AS aligned
      |  FROM hits GROUP BY 1, 2, 3
      |)
      |SELECT doc_a, doc_b,
      |  CAST(aligned AS BIGINT) AS n_aligned,
      |  CAST(off_t AS BIGINT) AS best_offset,
      |  CAST(n_cross AS BIGINT) AS n_cross
      |FROM (
      |  SELECT doc_a, doc_b, off_t, aligned,
      |    sum(aligned) OVER (PARTITION BY doc_a, doc_b) AS n_cross,
      |    row_number() OVER (PARTITION BY doc_a, doc_b ORDER BY aligned DESC, off_t) AS rk
      |  FROM ag
      |) WHERE rk = 1 AND aligned >= 4
      |ORDER BY doc_a, doc_b""".stripMargin

  /** §2.6 #36 — end-to-end multimodal curation pipeline as ONE
    * declarative plan (the media twin of `pipeline_e2e`), over the
    * realistic dirty corpus ([[phashCorpus]]: payloads plus
    * re-encoded same-length copies): exact dedup by content address →
    * perceptual near-dup drop (a surviving payload is dropped when a
    * LOWER-id exact-dedup survivor sits within hamming ≤ 3 of its
    * pHash — candidates from the lossless 4-segment pigeonhole, never
    * the pair space) → minimum-size quality gate → survivors, with a
    * per-(stage, kind) lineage rollup (docs + bytes) so Σ of the
    * disposition stages pins back to the ingest row, the
    * pipeline_lineage discipline.
    *
    * Scale shape: one content-sha shuffle (exact dedup), one
    * (segment, value)-keyed shuffle (perceptual candidates), map-side
    * everything else; the rollup output is |stages|×|kinds| rows.
    */
  def multimodalE2e(spark: SparkSession, dir: String): DataFrame = {
    val MinBytes = 120L
    // the pipeline corpus = the phash corpus (re-encoded same-length
    // copies for the perceptual stage) PLUS byte-exact copies of every
    // 11th payload (the artifact the content-address stage exists
    // for — this corpus has near-dups but no natural byte-exact dups)
    val dirty = phashCorpus(spark, dir).unionByName(
      table(spark, dir, "documents").filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + 200000).as("doc_id"), col("text").cast(BinaryType).as("payload")))
    val base = dirty.select(
      col("doc_id"),
      expr("CASE WHEN doc_id % 3 = 0 THEN 'img' WHEN doc_id % 3 = 1 THEN 'aud' ELSE 'vid' END").as("kind"),
      octet_length(col("payload")).cast(LongType).as("n_bytes"),
      sha2(col("payload"), 256).as("sha"),
      graft.functions.ArrayExprs.blockParityHash(col("payload")).as("phash"),
    ) // no cache: the op returns a lazy plan, so a .cache() here could
      // only be unpersisted by the caller and leaked executor memory
      // for the session lifetime (r9 advisory); base is one scan +
      // map-side hashing, cheap to recompute for its two consumers
    val winners = base.groupBy(col("sha")).agg(min(col("doc_id")).as("winner"))
    val tagged = base.join(winners, Seq("sha"))
    val surv1 = tagged.filter(col("doc_id") === col("winner"))
      .select(col("doc_id"), col("phash"))
    val segs = surv1.select(
      col("doc_id"), col("phash"),
      explode(array((0 until 4).map(j =>
        struct(lit(j).as("seg_idx"), pmod(shiftright(col("phash"), j * 16), lit(65536L)).as("seg_val"))): _*)).as("seg"))
      .select(col("doc_id"), col("phash"), col("seg.seg_idx").as("seg_idx"), col("seg.seg_val").as("seg_val"))
    val dupBySmaller = segs
      .select(col("doc_id").as("doc_a"), col("phash").as("ph_a"), col("seg_idx"), col("seg_val"))
      .join(segs.select(col("doc_id").as("doc_b"), col("phash").as("ph_b"), col("seg_idx"), col("seg_val")),
        Seq("seg_idx", "seg_val"))
      .filter(col("doc_b") < col("doc_a"))
      .filter(bit_count(col("ph_a").bitwiseXOR(col("ph_b"))) <= 3)
      .select(col("doc_a").as("doc_id")).distinct()
    val disp = tagged
      .join(dupBySmaller.withColumn("pdup", lit(true)), Seq("doc_id"), "left")
      .withColumn("stage",
        when(col("doc_id") =!= col("winner"), "exact_dup")
          .when(coalesce(col("pdup"), lit(false)), "phash_dup")
          .when(col("n_bytes") < MinBytes, "too_small")
          .otherwise("survivor"))
    base.select(col("kind"), col("n_bytes")).withColumn("stage", lit("ingest"))
      .unionByName(disp.select(col("kind"), col("n_bytes"), col("stage")))
      .groupBy(col("stage"), col("kind"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_bytes")).as("sum_bytes"))
      .orderBy("stage", "kind")
  }

  val multimodalE2eSql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id,
      |    substring(text, 1, CAST(len(text) // 3 AS INT))
      |      || chr(xor(ord(substring(text, CAST(len(text) // 3 AS INT) + 1, 1)), 1))
      |      || substring(text, CAST(len(text) // 3 AS INT) + 2) AS text
      |  FROM documents WHERE doc_id % 7 = 0 AND len(text) >= 3
      |  UNION ALL
      |  SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id % 11 = 0
      |), m AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN 'img' WHEN doc_id % 3 = 1 THEN 'aud' ELSE 'vid' END AS kind,
      |    CAST(len(text) AS BIGINT) AS n_bytes, sha256(text) AS sha, text
      |  FROM corpus
      |), b AS (
      |  SELECT doc_id, len(text) AS n,
      |    unnest(range(0, len(text))) AS j, text
      |  FROM corpus
      |), sums AS (
      |  SELECT doc_id, CAST(j * 62 // n AS INT) AS blk,
      |    sum(ord(substring(text, CAST(j + 1 AS INT), 1))) AS s
      |  FROM b GROUP BY doc_id, CAST(j * 62 // n AS INT)
      |), bits AS (
      |  SELECT doc_id, sum(CAST(s % 2 AS BIGINT) << blk) AS phash FROM sums GROUP BY doc_id
      |), h AS (
      |  SELECT c.doc_id, CAST(coalesce(bits.phash, 0) AS BIGINT) AS phash
      |  FROM corpus c LEFT JOIN bits ON c.doc_id = bits.doc_id
      |), w AS (
      |  SELECT sha, min(doc_id) AS winner FROM m GROUP BY sha
      |), t AS (
      |  SELECT m.doc_id, m.kind, m.n_bytes, w.winner FROM m JOIN w USING (sha)
      |), sv AS (
      |  SELECT t.doc_id, h.phash FROM t JOIN h USING (doc_id) WHERE t.doc_id = t.winner
      |), pd AS (
      |  SELECT DISTINCT a.doc_id FROM sv a
      |  JOIN sv b2 ON b2.doc_id < a.doc_id AND bit_count(xor(a.phash, b2.phash)) <= 3
      |), disp AS (
      |  SELECT t.kind, t.n_bytes,
      |    CASE WHEN t.doc_id != t.winner THEN 'exact_dup'
      |         WHEN t.doc_id IN (SELECT doc_id FROM pd) THEN 'phash_dup'
      |         WHEN t.n_bytes < 120 THEN 'too_small'
      |         ELSE 'survivor' END AS stage
      |  FROM t
      |), all_ AS (
      |  SELECT kind, n_bytes, 'ingest' AS stage FROM m
      |  UNION ALL
      |  SELECT kind, n_bytes, stage FROM disp
      |)
      |SELECT stage, kind, count(*) AS n_docs, CAST(sum(n_bytes) AS BIGINT) AS sum_bytes
      |FROM all_ GROUP BY stage, kind
      |ORDER BY stage, kind""".stripMargin

  // ------------------------------------------------------ scene cuts

  /** Inter-frame luma jump that counts as a shot boundary in
    * [[multimodalScenes]]. The stub luma is a byte mean in [0, 255];
    * 16 ≈ a 6% brightness jump.
    */
  val SceneCutThreshold = 16.0

  /** §2.6 — shot-boundary detection + keyframe selection per video:
    * the storyboard pass a video-training pipeline runs right after
    * frame sampling (pick ONE representative frame per asset, count
    * scene cuts as a motion/medley signal). A frame starts a new
    * scene when its luma jumps more than [[SceneCutThreshold]] from
    * the previous SAMPLED frame; the keyframe is the argmax-jump
    * frame (first frame when only one sample exists), tie-broken by
    * the earliest index so selection is deterministic.
    *
    * Scale shape: rides [[multimodalFrames]]'s bounded explode (≤
    * [[MaxFrameSamples]] rows per video — decoded pixels never
    * shuffle, only (doc_id, idx, luma) rows), then two doc-partitioned
    * window passes over ≤ 8 rows per key. The luma delta compares
    * IEEE doubles produced by identical integer divisions on both
    * engines, so the cut decision is bit-identical cross-engine.
    */
  def multimodalScenes(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = multimodalFrames(spark, dir)
    val seq = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val scored = frames
      .withColumn("delta", abs(col("luma") - lag(col("luma"), 1).over(seq)))
    val pick = Window.partitionBy(col("doc_id"))
      .orderBy(col("delta").desc_nulls_last, col("frame_idx"))
    scored
      .withColumn("rk", row_number().over(pick))
      .groupBy(col("doc_id"))
      .agg(
        max(col("n_frames")).as("n_frames"),
        count(lit(1)).as("n_sampled"),
        (sum(when(col("delta") > SceneCutThreshold, 1L).otherwise(0L)) + 1L).as("n_scenes"),
        max(when(col("rk") === 1, col("frame_idx"))).as("keyframe_idx"),
        max(when(col("rk") === 1, coalesce(col("delta"), lit(0.0)))).as("keyframe_delta"),
      )
      .orderBy("doc_id")
  }

  val multimodalScenesSql: String =
    """WITH v AS (
      |  SELECT doc_id, text, CAST(1 + len(text) // 64 AS BIGINT) AS n_frames
      |  FROM documents WHERE doc_id % 3 = 2
      |), s AS (
      |  SELECT doc_id, text, n_frames,
      |    greatest(1, CAST(ceil(CAST(n_frames AS DOUBLE) / 8) AS BIGINT)) AS stride
      |  FROM v
      |), f AS (
      |  SELECT doc_id, n_frames, unnest(range(0, n_frames, stride)) AS frame_idx, text FROM s
      |), sl AS (
      |  SELECT doc_id, frame_idx, n_frames,
      |    substring(text, CAST(frame_idx * 64 + 1 AS INT), 64) AS sub
      |  FROM f
      |), lum AS (
      |  SELECT doc_id, frame_idx, n_frames,
      |    CASE WHEN len(sub) = 0 THEN 0.0
      |         ELSE CAST(list_sum(list_transform(range(1, len(sub) + 1), i -> ord(substring(sub, CAST(i AS INT), 1)))) AS DOUBLE) / len(sub)
      |    END AS luma
      |  FROM sl
      |), d AS (
      |  SELECT doc_id, frame_idx, n_frames, luma,
      |    abs(luma - lag(luma) OVER (PARTITION BY doc_id ORDER BY frame_idx)) AS delta
      |  FROM lum
      |), rk AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY delta DESC NULLS LAST, frame_idx) AS rk
      |  FROM d
      |)
      |SELECT doc_id, max(n_frames) AS n_frames, CAST(count(*) AS BIGINT) AS n_sampled,
      |  CAST(sum(CASE WHEN delta > 16.0 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS n_scenes,
      |  max(CASE WHEN rk = 1 THEN frame_idx END) AS keyframe_idx,
      |  max(CASE WHEN rk = 1 THEN coalesce(delta, 0.0) END) AS keyframe_delta
      |FROM rk
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_scenes" -> (multimodalScenes _),
    "multimodal_e2e" -> (multimodalE2e _),
    "multimodal_resize" -> (multimodalResize _),
    "multimodal_audio" -> (multimodalAudio _),
    "multimodal_afp" -> (multimodalAfp _),
    "multimodal_phash" -> (multimodalPhash _),
    "multimodal_phash_pairs" -> (multimodalPhashPairs _),
    "multimodal_meta" -> (multimodalMeta _),
    "multimodal_features" -> (multimodalFeatures _),
    "multimodal_frames" -> (multimodalFrames _),
    "multimodal_dedup" -> (multimodalDedup _),
  )

  val oracles: Map[String, String] = Map(
    "multimodal_scenes" -> multimodalScenesSql,
    "multimodal_e2e" -> multimodalE2eSql,
    "multimodal_resize" -> multimodalResizeSql,
    "multimodal_audio" -> multimodalAudioSql,
    "multimodal_afp" -> multimodalAfpSql,
    "multimodal_phash" -> multimodalPhashSql,
    "multimodal_phash_pairs" -> multimodalPhashPairsSql,
    "multimodal_meta" -> multimodalMetaSql,
    "multimodal_dedup" -> multimodalDedupSql,
    "multimodal_features" -> multimodalFeaturesSql,
    "multimodal_frames" -> multimodalFramesSql,
  )
}
