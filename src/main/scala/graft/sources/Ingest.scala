package graft.sources

import graft.lake.{Lake, PutResult}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File ingestion into the content-addressed lake and format-flexible
  * table reads (SURVEY.md §2.1 — the "files in, blobs addressed" flow
  * the reference exposes through put_blob on file contents).
  */
object Ingest {

  /** Whole files → content-addressed blobs. Uses Spark's binaryFile
    * source (distributed, no driver-side reads); returns the put
    * summary plus a (path → blob_hash) mapping so callers can build a
    * name index over the content-addressed store.
    */
  def ingestFiles(lake: Lake, glob: String): (PutResult, DataFrame) = {
    val files = binaryFiles(lake.spark, glob)
      .select(col("path"), col("content").as("data"))
    val res = lake.put(files.select(col("data")))
    val mapping = files.select(col("path"), sha2(col("data"), 256).as("blob_hash"))
    (res, mapping)
  }

  /** binaryFile scan of `dir/<glob>`. A glob embedded IN the load path
    * works, but Spark's FileStreamSink.hasMetadata probes the literal
    * path first and logs its expected FileNotFoundException as a
    * 40-line WARN stack trace on every first read — noise that buries
    * real failures in CI logs. Splitting the glob into pathGlobFilter
    * keeps the load path a real directory, so the probe succeeds
    * silently; same files, same distributed scan.
    *
    * Latent constraint (same for AvroBridge.readAvro): load(dir) +
    * pathGlobFilter HONORS a `_spark_metadata` FileStreamSink log if
    * one ever exists under `dir` — the scan would silently restrict
    * to sink-committed files, where the old glob-in-path form bypassed
    * the probe entirely. No graft writer produces streaming-sink
    * directories, so we guard by detection: fall back to the
    * glob-in-path form (and its one-time WARN noise) rather than
    * silently dropping files.
    */
  private[graft] def binaryFiles(spark: SparkSession, glob: String): DataFrame = {
    val slash = glob.lastIndexOf('/')
    val (dir, last) =
      if (slash < 0) (".", glob) else (glob.substring(0, slash), glob.substring(slash + 1))
    if (last.exists("*?[{".contains(_)) && !hasStreamSinkLog(spark, dir))
      spark.read.format("binaryFile").option("pathGlobFilter", last).load(dir)
    else spark.read.format("binaryFile").load(glob)
  }

  /** True iff `dir/_spark_metadata` exists — see [[binaryFiles]]. */
  private[graft] def hasStreamSinkLog(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir, "_spark_metadata")
    try p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    catch { case _: Exception => false }
  }

  /** Extension-dispatched structured read (parquet/csv/json) with the
    * settings that keep semantics stable across engines: explicit
    * header handling and schema inference for csv, multiline off for
    * json (line-delimited = splittable at scale).
    */
  def readAuto(spark: SparkSession, path: String): DataFrame = {
    val lower = path.toLowerCase
    if (lower.endsWith(".parquet")) spark.read.parquet(path)
    else if (lower.endsWith(".orc")) spark.read.orc(path)
    else if (lower.endsWith(".avro")) AvroBridge.readAvro(spark, path)
    else if (lower.endsWith(".csv"))
      spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    else if (lower.endsWith(".json") || lower.endsWith(".jsonl")) spark.read.json(path)
    else spark.read.format("binaryFile").load(path)
  }

  /** Export a DataFrame to a sink format with optional partition
    * columns (the write side of the source matrix).
    */
  def writeAuto(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val lower = path.toLowerCase
    val w0 = df.write.mode("overwrite")
    val w = if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0
    if (lower.endsWith(".csv")) w.option("header", "true").csv(path)
    else if (lower.endsWith(".json") || lower.endsWith(".jsonl")) w.json(path)
    else if (lower.endsWith(".orc")) w.orc(path)
    else if (lower.endsWith(".avro")) {
      // AvroBridge has no partitionBy leg (no connector in this env);
      // partitioned avro exports repartition upstream instead
      require(partitionBy.isEmpty, "avro sink does not support partitionBy")
      AvroBridge.writeAvro(df, path)
    } else w.parquet(path)
  }

  /** Fixed per-session scratch root: one dir per Spark application
    * (keyed by appId so concurrent sessions don't collide), deleted
    * recursively by a JVM shutdown hook. A fresh createTempDirectory
    * per invocation would accumulate a full table copy in /tmp on
    * every bench/verify run and never reclaim it.
    */
  private[graft] def scratchDir(spark: SparkSession): String = {
    val root = java.nio.file.Paths.get(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      s"graft-scratch-${spark.sparkContext.applicationId}")
    if (hooked.add(root.toString)) {
      java.lang.Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(p: java.io.File): Unit = {
          Option(p.listFiles).foreach(_.foreach(rm)); p.delete(): Unit
        }
        rm(root.toFile)
      }))
    }
    root.toString
  }
  private val hooked = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** named query: ORC sink+source round-trip — `documents` is written
    * to ORC and read back; the projection must equal reading the
    * parquet original (which is exactly what the DuckDB oracle does).
    * Columnar-format interchange is table stakes for a lake engine;
    * ORC ships in Spark, so the round-trip costs one write+scan.
    */
  def qOrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = scratchDir(spark) + "/documents.orc"
    writeAuto(graft.GraftSession.table(spark, dir, "documents"), tmp)
    readAuto(spark, tmp)
      .select(
        col("doc_id"),
        col("source"),
        md5(col("text")).as("text_md5"),
        octet_length(col("text")).cast("long").as("n_bytes"),
      )
      .orderBy("doc_id")
  }

  val qOrcRoundtripSql: String =
    """SELECT doc_id, source, md5(text) AS text_md5, CAST(strlen(text) AS BIGINT) AS n_bytes
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** named query: Avro sink+source round-trip — `documents` is written
    * as Avro object container files via [[AvroBridge]] (the public
    * `org.apache.avro` API; the spark-avro connector module is absent
    * in this environment) and read back distributed; the projection
    * must equal reading the parquet original (the DuckDB oracle). The
    * md5 pins that Avro's UTF-8 string encoding round-trips the text
    * byte-exactly, and nullable-union columns survive (every testdata
    * column is nullable).
    */
  def qAvroRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = scratchDir(spark) + "/documents.avro"
    writeAuto(graft.GraftSession.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"), col("n_chars")), tmp)
    readAuto(spark, tmp)
      .select(
        col("doc_id"),
        col("source"),
        md5(col("text")).as("text_md5"),
        col("n_chars"),
      )
      .orderBy("doc_id")
  }

  val qAvroRoundtripSql: String =
    """SELECT doc_id, source, md5(text) AS text_md5, n_chars
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** named query: JSONL (line-delimited JSON) sink+source round-trip —
    * the interchange format half the world's corpus pipelines emit.
    * `documents` is written as JSONL and read back with schema
    * inference; the projection must equal reading the parquet original
    * (the DuckDB oracle). Line-delimited (multiline off) is the
    * splittable-at-scale framing; JSON string escaping must round-trip
    * embedded newlines/quotes byte-exactly, which the md5 pins.
    */
  def qJsonlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = scratchDir(spark) + "/documents.jsonl"
    writeAuto(graft.GraftSession.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text")), tmp)
    readAuto(spark, tmp)
      .select(
        col("doc_id"),
        col("source"),
        md5(col("text")).as("text_md5"),
        octet_length(col("text")).cast("long").as("n_bytes"),
      )
      .orderBy("doc_id")
  }

  val qJsonlRoundtripSql: String =
    """SELECT doc_id, source, md5(text) AS text_md5, CAST(strlen(text) AS BIGINT) AS n_bytes
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** named query: CSV sink+source round-trip with header + schema
    * inference — the third leg of the interchange matrix next to ORC
    * and JSONL. The writer quotes embedded commas/quotes; the caveat
    * a production pipeline must know: a CSV reader cannot distinguish
    * an empty string from NULL (this corpus has neither) and a
    * newline inside an unquoted field breaks line splitting — JSONL
    * is the framing for free-text at scale, CSV for the flat
    * numeric/categorical exports this query round-trips.
    */
  def qCsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = scratchDir(spark) + "/documents.csv"
    writeAuto(graft.GraftSession.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"), col("n_chars")), tmp)
    readAuto(spark, tmp)
      .select(
        col("doc_id").cast("long").as("doc_id"),
        col("source"),
        md5(col("text")).as("text_md5"),
        col("n_chars").cast("long").as("n_chars"),
      )
      .orderBy("doc_id")
  }

  val qCsvRoundtripSql: String =
    """SELECT doc_id, source, md5(text) AS text_md5, n_chars
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** named query: XML sink+source round-trip — Spark 4's built-in XML
    * data source (one `<doc>` element per row, fields as child
    * elements, reserved characters entity-escaped by the writer).
    * Fourth leg of the interchange matrix; XML is what legacy feeds
    * and document-export systems still emit. The md5 pins that entity
    * escaping round-trips the text byte-exactly; the oracle reads the
    * parquet original. Same splittable-framing caveat as JSONL: the
    * reader parallelizes by element within each file, and the write
    * is one file per task — a distributed sink, no driver funnel.
    */
  def qXmlRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = scratchDir(spark) + "/documents.xml"
    graft.GraftSession.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .write.mode("overwrite").format("xml").option("rowTag", "doc").save(tmp)
    spark.read.format("xml").option("rowTag", "doc").load(tmp)
      .select(
        col("doc_id").cast("long").as("doc_id"),
        col("source"),
        md5(col("text")).as("text_md5"),
        octet_length(col("text")).cast("long").as("n_bytes"),
      )
      .orderBy("doc_id")
  }

  val qXmlRoundtripSql: String =
    """SELECT doc_id, source, md5(text) AS text_md5, CAST(strlen(text) AS BIGINT) AS n_bytes
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Deterministic malformed JSONL lines planted by
    * [[qJsonlQuarantine]] — truncation, bare text, wrong nesting,
    * unclosed strings: the shapes real feeds actually break in.
    */
  private val CorruptLines = Seq(
    """{"doc_id": 900001, "source": """,
    """this is not json at all""",
    """{"doc_id": 900002 "source": "x", "text": "missing comma"}""",
    """{"doc_id": 900003, "source": "x", "text": "unclosed""",
    """{"doc_id": 900004,, "source": "x"}""",
    """}{""",
    """{{""",
  )

  /** named query: malformed-line quarantine on JSONL ingest — the
    * corpus is written as JSONL, seven deterministic corrupt lines are
    * planted beside it, and the read-back uses PERMISSIVE mode with a
    * corrupt-record column so bad lines are QUARANTINED, not dropped
    * and not fatal. At 100 TB/day of feed data, FAILFAST means one bad
    * line kills the job and DROPMALFORMED silently loses data — the
    * production contract is "count it, keep the raw line, continue",
    * which is what this query proves: every good row survives
    * (id-sum-exact) and every planted line lands in quarantine. (The
    * aggregate reads doc_id alongside the corrupt column — Spark
    * refuses a query that selects ONLY the internal corrupt column
    * from a JSON scan.)
    */
  def qJsonlQuarantine(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = scratchDir(spark) + "/documents_quarantine.jsonl"
    writeAuto(graft.GraftSession.table(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("text")), tmp)
    // plant the corrupt shard next to the good part files
    java.nio.file.Files.write(
      java.nio.file.Paths.get(tmp, "zz-corrupt.json"),
      CorruptLines.mkString("\n").getBytes("UTF-8"))
    val sch = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("source", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("_corrupt", org.apache.spark.sql.types.StringType),
    ))
    // the parsed frame MUST be cached: a pruned consumer (count()
    // prunes to the corrupt column alone) trips Spark's
    // QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction on a raw JSON scan;
    // the cache materializes the full schema and the restriction
    // doesn't apply to the in-memory relation (the documented
    // workaround). materialized() releases it after the 2-row
    // aggregate lands.
    val parsed = spark.read.schema(sch)
      .option("mode", "PERMISSIVE").option("columnNameOfCorruptRecord", "_corrupt")
      .json(tmp).cache()
    val agg = parsed
      .select(when(col("_corrupt").isNull, "good").otherwise("quarantined").as("class"),
        coalesce(col("doc_id"), lit(0L)).as("id"))
      .groupBy(col("class"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("class") === "good", col("id")).otherwise(0L)).as("id_sum"))
    graft.GraftSession.materialized(agg, Seq("class"), parsed)
  }

  val qJsonlQuarantineSql: String =
    """SELECT 'good' AS class, count(*) AS n_rows, CAST(sum(doc_id) AS BIGINT) AS id_sum FROM documents
      |UNION ALL
      |SELECT 'quarantined', 7, 0
      |ORDER BY class""".stripMargin

  /** Write `df` as a bucketed+sorted parquet table under the session
    * scratch dir (external location → reclaimed by the scratch
    * shutdown hook; table NAME lives only in this session's in-memory
    * catalog, so concurrent JVMs can't collide). Re-registration is
    * keyed on (name, source dir): the bench warms at sf0.001 then
    * times sf0.1, and a bare tableExists guard would serve the warm-up
    * scale forever.
    */
  def bucketedCopy(
      spark: SparkSession, dir: String, name: String,
      df: DataFrame, key: String, buckets: Int,
  ): DataFrame = {
    val t = s"graft_bucketed_${name}_${Integer.toHexString(dir.hashCode)}"
    if (!spark.catalog.tableExists(t)) {
      df.write.mode("overwrite").format("parquet")
        .bucketBy(buckets, key).sortBy(key)
        .option("path", s"${scratchDir(spark)}/$t")
        .saveAsTable(t)
    }
    spark.table(t)
  }

  /** §2.2 #21ab — co-located (bucketed) join: both fact tables are
    * laid out bucketed+sorted on the join key, so the join itself
    * plans ZERO exchanges — each task reads bucket i of both sides
    * and merges. THE layout lever for a 100 TB lakehouse: the shuffle
    * is paid once at write time and amortized over every subsequent
    * join (here 16 buckets; at cluster scale you'd size buckets to
    * ~1 GB each). The oracle is the plain join+group — co-location
    * must not change a single row.
    */
  def qBucketJoin(spark: SparkSession, dir: String): DataFrame = {
    val t = graft.GraftSession.table(spark, dir, _: String)
    val o = bucketedCopy(spark, dir, "orders",
      t("orders").select(col("o_orderkey"), col("o_orderstatus")), "o_orderkey", 16)
    val l = bucketedCopy(spark, dir, "lineitem",
      t("lineitem").select(col("l_orderkey"),
        floor(col("l_quantity")).cast("long").as("qty")), "l_orderkey", 16)
    o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"), sum(col("qty")).as("sum_qty"))
      .orderBy("o_orderstatus")
  }

  val qBucketJoinSql: String =
    """SELECT o_orderstatus, count(*) AS n_items,
      |  CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin

  /** Events written once per (session, source dir) as a HIVE-style
    * day-partitioned parquet layout (`.../day=N/...`) under the
    * session scratch; the partitioned table every pruning consumer
    * reads. Keyed like [[bucketedCopy]] so warm-up and timed scales
    * don't serve each other's copy.
    */
  def partitionedEvents(spark: SparkSession, dir: String): DataFrame = {
    val path = s"${scratchDir(spark)}/events_byday_${Integer.toHexString(dir.hashCode)}"
    if (partitionedDone.add(path)) {
      writeAuto(
        graft.GraftSession.table(spark, dir, "events")
          .withColumn("day", expr("unix_micros(ts) div 86400000000")),
        path, partitionBy = Seq("day"))
    }
    spark.read.parquet(path)
  }
  private val partitionedDone = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** §2.2 #21ac — partition-pruned scan over a day-partitioned layout:
    * events land partitioned by integer day (the standard lakehouse
    * time-partitioning), and a 7-day filtered aggregation reads ONLY
    * those directories — IngestSpec pins `PartitionFilters` in the
    * scan and that the unpruned partitions never enter the plan. THE
    * other half of the layout story next to `q_bucket_join`: bucketing
    * kills the join shuffle, day-partitioning kills the time-range
    * scan. The oracle aggregates the same 7 days from the unpartitioned
    * original — layout must not change a single row.
    */
  def qPartitionPrune(spark: SparkSession, dir: String): DataFrame = {
    val ev = partitionedEvents(spark, dir)
    val d1 = graft.GraftSession.table(spark, dir, "events")
      .agg(max(expr("unix_micros(ts) div 86400000000"))).head.getLong(0)
    ev.filter(col("day") > d1 - 7)
      // the inferred hive partition column is int-typed; the oracle's
      // epoch arithmetic is bigint — align before grouping
      .select(col("day").cast("long").as("day"), col("event_type"), col("value"))
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value")).cast("long")).as("sum_v"))
      .orderBy("day", "event_type")
  }

  val qPartitionPruneSql: String =
    """WITH b AS (
      |  SELECT max(epoch_us(ts) // 86400000000) AS d1 FROM events
      |)
      |SELECT epoch_us(ts) // 86400000000 AS day, event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_v
      |FROM events CROSS JOIN b
      |WHERE epoch_us(ts) // 86400000000 > d1 - 7
      |GROUP BY 1, 2
      |ORDER BY day, event_type""".stripMargin

  /** §2.2 #21ac3 — DYNAMIC partition pruning: the runtime half of the
    * pruning story next to [[qPartitionPrune]]'s static predicate.
    * The pruning set here is not a literal — it is the distinct
    * purchase days of the last week, known only after scanning the
    * dim side — and Spark still prunes the partitioned fact scan:
    * the broadcast join on the partition column plants a
    * `dynamicpruningexpression(day IN dynamicpruning#N)` into
    * `PartitionFilters`, so only matching `day=N` directories are
    * read (IngestSpec pins the expression in the plan). THE
    * star-schema lever at 100 TB: `fact JOIN dim WHERE dim.pred`
    * reads only the fact partitions the filtered dim reaches, with no
    * user-written partition predicate at all.
    *
    * Per matched day × event type: event count + exact floored-value
    * sum, plus the fact/dim day alignment the join proves. The oracle
    * replays the same dim derivation and join on the unpartitioned
    * original — pruning must not change a row.
    */
  def qDpp(spark: SparkSession, dir: String): DataFrame = {
    val ev = partitionedEvents(spark, dir)
    val d1 = graft.GraftSession.table(spark, dir, "events")
      .agg(max(expr("unix_micros(ts) div 86400000000"))).head.getLong(0)
    val dim = graft.GraftSession.table(spark, dir, "events")
      .withColumn("day", expr("unix_micros(ts) div 86400000000"))
      .filter(col("event_type") === "purchase" && col("day") > d1 - 7)
      .select(col("day")).distinct()
    ev.join(dim.hint("broadcast"), ev("day") === dim("day"))
      .select(ev("day").cast("long").as("day"), col("event_type"), col("value"))
      .groupBy(col("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value")).cast("long")).as("sum_v"))
      .orderBy("day", "event_type")
  }

  val qDppSql: String =
    """WITH b AS (
      |  SELECT max(epoch_us(ts) // 86400000000) AS d1 FROM events
      |), dim AS (
      |  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day
      |  FROM events CROSS JOIN b
      |  WHERE event_type = 'purchase' AND epoch_us(ts) // 86400000000 > d1 - 7
      |)
      |SELECT e.day AS day, e.event_type, count(*) AS n_events,
      |  CAST(sum(CAST(floor(e.value) AS BIGINT)) AS BIGINT) AS sum_v
      |FROM (SELECT epoch_us(ts) // 86400000000 AS day, event_type, value
      |      FROM events) e
      |JOIN dim ON e.day = dim.day
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** §2.8 #46f — schema evolution on read: a long-lived table whose
    * parquet files were written by THREE pipeline generations with a
    * widening schema (gen 1: key+cents; gen 2 adds `disc_cents`;
    * gen 3 adds `channel`), read back as ONE table via `mergeSchema`
    * over hive-style `gen=N` directories. Rows written before a
    * column existed MUST surface as NULL — never a read error, never
    * dropped, never a backfill rewrite: on a table that has lived for
    * years, heterogeneous file schemas are the steady state, and
    * rewriting old files to add a column is exactly the full-table
    * write a 100 TB lake must not need. The report pins per-generation
    * row counts, the null count of each late column (old generations
    * must be all-NULL for columns they predate), and exact-cents sums.
    *
    * Scale shape: schema merging reads parquet FOOTERS, not data —
    * a metadata pass Spark parallelizes over the file listing; the
    * report is one scan + partial agg keyed on the partition column,
    * and a generation predicate (`gen = 3`) would prune whole
    * directories. The oracle replays the generation rules from the
    * original table — the evolved layout must not change a value.
    */
  def qSchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val root = s"${scratchDir(spark)}/orders_evolution_${Integer.toHexString(dir.hashCode)}"
    val o = graft.GraftSession.table(spark, dir, "orders").select(
      col("o_orderkey").as("key"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    if (evolutionDone.add(root)) {
      o.filter(col("key") % 3 === 0).select("key", "cents")
        .write.mode("overwrite").parquet(s"$root/gen=1")
      o.filter(col("key") % 3 === 1)
        .select(col("key"), col("cents"), expr("cents DIV 20").as("disc_cents"))
        .write.mode("overwrite").parquet(s"$root/gen=2")
      o.filter(col("key") % 3 === 2)
        .select(col("key"), col("cents"), expr("cents DIV 20").as("disc_cents"),
          when(col("key") % 2 === 0, "web").otherwise("store").as("channel"))
        .write.mode("overwrite").parquet(s"$root/gen=3")
    }
    spark.read.option("mergeSchema", "true").parquet(root)
      .groupBy(col("gen"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("cents")).as("sum_cents"),
        sum(when(col("disc_cents").isNull, 1L).otherwise(0L)).as("n_disc_null"),
        sum(coalesce(col("disc_cents"), lit(0L))).as("sum_disc"),
        sum(when(col("channel").isNull, 1L).otherwise(0L)).as("n_channel_null"),
        count(when(col("channel") === "web", 1)).as("n_web"),
      )
      .orderBy("gen")
  }
  private val evolutionDone = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  val qSchemaEvolutionSql: String =
    """WITH o AS (
      |  SELECT CAST(o_orderkey % 3 + 1 AS INTEGER) AS gen,
      |    o_orderkey AS key,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders
      |), e AS (
      |  SELECT gen, key, cents,
      |    CASE WHEN gen >= 2 THEN cents // 20 END AS disc_cents,
      |    CASE WHEN gen = 3 THEN
      |      CASE WHEN key % 2 = 0 THEN 'web' ELSE 'store' END
      |    END AS channel
      |  FROM o
      |)
      |SELECT gen, count(*) AS n_rows,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents,
      |  CAST(sum(CASE WHEN disc_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_disc_null,
      |  CAST(sum(coalesce(disc_cents, 0)) AS BIGINT) AS sum_disc,
      |  CAST(sum(CASE WHEN channel IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_channel_null,
      |  CAST(count(CASE WHEN channel = 'web' THEN 1 END) AS BIGINT) AS n_web
      |FROM e
      |GROUP BY gen
      |ORDER BY gen""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_orc_roundtrip" -> (qOrcRoundtrip _),
    "q_avro_roundtrip" -> (qAvroRoundtrip _),
    "q_jsonl_roundtrip" -> (qJsonlRoundtrip _),
    "q_csv_roundtrip" -> (qCsvRoundtrip _),
    "q_xml_roundtrip" -> (qXmlRoundtrip _),
    "q_jsonl_quarantine" -> (qJsonlQuarantine _),
    "q_bucket_join" -> (qBucketJoin _),
    "q_partition_prune" -> (qPartitionPrune _),
    "q_schema_evolution" -> (qSchemaEvolution _),
    "q_dpp" -> (qDpp _),
  )

  val oracles: Map[String, String] = Map(
    "q_orc_roundtrip" -> qOrcRoundtripSql,
    "q_avro_roundtrip" -> qAvroRoundtripSql,
    "q_jsonl_roundtrip" -> qJsonlRoundtripSql,
    "q_csv_roundtrip" -> qCsvRoundtripSql,
    "q_xml_roundtrip" -> qXmlRoundtripSql,
    "q_jsonl_quarantine" -> qJsonlQuarantineSql,
    "q_bucket_join" -> qBucketJoinSql,
    "q_partition_prune" -> qPartitionPruneSql,
    "q_schema_evolution" -> qSchemaEvolutionSql,
    "q_dpp" -> qDppSql,
  )
}
