package graft.sources

import java.nio.ByteBuffer

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileStream, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro object-container-file source/sink built directly on the public
  * `org.apache.avro` API (avro core ships in Spark's jars; the
  * first-party `spark-avro` connector module does not ship in this
  * environment, so the format would otherwise be unreachable). Avro is
  * the most common Kafka-adjacent interchange format — the formats
  * matrix (parquet/orc/csv/jsonl/xml/binaryFile) is not complete for a
  * lake engine without it.
  *
  * Scale shape, both directions distributed with NO driver funnel:
  *  - WRITE: one container file per partition via `foreachPartition`,
  *    streamed through the Hadoop FileSystem API (works on local FS and
  *    HDFS-compatible stores alike). Files are written to an
  *    attempt-unique `.inprogress` name and renamed on success onto a
  *    partitionId-only final name, first-committer-wins: a speculative
  *    or retried attempt can neither be confused for committed output
  *    nor commit a duplicate file for its partition, and a failed
  *    rename fails the task (Spark retries) instead of silently
  *    dropping the partition. The read glob matches only
  *    `part-*.avro`. Target file size is whatever the upstream
  *    partitioning gives; repartition the input to size container
  *    files (~128 MB) for a 100 TB sink.
  *  - READ: the schema comes from ONE container header read on the
  *    driver (a few hundred bytes), then `binaryFile` lists and reads
  *    the files as a distributed scan and `mapPartitions` decodes
  *    records inside each task. Parallelism is per-file — exactly the
  *    spark-avro granularity for unsplittable-compressed containers.
  *
  * Type bridge (both directions): long/int/string/double/float/
  * boolean/bytes plus timestamp-micros (instant) and
  * local-timestamp-micros (zoneless, TimestampNTZType) logical longs;
  * nullable columns map to `["null", T]` unions. That covers every column type the
  * testdata tables and the lake's blob relations use; anything else
  * fails loudly at schema-conversion time rather than corrupting data.
  */
object AvroBridge {

  /** Catalyst → Avro record schema. Field order preserved. */
  def toAvroSchema(schema: StructType, recordName: String): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    schema.fields.foreach { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case StringType => Schema.create(Schema.Type.STRING)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case TimestampType =>
          val s = Schema.create(Schema.Type.LONG)
          s.addProp("logicalType", "timestamp-micros")
          s
        case TimestampNTZType =>
          // wall-clock (zoneless) semantics need the NTZ logical type,
          // or the round-trip silently rebrands the column as an
          // instant (and shifts its value in non-UTC sessions)
          val s = Schema.create(Schema.Type.LONG)
          s.addProp("logicalType", "local-timestamp-micros")
          s
        case other =>
          throw new IllegalArgumentException(
            s"AvroBridge: unsupported Catalyst type $other for field ${f.name}")
      }
      val s = if (f.nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
      fields.add(new Schema.Field(f.name, s, null, if (f.nullable) Schema.Field.NULL_DEFAULT_VALUE else null))
    }
    Schema.createRecord(recordName, null, "graft.avro", false, fields)
  }

  /** Avro record schema → Catalyst. Inverse of [[toAvroSchema]];
    * `["null", T]` unions become nullable fields.
    */
  def toStructType(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD, s"expected record, got ${schema.getType}")
    StructType(schema.getFields.toArray(Array.empty[Schema.Field]).map { f =>
      val (s, nullable) = f.schema() match {
        case u if u.getType == Schema.Type.UNION =>
          val branches = u.getTypes.toArray(Array.empty[Schema]).filter(_.getType != Schema.Type.NULL)
          require(branches.length == 1, s"AvroBridge: non-nullable-union field ${f.name}")
          (branches.head, true)
        case s => (s, false)
      }
      val dt = s.getType match {
        case Schema.Type.LONG => s.getProp("logicalType") match {
          case "timestamp-micros" => TimestampType
          case "local-timestamp-micros" => TimestampNTZType
          case _ => LongType
        }
        case Schema.Type.INT => IntegerType
        case Schema.Type.STRING => StringType
        case Schema.Type.DOUBLE => DoubleType
        case Schema.Type.FLOAT => FloatType
        case Schema.Type.BOOLEAN => BooleanType
        case Schema.Type.BYTES => BinaryType
        case other =>
          throw new IllegalArgumentException(s"AvroBridge: unsupported Avro type $other for field ${f.name}")
      }
      StructField(f.name, dt, nullable)
    })
  }

  private def toMicros(v: Any): Long = v match {
    // floorDiv semantics via getEpochSecond keep pre-1970 instants exact
    case t: java.sql.Timestamp =>
      val i = t.toInstant; i.getEpochSecond * 1000000L + i.getNano / 1000L
    case i: java.time.Instant => i.getEpochSecond * 1000000L + i.getNano / 1000L
    case l: java.time.LocalDateTime =>
      val i = l.toInstant(java.time.ZoneOffset.UTC)
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    case other => throw new IllegalArgumentException(s"not a timestamp: $other")
  }

  /** Write `df` as a directory of Avro container files, one per input
    * partition. Overwrites `path`.
    */
  def writeAvro(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    val avroJson = toAvroSchema(sparkSchema, "row").toString
    val spark = df.sparkSession
    val hconf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(path)
    val fsDriver = root.getFileSystem(hconf)
    if (fsDriver.exists(root)) fsDriver.delete(root, true)
    fsDriver.mkdirs(root)
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val tc = TaskContext.get()
        val schema = new Schema.Parser().parse(avroJson)
        // executor-side Configuration: defaults resolve local and
        // HDFS-default URIs; exotic stores would thread the driver
        // conf through a broadcast instead
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(new org.apache.hadoop.conf.Configuration())
        // commit protocol: the tmp name is attempt-unique (two live
        // attempts never clobber each other's stream) but the FINAL
        // name is partitionId-only, so a retried or speculative
        // attempt can never commit a SECOND file for the same
        // partition — the read glob would silently duplicate rows.
        // First-committer wins; a later attempt seeing the final file
        // discards its own output (identical rows by determinism).
        val partName = f"part-${tc.partitionId()}%05d"
        val tmp = new org.apache.hadoop.fs.Path(path, s"$partName-a${tc.taskAttemptId()}.inprogress")
        val fin = new org.apache.hadoop.fs.Path(path, s"$partName.avro")
        val out = fs.create(tmp, true)
        val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
        writer.create(schema, out)
        val fieldSchemas = sparkSchema.fields
        rows.foreach { r =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < fieldSchemas.length) {
            val v =
              if (r.isNullAt(i)) null
              else fieldSchemas(i).dataType match {
                case TimestampType | TimestampNTZType => java.lang.Long.valueOf(toMicros(r.get(i)))
                case BinaryType => ByteBuffer.wrap(r.getAs[Array[Byte]](i))
                case _ => r.get(i).asInstanceOf[AnyRef]
              }
            rec.put(i, v)
            i += 1
          }
          writer.append(rec)
        }
        writer.close() // closes the stream; container footer flushed
        if (fs.exists(fin)) {
          // another attempt already committed this partition
          fs.delete(tmp, false): Unit
        } else if (!fs.rename(tmp, fin)) {
          // rename can legitimately fail only because a racing attempt
          // committed between the exists check and the rename; any
          // other false means the partition's data would silently
          // vanish from the sink — fail the task so Spark retries
          if (fs.exists(fin)) fs.delete(tmp, false): Unit
          else throw new java.io.IOException(
            s"AvroBridge: rename $tmp -> $fin failed and no committed file exists")
        }
      }
    }
  }

  /** Read a directory written by [[writeAvro]] (or any Avro container
    * files) back as a DataFrame.
    */
  def readAvro(spark: SparkSession, path: String): DataFrame = {
    // schema from one header, driver-side: DataFileStream reads only
    // the container preamble before the first block
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val first = fs.globStatus(new org.apache.hadoop.fs.Path(path, "*.avro")).headOption
      .getOrElse(throw new java.io.FileNotFoundException(s"no *.avro under $path"))
    val in = fs.open(first.getPath)
    val avroSchema = try {
      val s = new DataFileStream[GenericRecord](in, new GenericDatumReader[GenericRecord]())
      try s.getSchema finally s.close()
    } finally in.close()
    val sparkSchema = toStructType(avroSchema)
    val avroJson = avroSchema.toString

    // pathGlobFilter instead of a glob IN the path: the literal-path
    // form makes FileStreamSink.hasMetadata log its expected
    // FileNotFoundException as a full WARN stack trace on first read.
    // Guarded: if the dir ever carries a _spark_metadata sink log,
    // load(dir) would silently restrict to sink-committed files — fall
    // back to the glob-in-path form there (Ingest.binaryFiles doc)
    val files =
      (if (graft.sources.Ingest.hasStreamSinkLog(spark, path))
        spark.read.format("binaryFile").load(s"$path/*.avro")
      else
        spark.read.format("binaryFile").option("pathGlobFilter", "*.avro").load(path))
      .select(col("content"))
    files.mapPartitions { it =>
      val schema = new Schema.Parser().parse(avroJson)
      val target = toStructType(schema)
      it.flatMap { fileRow =>
        val bytes = fileRow.getAs[Array[Byte]](0)
        val reader = new DataFileReader[GenericRecord](
          new SeekableByteArrayInput(bytes), new GenericDatumReader[GenericRecord](schema))
        new Iterator[Row] {
          def hasNext: Boolean = { val h = reader.hasNext; if (!h) reader.close(); h }
          def next(): Row = {
            val rec = reader.next()
            Row.fromSeq(target.fields.indices.map { i =>
              rec.get(i) match {
                case null => null
                case u: org.apache.avro.util.Utf8 => u.toString
                case b: ByteBuffer =>
                  val a = new Array[Byte](b.remaining()); b.get(a); a
                case l: java.lang.Long if target.fields(i).dataType == TimestampType =>
                  // java.sql.Timestamp is the row encoder's default
                  // external type (java8API off in this session)
                  java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
                    Math.floorDiv(l.longValue(), 1000000L),
                    Math.floorMod(l.longValue(), 1000000L) * 1000L))
                case l: java.lang.Long if target.fields(i).dataType == TimestampNTZType =>
                  // NTZ's external type is always LocalDateTime; the
                  // UTC interpretation here mirrors toMicros, so the
                  // wall-clock value round-trips exactly
                  java.time.LocalDateTime.ofEpochSecond(
                    Math.floorDiv(l.longValue(), 1000000L),
                    (Math.floorMod(l.longValue(), 1000000L) * 1000L).toInt,
                    java.time.ZoneOffset.UTC)
                case v => v
              }
            })
          }
        }
      }
    }(Encoders.row(sparkSchema))
  }
}
