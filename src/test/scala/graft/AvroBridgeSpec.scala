package graft

import java.sql.Timestamp

import graft.sources.{AvroBridge, Ingest}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Avro container-file bridge: the sixth leg of the formats matrix.
  * Pins (1) the full type bridge incl. nulls, timestamps, and binary
  * round-trip value-exactly, (2) the documents round-trip is
  * set-identical to the parquet original, (3) the commit protocol
  * leaves only `part-*.avro` files (no `.inprogress` residue), and
  * (4) writes are one container per input partition (the distributed
  * sink shape — no driver funnel).
  */
class AvroBridgeSpec extends AnyFunSuite {
  import TestSpark._

  private def withTmp[A](f: String => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory("avrobridge").toString
    try f(tmp)
    finally {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles).foreach(_.foreach(rm)); p.delete(): Unit
      }
      rm(new java.io.File(tmp))
    }
  }

  test("type bridge round-trips long/int/string/double/float/boolean/bytes/timestamp with nulls") {
    val schema = StructType(Seq(
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("s", StringType), StructField("d", DoubleType),
      StructField("f", FloatType), StructField("b", BooleanType),
      StructField("bin", BinaryType), StructField("ts", TimestampType)))
    val t0 = Timestamp.from(java.time.Instant.parse("2021-06-01T12:34:56.123456Z"))
    val tNeg = Timestamp.from(java.time.Instant.parse("1969-12-31T23:59:59.999999Z"))
    val rows = Seq(
      Row(1L, 2, "héllo\nwörld", 3.5, 0.25f, true, Array[Byte](0, 1, -1, 127), t0),
      Row(2L, null, null, null, null, null, null, tNeg),
      Row(null, 7, "", Double.NaN, Float.MinPositiveValue, false, Array.empty[Byte], null))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    withTmp { tmp =>
      AvroBridge.writeAvro(df, s"$tmp/t.avro")
      val back = AvroBridge.readAvro(spark, s"$tmp/t.avro")
      assert(back.schema.map(f => (f.name, f.dataType)) ==
        schema.map(f => (f.name, f.dataType)), "schema survives the avro bridge")
      def canon(r: Row): Seq[Any] = r.toSeq.map {
        case a: Array[Byte] => a.toSeq
        case v => v
      }
      val a = df.collect().map(canon).toSet
      val b = back.collect().map(canon).toSet
      // NaN != NaN under ==; compare via string forms for the one NaN row
      assert(a.map(_.map(String.valueOf)) == b.map(_.map(String.valueOf)))
    }
  }

  test("documents round-trip is set-identical to the parquet original; one container per partition, no .inprogress residue") {
    val sf = "/root/testdata/sf0.001"
    val docs = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text"), col("n_chars"))
      .repartition(4)
    withTmp { tmp =>
      Ingest.writeAuto(docs, s"$tmp/documents.avro")
      val files = new java.io.File(s"$tmp/documents.avro").listFiles().map(_.getName)
      assert(files.count(_.endsWith(".avro")) == 4, s"one container per partition: ${files.toSeq}")
      assert(!files.exists(_.endsWith(".inprogress")), "rename-commit leaves no residue")
      val back = Ingest.readAuto(spark, s"$tmp/documents.avro")
      assert(back.count() == docs.count())
      // set equality via anti-joins both ways (order-free, null-safe)
      assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty,
        "avro round-trip must be value-identical to the parquet original")
    }
  }

  test("TimestampNTZ round-trips as local-timestamp-micros: type AND wall-clock value survive") {
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("ntz", TimestampNTZType)))
    val wall = java.time.LocalDateTime.parse("2021-06-01T12:34:56.123456")
    val rows = Seq(Row(1L, wall), Row(2L, null))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    withTmp { tmp =>
      AvroBridge.writeAvro(df, s"$tmp/ntz.avro")
      val back = AvroBridge.readAvro(spark, s"$tmp/ntz.avro")
      assert(back.schema("ntz").dataType == TimestampNTZType,
        "NTZ must come back as NTZ, not rebranded as an instant")
      val got = back.collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
      assert(got(1L).contains(wall), s"wall-clock value must survive: ${got(1L)}")
      assert(got(2L).isEmpty)
    }
  }

  test("committed file names are partitionId-only — a retried attempt can never add a duplicate part file") {
    val docs = GraftSession.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id")).repartition(3)
    withTmp { tmp =>
      AvroBridge.writeAvro(docs, s"$tmp/d.avro")
      val names = new java.io.File(s"$tmp/d.avro").listFiles().map(_.getName).filter(_.endsWith(".avro"))
      // the final name must not embed the attempt id: the read glob
      // dedups by construction only if each partition maps to ONE name
      assert(names.forall(_.matches("part-\\d{5}\\.avro")), s"attempt-id leaked into final names: ${names.toSeq}")
      assert(names.distinct.length == 3)
    }
  }

  test("q_avro_roundtrip matches the q_orc_roundtrip relation on the same corpus") {
    val sf = "/root/testdata/sf0.001"
    val avro = Ingest.qAvroRoundtrip(spark, sf).select("doc_id", "source", "text_md5")
    val orc = Ingest.qOrcRoundtrip(spark, sf).select("doc_id", "source", "text_md5")
    assert(avro.exceptAll(orc).isEmpty && orc.exceptAll(avro).isEmpty)
  }
}
