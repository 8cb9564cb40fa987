package graft

import java.sql.Timestamp

import graft.streaming.EventsStream
import graft.streaming.EventsStream.{Event, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-batch equivalence: the streaming operators must produce the
  * batch answers on the same data (SURVEY.md §2.7).
  */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val events = GraftSession.table(spark, sf, "events")
    .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
    .cache()

  test("streaming windowed agg equals batch q_events_window (counts per day/type)") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val input = stream.toDF().toDF("user_id", "ts", "event_id", "event_type", "value")

    val q = EventsStream
      .windowedCounts(input)
      .writeStream.format("memory").queryName("win_out").outputMode("append").start()
    try {
      stream.addData(events.as[(Long, Timestamp, Long, String, Double)].collect().toSeq)
      q.processAllAvailable()
      // advance the watermark past every window with a sentinel batch
      stream.addData(Seq((0L, Timestamp.valueOf("2030-01-01 00:00:00"), 0L, "sentinel", 0.0)))
      q.processAllAvailable()

      val got = spark.table("win_out")
        .filter(col("event_type") =!= "sentinel")
        .select("day", "event_type", "n_events", "sum_floor_value")
      val want = events
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(floor(col("value")).cast("long")).as("sum_floor_value"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"stream=${got.count()} batch=${want.count()}")
    } finally q.stop()
  }

  test("streaming mixture monitor equals the batch per-day token shares to the last ppm") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Long)]
    val input = stream.toDF().toDF("ts", "source", "toks")
    // three days × skewed sources, sizes chosen so no share divides evenly
    val docs = for {
      d <- 1 to 3; s <- Seq("web", "code", "books"); i <- 1 to (d * 7 + s.length)
    } yield (Timestamp.valueOf(f"2024-03-0$d ${8 + i % 12}%02d:00:00"), s, (i * 13 + s.length).toLong)

    val q = EventsStream
      .mixtureMonitor(input)
      .writeStream.format("memory").queryName("mix_out").outputMode("append").start()
    try {
      stream.addData(docs)
      q.processAllAvailable()
      stream.addData(Seq((Timestamp.valueOf("2030-01-01 00:00:00"), "sentinel", 0L)))
      q.processAllAvailable()

      val got = spark.table("mix_out")
        .filter(col("source") =!= "sentinel")
        .collect()
        .map(r => (r.getAs[Timestamp]("day"), r.getAs[String]("source")) ->
          ((r.getAs[Long]("toks"), r.getAs[Long]("share_ppm")))).toMap
      // batch replay: per-(day, source) sums + the split-division share
      val byDay = docs.groupBy { case (ts, _, _) =>
        Timestamp.valueOf(ts.toLocalDateTime.toLocalDate.atStartOfDay)
      }
      val want = byDay.flatMap { case (day, ds) =>
        val bySrc = ds.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
        val total = bySrc.values.sum
        bySrc.map { case (src, t) =>
          (day, src) -> ((t, (t * 1000 / total) * 1000 + (t * 1000 % total) * 1000 / total))
        }
      }
      assert(got == want, s"stream=${got.size} batch=${want.size}")
      // floor-division shares partition unity within one ppm per source
      byDay.keys.foreach { day =>
        val shares = got.collect { case ((d, _), (_, p)) if d == day => p }
        assert(shares.sum <= 1000000L && shares.sum >= 1000000L - shares.size)
      }
    } finally q.stop()
  }

  test("streaming windowed top-k equals the batch per-day top-k with the same tie-break") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val input = stream.toDF().toDF("user_id", "ts", "event_id", "event_type", "value")
    val k = 3

    val q = EventsStream
      .windowTopK(input, k)
      .writeStream.format("memory").queryName("topk_out").outputMode("append").start()
    try {
      stream.addData(events.as[(Long, Timestamp, Long, String, Double)].collect().toSeq)
      q.processAllAvailable()
      // advance the watermark far past every window so each times out
      stream.addData(Seq((0L, Timestamp.valueOf("2030-01-01 00:00:00"), 0L, "sentinel", 0.0)))
      q.processAllAvailable()

      val got = spark.table("topk_out")
        .filter(col("event_type") =!= "sentinel")
        .select("day", "rank", "event_type", "n_events")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("day").orderBy(col("n_events").desc, col("event_type"))
      val want = events
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
        .select("day", "rank", "event_type", "n_events")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"stream=${got.count()} batch=${want.count()}")
    } finally q.stop()
  }

  test("streaming heavy hitters: MG invariants hold against batch exact counts") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val input = stream.toDF().toDF("user_id", "ts", "event_id", "event_type", "value")
    val k = 8

    val q = EventsStream
      .windowHeavyHitters(input, k)
      .writeStream.format("memory").queryName("hh_out").outputMode("append").start()
    try {
      // split mid-stream: the MG summary must merge across micro-batches
      val evs = events.as[(Long, Timestamp, Long, String, Double)].collect().toSeq
        .sortBy(e => (e._2.getTime, e._3))
      val (b1, b2) = evs.splitAt(evs.size / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      stream.addData(Seq((0L, Timestamp.valueOf("2030-01-01 00:00:00"), 0L, "sentinel", 0.0)))
      q.processAllAvailable()

      val got = spark.table("hh_out")
        .filter(col("day") < lit(Timestamp.valueOf("2029-01-01 00:00:00")))
        .collect()
        .map(r => (r.getAs[Timestamp]("day").getTime, r.getAs[Long]("user_id")) -> r.getAs[Long]("c_lower"))
        .toMap
      val exact = events
        .groupBy(date_trunc("day", col("ts")).as("day"), col("user_id"))
        .agg(count(lit(1)).as("c")).collect()
        .map(r => (r.getAs[Timestamp]("day").getTime, r.getAs[Long]("user_id")) -> r.getAs[Long]("c"))
        .toMap
      val dayTotals = exact.groupBy(_._1._1).map { case (d, m) => d -> m.values.sum }

      // 1. guaranteed superset: user above n_win/(k+1) must be present
      val mustHave = exact.filter { case ((d, _), c) => c > dayTotals(d).toDouble / (k + 1) }
      assert(mustHave.nonEmpty, "test data must exercise the guarantee")
      mustHave.foreach { case (key, _) => assert(got.contains(key), s"guaranteed heavy hitter $key missing") }
      // 2. counts are undercounts within the MG error bound
      got.foreach { case (key, lower) =>
        val truth = exact.getOrElse(key, 0L)
        assert(lower <= truth, s"$key reported $lower above truth $truth")
        assert(truth - lower <= dayTotals(key._1) / (k + 1) + 1, s"$key error bound violated")
      }
      // 3. bounded state: at most k survivors per day
      got.keys.groupBy(_._1).values.foreach(g => assert(g.size <= k))
    } finally q.stop()
  }

  test("streaming sessionization equals batch q_sessionize on closed sessions") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Event]
    val q = EventsStream
      .sessionize(stream.toDS(), gapMs = 1800L * 1000)
      .writeStream.format("memory").queryName("sess_out").outputMode("append").start()
    try {
      val evs = events.select("user_id", "ts", "event_id").as[Event].collect().toSeq
      // two micro-batches split mid-stream: state must carry open sessions over
      val (b1, b2) = evs.sortBy(e => (e.ts.getTime, e.event_id)).splitAt(evs.size / 2)
      stream.addData(b1)
      q.processAllAvailable()
      stream.addData(b2)
      q.processAllAvailable()

      val got = spark.table("sess_out").as[SessionOut].collect()
        .map(s => (s.user_id, s.session_start.getTime, s.session_end.getTime, s.n_events)).toSet

      val batch = operators.Relational.qSessionize(spark, sf).collect()
        .map(r => (
          r.getAs[Long]("user_id"),
          r.getAs[Timestamp]("session_start").getTime,
          r.getAs[Timestamp]("session_end").getTime,
          r.getAs[Long]("n_events"),
        ))
      // the stream has not emitted each user's final (still-open) session
      val lastPerUser = batch.groupBy(_._1).map { case (_, ss) => ss.maxBy(_._2) }.toSet
      val expectedClosed = batch.toSet -- lastPerUser
      assert(got == expectedClosed,
        s"stream=${got.size} expected=${expectedClosed.size} diff=${(got diff expectedClosed).take(3)} missing=${(expectedClosed diff got).take(3)}")
    } finally q.stop()
  }

  test("streaming dedup drops within-watermark duplicates exactly") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long)]
    val input = stream.toDF().toDF("user_id", "ts", "event_id")
    val q = EventsStream.dedupEvents(input)
      .writeStream.format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      val base = events.select("user_id", "ts", "event_id")
        .as[(Long, Timestamp, Long)].collect().toSeq.take(2000)
      // feed every event twice (same batch) plus a second duplicated batch
      stream.addData(base ++ base)
      q.processAllAvailable()
      stream.addData(base.take(500))
      q.processAllAvailable()
      val got = spark.table("dedup_out").count()
      assert(got == base.distinct.size.toLong, s"expected ${base.distinct.size} unique, got $got")
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch purchase-click range join") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val input = stream.toDF().toDF("user_id", "ts", "event_id", "event_type", "value")
    val q = EventsStream.purchaseClickJoin(input, lookbackMinutes = 10)
      .writeStream.format("memory").queryName("ssj_out").outputMode("append").start()
    try {
      val evs = events.as[(Long, Timestamp, Long, String, Double)].collect().toSeq
        .sortBy(e => (e._2.getTime, e._3))
      // two micro-batches split mid-stream: a purchase in batch 2 must
      // still find its batch-1 clicks in the join state
      val (b1, b2) = evs.splitAt(evs.size / 2)
      stream.addData(b1)
      q.processAllAvailable()
      stream.addData(b2)
      q.processAllAvailable()

      val got = spark.table("ssj_out")
        .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet

      val p = events.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("event_id").as("purchase_id"), unix_micros(col("ts")).as("p_us"))
      val c = events.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("event_id").as("click_id"), unix_micros(col("ts")).as("c_us"))
      val want = p.join(
          c,
          col("pu") === col("cu") && col("c_us") >= col("p_us") - lit(600000000L) && col("c_us") < col("p_us"),
        )
        .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
      assert(got == want, s"stream=${got.size} batch=${want.size}")
      assert(want.nonEmpty, "the corpus should contain purchase-click matches")
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER interval join emits unmatched purchases after the watermark") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val input = stream.toDF().toDF("user_id", "ts", "event_id", "event_type", "value")
    val q = EventsStream.purchaseClickLeftJoin(input, lookbackMinutes = 10)
      .writeStream.format("memory").queryName("sslj_out").outputMode("append").start()
    try {
      val evs = events.as[(Long, Timestamp, Long, String, Double)].collect().toSeq
        .sortBy(e => (e._2.getTime, e._3))
      val (b1, b2) = evs.splitAt(evs.size / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      // null rows for unmatched purchases only emit once the watermark
      // PROVES no qualifying click can still arrive: push it past every
      // real timestamp with sentinel rows on both sides (user -1 never
      // matches anything real and is excluded from the comparison)
      val horizon = new Timestamp(evs.map(_._2.getTime).max + 4L * 3600 * 1000)
      stream.addData(Seq((-1L, horizon, -1L, "click", 0.0), (-1L, horizon, -2L, "purchase", 0.0)))
      q.processAllAvailable()
      // one more empty-ish batch so the advanced watermark evicts state
      stream.addData(Seq((-1L, horizon, -3L, "click", 0.0)))
      q.processAllAvailable()

      val got = spark.table("sslj_out").filter(col("user_id") =!= -1L)
        .select(col("purchase_id"), col("click_id"))
        .as[(Long, Option[Long])].collect().toSet

      val p = events.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("event_id").as("purchase_id"), unix_micros(col("ts")).as("p_us"))
      val c = events.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("event_id").as("click_id"), unix_micros(col("ts")).as("c_us"))
      val want = p.join(
          c,
          col("pu") === col("cu") && col("c_us") >= col("p_us") - lit(600000000L) && col("c_us") < col("p_us"),
          "left_outer",
        )
        .select(col("purchase_id"), col("click_id")).as[(Long, Option[Long])].collect().toSet
      assert(got == want, s"stream=${got.size} batch=${want.size}")
      assert(want.exists(_._2.isEmpty), "the corpus should contain never-clicked purchases")
      assert(want.exists(_._2.nonEmpty))
    } finally q.stop()
  }

  test("stream-stream FULL OUTER interval join emits both unmatched sides after the watermark") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val input = stream.toDF().toDF("user_id", "ts", "event_id", "event_type", "value")
    val q = EventsStream.purchaseClickFullJoin(input, lookbackMinutes = 10)
      .writeStream.format("memory").queryName("ssfj_out").outputMode("append").start()
    try {
      val evs = events.as[(Long, Timestamp, Long, String, Double)].collect().toSeq
        .sortBy(e => (e._2.getTime, e._3))
      val (b1, b2) = evs.splitAt(evs.size / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val horizon = new Timestamp(evs.map(_._2.getTime).max + 4L * 3600 * 1000)
      stream.addData(Seq((-1L, horizon, -1L, "click", 0.0), (-1L, horizon, -2L, "purchase", 0.0)))
      q.processAllAvailable()
      stream.addData(Seq((-1L, horizon, -3L, "click", 0.0)))
      q.processAllAvailable()

      val got = spark.table("ssfj_out").filter(col("user_id") =!= -1L)
        .select(col("purchase_id"), col("click_id"))
        .as[(Option[Long], Option[Long])].collect().toSet

      val p = events.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pu"), col("event_id").as("purchase_id"), unix_micros(col("ts")).as("p_us"))
      val c = events.filter(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("event_id").as("click_id"), unix_micros(col("ts")).as("c_us"))
      val want = p.join(
          c,
          col("pu") === col("cu") && col("c_us") >= col("p_us") - lit(600000000L) && col("c_us") < col("p_us"),
          "full_outer",
        )
        .select(col("purchase_id"), col("click_id")).as[(Option[Long], Option[Long])].collect().toSet
      assert(got == want, s"stream=${got.size} batch=${want.size}")
      // all three row classes must be present for the test to mean anything
      assert(want.exists(t => t._1.nonEmpty && t._2.nonEmpty))
      assert(want.exists(t => t._1.nonEmpty && t._2.isEmpty), "never-clicked purchases")
      assert(want.exists(t => t._1.isEmpty && t._2.nonEmpty), "never-converted clicks")
    } finally q.stop()
  }

  test("streaming lake sink: micro-batches land content-addressed, replays dedupe") {
    implicit val sc = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream-lake")
    val lake = graft.lake.Lake.init(spark, graft.lake.LakeConfig(Seq(graft.lake.StoreEntry(s"$tmp/store"))))
    val stream = MemoryStream[String]
    val blobs = stream.toDF().select(col("value").cast("binary").as("data"))
    val q = EventsStream.lakeSink(blobs, lake, s"$tmp/ckpt")
    try {
      val payloads = Seq("stream blob one " * 20, "stream blob two " * 20, "tiny")
      stream.addData(payloads)
      q.processAllAvailable()
      stream.addData(payloads) // replay: content addressing must dedupe
      q.processAllAvailable()
      assert(lake.stores.head.catalog.count() == 3, "replayed batch must not add blobs")
      payloads.foreach { p =>
        val h = java.security.MessageDigest.getInstance("SHA-256")
          .digest(p.getBytes).map("%02x".format(_)).mkString
        assert(new String(lake.getBlob(h)) == p)
      }
    } finally q.stop()
  }

  test("scheduled scrub rides the ingest stream: corruption planted between batches is reported by the next tick while puts continue") {
    implicit val sc = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream-scrub")
    val lake = graft.lake.Lake.init(spark, graft.lake.LakeConfig(Seq(graft.lake.StoreEntry(s"$tmp/store"))))
    val stream = MemoryStream[String]
    val blobs = stream.toDF().select(col("value").cast("binary").as("data"))
    val reports = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Map[String, Long])]
    val q = EventsStream.lakeSinkWithScrub(blobs, lake, s"$tmp/ckpt", scrubEvery = 1,
      (id, rep) => { reports.add(id -> rep); () })
    try {
      stream.addData(Seq("scrubbed stream blob A " * 20, "scrubbed stream blob B " * 20))
      q.processAllAvailable()
      val tick0 = reports.poll()
      assert(tick0 != null && tick0._2("scanned_chunks") > 0, s"first tick must scan: $tick0")
      assert(tick0._2("payload_hash_mismatch") == 0L, s"healthy store scrubs clean: $tick0")

      // between micro-batches: bit rot lands in one at-rest chunk
      val store = lake.stores.head
      val rows = store.chunks.collect()
      val mutated = rows.zipWithIndex.map { case (r, i) =>
        var data = r.getAs[Array[Byte]](3)
        if (i == 0) { data = data.clone(); data(0) = (data(0) ^ 0x7f).toByte }
        (r.getString(0), r.getLong(1), r.getString(2), data, r.getInt(4))
      }.toSeq
      mutated.toDF("chunk_hash", "size", "enc", "data", "bucket")
        .write.mode("overwrite").partitionBy("bucket").parquet(s"$tmp/store/chunks")

      // ingestion continues; the NEXT scrub tick must surface the rot
      stream.addData(Seq("scrubbed stream blob C " * 20))
      q.processAllAvailable()
      val tick1 = reports.poll()
      assert(tick1 != null, "second tick must fire")
      assert(tick1._2("payload_hash_mismatch") == 1L,
        s"the planted bit flip must be reported by the next tick: $tick1")
      assert(tick1._2("scanned_chunks") > tick0._2("scanned_chunks"),
        "puts continued between ticks (more chunks at rest)")
      // the put path stayed live through the corrupted store
      assert(lake.stores.head.catalog.count() == 3L)
    } finally q.stop()
  }

  test("streaming near-dup candidates: cross-batch dups caught, distinct docs silent") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String)]
    val input = stream.toDF().toDF("doc_id", "ts", "text")
    val q = EventsStream.nearDupCandidates(input)
      .writeStream.format("memory").queryName("neardup_out").outputMode("append").start()
    try {
      val base = ("many shared words in this rather long synthetic document body " * 6).trim
      val t = Timestamp.valueOf("2026-01-01 10:00:00")
      // batch 1: the original + an unrelated doc
      stream.addData(Seq((1L, t, base), (50L, t, "completely different vocabulary everywhere " * 8)))
      q.processAllAvailable()
      // batch 2: a near-identical copy (one word appended) + another unrelated doc
      stream.addData(Seq((2L, t, base + " tail"), (60L, t, "nothing alike here at all " * 9)))
      q.processAllAvailable()
      val pairs = spark.table("neardup_out")
        .select("doc_a", "doc_b").distinct().as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 2L)), s"cross-batch near-dup not caught: $pairs")
      assert(pairs.forall { case (a, b) => Set(a, b) == Set(1L, 2L) },
        s"unrelated docs must not pair: $pairs")
      // candidates match the batch band index: every emitted pair shares
      // a band in the batch formulation too
      val batchBands = Seq((1L, base), (2L, base + " tail"))
        .toDF("doc_id", "text")
        .select(col("doc_id"), explode(graft.operators.Dedup.bandArrayOf(
          graft.operators.Dedup.signature(graft.operators.Dedup.shingles))).as("b"))
        .select(col("doc_id"), col("b.band_idx"), col("b.band_key"))
      val shared = batchBands.as("x").join(batchBands.as("y"),
        col("x.band_idx") === col("y.band_idx") && col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id")).count()
      assert(shared > 0, "batch index must agree that the pair collides")
    } finally q.stop()
  }

  test("streaming quality filter equals batch text_filter (stateless transform reuse)") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val input = stream.toDF().toDF("doc_id", "text")

    val q = operators.Pipeline.textFilterOn(input)
      .writeStream.format("memory").queryName("filter_out").outputMode("append").start()
    try {
      val docs = GraftSession.table(spark, sf, "documents")
        .select(col("doc_id"), col("text")).as[(Long, String)].collect().toSeq
      // two micro-batches: verdicts must not depend on batch boundaries
      val (b1, b2) = docs.splitAt(docs.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()

      val got = spark.table("filter_out").orderBy("doc_id")
      val want = operators.Pipeline.textFilter(spark, sf)
      assert(got.collect().toSeq == want.collect().toSeq)
      assert(got.filter(!col("keep")).count() > 0, "filter should fire on this corpus")
    } finally q.stop()
  }

  test("streaming DSIR scoring equals batch sample_dsir weights (frozen standing model)") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, String, String)]
    val input = stream.toDF().toDF("doc_id", "source", "text")

    val model = operators.Pipeline.dsirModel(spark, sf)
    assert(model.size == 4096, "the densified model must cover every bucket")
    val q = operators.Pipeline.dsirScoreOn(input, model)
      .writeStream.format("memory").queryName("dsir_out").outputMode("append").start()
    try {
      val docs = GraftSession.table(spark, sf, "documents")
        .select(col("doc_id"), col("source"), col("text"))
        .as[(Long, String, String)].collect().toSeq
      val (b1, b2) = docs.splitAt(docs.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()

      val got = spark.table("dsir_out").collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_tokens"), r.getAs[Long]("dsir_micro")))).toMap
      val want = operators.Pipeline.sampleDsir(spark, sf).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_tokens"), r.getAs[Long]("dsir_micro")))).toMap
      assert(got == want, "stream scores diverge from the batch weights")
    } finally q.stop()
  }

  test("streaming binary quantization equals batch emb_bitpack (stateless, nothing to freeze)") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val input = stream.toDF().toDF("vec_id", "embedding")
    val q = operators.VectorOps.bitpackOn(input)
      .writeStream.format("memory").queryName("bitpack_out").outputMode("append").start()
    try {
      val vecs = GraftSession.table(spark, sf, "embeddings")
        .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect().toSeq
      val (b1, b2) = vecs.splitAt(vecs.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val got = spark.table("bitpack_out").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
      val want = operators.VectorOps.queries("emb_bitpack")(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      assert(got == want, "streamed sign codes diverge from the batch pack")
    } finally q.stop()
  }

  test("streaming IVF ingest monitor equals batch ann_incremental report (frozen quantizer)") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val input = stream.toDF().toDF("id", "embedding")

    val e = GraftSession.table(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val snap = operators.VectorOps.ivfSnapshot(e.filter(col("id") % 10 =!= 0), 16)
    assert(snap.centroids.size == 16 && snap.oldStats.nonEmpty)

    @volatile var latest: Seq[(Int, Long, Long, Long, Long, Long, Long)] = Seq.empty
    @volatile var publishes = 0
    @volatile var everyReportFull = true
    val q = streaming.EventsStream.ivfIngestMonitor(input, snap) { (_, rep) =>
      val rows = rep.collect().toSeq.map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      // the frozen old side covers every list, so EVERY republish is
      // the full-width retrain-trigger report, never a delta
      if (rows.map(_._1).toSet != snap.oldStats.keySet) everyReportFull = false
      latest = rows; publishes += 1
    }.start()
    try {
      val fresh = e.filter(col("id") % 10 === 0)
        .as[(Long, Seq[Float])].collect().toSeq
      // hash-sliced micro-batches: convergence must not depend on the split
      val slices = fresh.groupBy(t => math.abs(t._1.hashCode) % 3).toSeq.sortBy(_._1)
      assert(slices.size == 3)
      var fed = 0L
      slices.foreach { case (_, s) =>
        stream.addData(s); q.processAllAvailable()
        fed += s.size
        // conservation per trigger: arrivals so far all land in some list
        assert(latest.map(_._3).sum == fed, "n_new must conserve arrivals")
      }
      val want = operators.VectorOps.queries("ann_incremental")(spark, sf)
        .collect().toSeq.map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      assert(latest.sortBy(_._1) == want.sortBy(_._1),
        "converged stream report diverges from batch ann_incremental")
      assert(publishes >= 3 && everyReportFull)
    } finally q.stop()
  }

  test("streaming k-NN graph ingest equals the sequential batch append fold") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val input = stream.toDF().toDF("id", "embedding")

    val e = GraftSession.table(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val base = e.filter(col("id") % 10 =!= 0)
    val g0 = operators.VectorOps.knnGraph(base, 5, 3)

    @volatile var latest: Seq[(Long, Long, Long)] = Seq.empty
    @volatile var publishes = 0
    val q = streaming.EventsStream.graphIngestMonitor(input, base, g0) { (_, g) =>
      latest = g.collect().toSeq
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id")))
      publishes += 1
    }.start()
    try {
      val fresh = e.filter(col("id") % 10 === 0).as[(Long, Seq[Float])].collect().toSeq
      // arrival ids are all ≡0 mod 10, so slice on id/10 parity
      val slices = fresh.groupBy(t => (t._1 / 10) % 2).toSeq.sortBy(_._1).map(_._2)
      assert(slices.size == 2)
      var expectedCorpus = base
      var expectedGraph = g0
      slices.foreach { s =>
        stream.addData(s); q.processAllAvailable()
        val arrivals = s.toDF("id", "embedding")
        expectedGraph = operators.VectorOps.knnGraphAppend(expectedCorpus, arrivals, expectedGraph, 5)
        expectedCorpus = expectedCorpus.unionAll(arrivals).localCheckpoint()
        val want = expectedGraph.collect().toSeq
          .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank"), r.getAs[Long]("neighbor_id")))
        assert(latest.sorted == want.sorted,
          "streamed graph diverges from the sequential batch append at this trigger")
      }
      // conservation at convergence: every vector owns exactly 5 rows
      val byNode = latest.groupBy(_._1)
      assert(byNode.keySet == e.select(col("id")).as[Long].collect().toSet)
      byNode.values.foreach(rs => assert(rs.length == 5))
      assert(publishes >= 2)
    } finally q.stop()
  }

  test("streaming adaptive quality gate equals batch text_adaptive_filter (frozen thresholds)") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, String, String)]
    val input = stream.toDF().toDF("doc_id", "source", "text")

    val thresholds = operators.TextAnalysis.adaptiveThresholds(spark, sf)
    assert(thresholds.nonEmpty)
    val q = operators.TextAnalysis.adaptiveFilterOn(input, thresholds)
      .writeStream.format("memory").queryName("adaptive_out").outputMode("append").start()
    try {
      val docs = GraftSession.table(spark, sf, "documents")
        .select(col("doc_id"), col("source"), col("text"))
        .as[(Long, String, String)].collect().toSeq
      // verdicts must not depend on micro-batch boundaries
      val (b1, b2) = docs.splitAt(docs.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()

      val got = spark.table("adaptive_out").collect()
      assert(got.length == docs.length)
      got.foreach { r =>
        assert(r.getAs[Long]("threshold_ppm") == thresholds(r.getAs[String]("source")))
        assert(r.getAs[Boolean]("kept") ==
          (r.getAs[Long]("score_ppm") >= r.getAs[Long]("threshold_ppm")))
      }
      // the streamed keep receipts aggregate to the batch gate's rows
      val keptAgg = got.filter(_.getAs[Boolean]("kept"))
        .groupBy(_.getAs[String]("source"))
        .map { case (src, rs) =>
          src -> ((rs.size.toLong, rs.map(_.getAs[Long]("doc_id")).sum)) }
      val want = operators.TextAnalysis.textAdaptiveFilter(spark, sf).collect()
        .map(r => r.getAs[String]("source") ->
          ((r.getAs[Long]("threshold_ppm"), r.getAs[Long]("n_kept"), r.getAs[Long]("kept_id_sum")))).toMap
      assert(keptAgg.keySet == want.keySet)
      keptAgg.foreach { case (src, (nKept, idSum)) =>
        val (thr, wantN, wantSum) = want(src)
        assert(thresholds(src) == thr)
        assert(nKept == wantN, s"$src kept count diverges from batch")
        assert(idSum == wantSum, s"$src kept id-sum diverges from batch")
      }
      // an unseen source gates at threshold 0: always kept
      stream.addData(Seq((999999L, "brand_new_source", "tiny doc")))
      q.processAllAvailable()
      val novel = spark.table("adaptive_out").filter(col("source") === "brand_new_source").collect()
      assert(novel.length == 1 && novel.head.getAs[Long]("threshold_ppm") == 0L
        && novel.head.getAs[Boolean]("kept"))
    } finally q.stop()
  }

  test("streaming importance sampling equals batch sample_importance (stateless reuse)") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, String, String)]
    val input = stream.toDF().toDF("doc_id", "source", "text")

    val q = operators.Pipeline.sampleImportanceOn(input)
      .writeStream.format("memory").queryName("imp_out").outputMode("append").start()
    try {
      val docs = GraftSession.table(spark, sf, "documents")
        .select(col("doc_id"), col("source"), col("text")).as[(Long, String, String)].collect().toSeq
      // keep decisions must not depend on micro-batch boundaries
      val (b1, b2) = docs.splitAt(docs.length / 3)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()

      val got = spark.table("imp_out").orderBy("doc_id")
      val want = operators.Pipeline.sampleImportance(spark, sf)
      assert(got.collect().toSeq == want.collect().toSeq)
      assert(got.filter(col("kept")).count() > 0, "some docs must be kept")
      assert(got.filter(!col("kept")).count() > 0, "some docs must be dropped")
    } finally q.stop()
  }

  test("stream-static enrichment equals the batch join+window aggregate") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val input = stream.toDF().toDF("user_id", "ts", "event_id", "event_type", "value")
    val dim = GraftSession.table(spark, sf, "customer")
      .select(col("c_custkey").cast("long").as("user_id"), col("c_mktsegment").as("segment"))
    val q = EventsStream.enrichedWindowedCounts(input, dim)
      .writeStream.format("memory").queryName("enrich_out").outputMode("append").start()
    try {
      val evs = events.as[(Long, Timestamp, Long, String, Double)].collect().toSeq
      // ts-ordered split: the second batch never falls behind the first
      // batch's watermark, so stream≡batch must hold exactly
      val (b1, b2) = evs.sortBy(_._2.getTime).splitAt(evs.size / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      stream.addData(Seq((0L, Timestamp.valueOf("2030-01-01 00:00:00"), 0L, "sentinel", 0.0)))
      q.processAllAvailable()

      val got = spark.table("enrich_out").filter(col("day") < lit("2029-01-01"))
      val want = events.join(dim, Seq("user_id"), "left")
        .groupBy(date_trunc("day", col("ts")).as("day"), col("segment"))
        .agg(count(lit(1)).as("n_events"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"stream=${got.count()} batch=${want.count()}")
      assert(got.filter(col("segment").isNotNull).count() > 0, "some events must enrich")
    } finally q.stop()
  }

  test("streaming hopping windows equal the batch q_hopping 4-fold assignment") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val input = stream.toDF().toDF("user_id", "ts", "event_id", "event_type", "value")

    val q = EventsStream.hoppingCounts(input)
      .writeStream.format("memory").queryName("hop_out").outputMode("append").start()
    try {
      val data = events.as[(Long, Timestamp, Long, String, Double)].collect().toSeq
      val (b1, b2) = data.splitAt(data.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      stream.addData(Seq((0L, Timestamp.valueOf("2030-01-01 00:00:00"), 0L, "sentinel", 0.0)))
      q.processAllAvailable()

      val got = spark.table("hop_out").filter(col("event_type") =!= "sentinel")
      val want = events
        .groupBy(window(col("ts"), "1 day", "6 hours").as("win"), col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(floor(col("value")).cast("long")).as("sum_floor_value"))
        .select(col("win.start").as("window_start"), col("event_type"),
          col("n_events"), col("sum_floor_value"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"stream=${got.count()} batch=${want.count()}")
      // each event in exactly windows/hop = 4 windows
      assert(got.agg(sum(col("n_events"))).head.getLong(0) == 4L * events.count())
    } finally q.stop()
  }

  test("native session_window stream equals the batch gap-sessionization boundaries") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val input = stream.toDF().toDF("user_id", "ts", "event_id", "event_type", "value")

    val q = EventsStream.sessionWindowCounts(input)
      .writeStream.format("memory").queryName("sw_out").outputMode("append").start()
    try {
      val data = events.as[(Long, Timestamp, Long, String, Double)].collect().toSeq
      val (b1, b2) = data.splitAt(data.length / 3)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      // sentinel user -1: a real user 0 exists in the corpus
      stream.addData(Seq((-1L, Timestamp.valueOf("2030-01-01 00:00:00"), 0L, "sentinel", 0.0)))
      q.processAllAvailable()

      val got = spark.table("sw_out").filter(col("user_id") =!= -1L)
      // batch twin of the 30-minute gap rule (the q_sessionize shape)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val want = events
        .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
        .withColumn("new_s",
          when(col("prev_us").isNull || (unix_micros(col("ts")) - col("prev_us")) > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("session_id",
          sum(col("new_s")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("session_id"))
        .agg(min(col("ts")).as("session_start"), count(lit(1)).as("n_events"))
        .select(col("user_id"), col("session_start"), col("n_events"))
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        s"stream=${got.count()} batch=${want.count()}")
    } finally q.stop()
  }

  test("streaming CDC apply converges to the batch latest-wins snapshot across splits and replays") {
    implicit val sc = spark.sqlContext
    import EventsStream.{CdcOut, Change}
    val stream = MemoryStream[Change]

    val q = EventsStream.cdcApply(stream.toDS())
      .writeStream.format("memory").queryName("cdc_out").outputMode("update").start()
    try {
      // change feed derived from events: key = user bucket, seq =
      // event_id (unique, time-ordered), every 11th change a delete
      val changes = events
        .select(
          (col("user_id") % 50).as("key"),
          col("event_id").as("seq"),
          when(col("event_id") % 11 === 0, "delete").otherwise("upsert").as("op"),
          col("value"),
        )
        .as[Change].collect().toSeq
      // out-of-order delivery: batches sliced by a hash, not by seq,
      // and the middle batch is replayed verbatim
      val b = changes.groupBy(c => (c.seq * 2654435761L % 3 + 3) % 3)
      stream.addData(b(0L)); q.processAllAvailable()
      stream.addData(b(1L)); q.processAllAvailable()
      stream.addData(b(1L)); q.processAllAvailable() // replay
      stream.addData(b(2L)); q.processAllAvailable()

      // the snapshot is each key's LAST emission = its max-seq state
      val w = Window.partitionBy(col("key")).orderBy(col("seq").desc)
      val got = spark.table("cdc_out")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
        .as[CdcOut].collect().toSeq.sortBy(_.key)
      val want = changes.groupBy(_.key).map { case (k, cs) =>
        val top = cs.maxBy(c => (c.seq, c.op, c.value))
        CdcOut(k, top.seq, top.value, top.op == "delete")
      }.toSeq.sortBy(_.key)
      assert(got == want)
      assert(got.exists(_.deleted) && got.exists(!_.deleted),
        "snapshot must carry both live rows and tombstones")
    } finally q.stop()
  }

  test("streaming doc pipeline equals batch pipeline_e2e (filter+dedup+decontam+sample)") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, String, String)]
    val input = stream.toDF().toDF("doc_id", "ts", "source", "text")
    val docs = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text"))
      .as[(Long, String, String)].collect().toSeq.sortBy(_._1)
    val evalGrams = GraftSession.table(spark, sf, "documents")
      .filter(col("doc_id") % 37 === 0)
      .select(explode(array_distinct(
        graft.functions.ArrayExprs.wordNgrams(split(col("text"), " "), 5))).as("g"))
      .as[String].collect().toSet
    val q = EventsStream.docPipeline(input, evalGrams)
      .writeStream.format("memory").queryName("docpipe_out").outputMode("append").start()
    try {
      // batch dedup keeps the MIN doc_id per content hash; the stream
      // keeps the FIRST ARRIVAL. The sf0.001 corpus has no exact text
      // duplicates, so feed it in two halves (identical verdicts to
      // batch), then PLANT cross-batch duplicates of kept docs in a
      // third batch — each planted id is chosen so it would survive
      // the %37 and sampling gates, so its absence from the output
      // can only be the dedup state dropping it.
      val base = 1723500000000L
      def u32(source: String, id: Long): Long = {
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$source:$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(md.substring(0, 8), 16)
      }
      def rateOf(source: String): Double = (1.0 + source.drop(3).toInt % 4) / 4.0
      def wouldSurvive(source: String, id: Long): Boolean =
        id % 37 != 0 && u32(source, id) < (rateOf(source) * 4294967296.0).toLong
      val want = operators.Pipeline.pipelineE2e(spark, sf)
        .select("doc_id", "source", "rate", "content_hash").orderBy("doc_id").collect().toSeq
      val (b1, b2) = docs.map { case (id, s, t) => (id, new Timestamp(base + id * 1000), s, t) }
        .splitAt(docs.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      // duplicate END-TO-END SURVIVORS specifically: their hashes are
      // provably in the dedup state, so only dedup can drop the clones
      val keptIds = want.map(_.getAs[Long]("doc_id")).toSet
      val planted = docs.filter(d => keptIds(d._1)).take(20).map { case (_, s, t) =>
        val id = Iterator.iterate(1000001L)(_ + 1).find(wouldSurvive(s, _)).get
        (id, new Timestamp(base + 600000L + id), s, t)
      }
      assert(planted.nonEmpty)
      stream.addData(planted); q.processAllAvailable()
      val got = spark.table("docpipe_out")
        .select("doc_id", "source", "rate", "content_hash").orderBy("doc_id").collect().toSeq
      assert(got.nonEmpty)
      assert(!got.exists(_.getAs[Long]("doc_id") >= 1000000L),
        "planted cross-batch duplicates must be dropped by the dedup state")
      assert(got == want)
    } finally q.stop()
  }

  test("streaming CMS cells converge to the batch sketch across splits") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Long]
    val input = stream.toDF().toDF("user_id")
    val (depth, width) = (operators.TableFormat.CmsDepth, operators.TableFormat.CmsWidth)

    val q = EventsStream.cmsSketch(input, depth, width)
      .writeStream.format("memory").queryName("cms_out").outputMode("update").start()
    try {
      val users = GraftSession.table(spark, sf, "events")
        .select(col("user_id")).as[Long].collect().toSeq
      // arrival order decorrelated from value: hash-sliced batches
      val b = users.groupBy(u => (u * 2654435761L % 3 + 3) % 3)
      stream.addData(b(0L)); q.processAllAvailable()
      stream.addData(b(1L)); q.processAllAvailable()
      stream.addData(b(2L)); q.processAllAvailable()

      // last emission per cell = its converged counter
      val w = Window.partitionBy(col("r"), col("b")).orderBy(col("cell").desc)
      val got = spark.table("cms_out")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("r"), col("b"), col("cell"))
        .as[(Long, Long, Long)].collect().map { case (r, bk, c) => (r, bk) -> c }.toMap

      def md5hex(s: String): String =
        java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      val want = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
      for (u <- users; r <- 0L until depth.toLong) {
        val h = java.lang.Long.parseLong(md5hex(s"$r:$u").take(8), 16)
        val key = (r, ((h % width) + width) % width)
        want(key) = want.getOrElse(key, 0L) + 1
      }
      assert(got == want.toMap, "streaming CMS matrix diverges from the batch hashing")
      // bounded state: never more cells than the d×w matrix
      assert(got.size <= depth * width)
    } finally q.stop()
  }

  test("streaming domain cap converges to the batch per-source kept set across splits") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val input = stream.toDF().toDF("doc_id", "source")

    val q = EventsStream.domainCap(input, operators.Pipeline.DomainCapK)
      .writeStream.format("memory").queryName("cap_out").outputMode("update").start()
    try {
      val docs = GraftSession.table(spark, sf, "documents")
        .select(col("doc_id"), col("source")).as[(Long, String)].collect().toSeq
      // arrival order decorrelated from doc_id: hash-sliced batches
      val b = docs.groupBy(d => (d._1 * 2654435761L % 3 + 3) % 3)
      stream.addData(b(0L)); q.processAllAvailable()
      stream.addData(b(1L)); q.processAllAvailable()
      stream.addData(b(2L)); q.processAllAvailable()

      // last emission per source = its converged kept set
      val w = Window.partitionBy(col("source")).orderBy(col("n_seen").desc)
      val got = spark.table("cap_out")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("source"), col("kept"))
        .as[(String, Seq[Long])].collect().toMap
      val want = operators.Pipeline.textDomainCap(spark, sf).collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("rank"), r.getAs[Long]("doc_id")))
        .groupBy(_._1).map { case (s, xs) => s -> xs.sortBy(_._2).map(_._3).toSeq }
      assert(got == want, "streaming kept sets diverge from batch textDomainCap")
      // per-source doc counts must equal the corpus (nothing dropped from state accounting)
      val seen = spark.table("cap_out")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("source"), col("n_seen")).as[(String, Long)].collect().toMap
      val nDocs = docs.groupBy(_._2).map { case (s, xs) => s -> xs.size.toLong }
      assert(seen == nDocs)
    } finally q.stop()
  }

  test("multimodal features roundtrip through the batched decoder") {
    val feats = multimodal.Multimodal.multimodalFeatures(spark, sf).collect()
    assert(feats.length == 500)
    feats.foreach { r =>
      assert(r.getAs[Int]("width") >= 1 && r.getAs[Int]("width") <= 256)
      val bright = r.getAs[Double]("brightness")
      assert(bright > 0 && bright < 256)
      if (r.getAs[String]("kind") == "vid") assert(r.getAs[Int]("n_frames") >= 1)
    }
    val kinds = feats.map(_.getAs[String]("kind")).toSet
    assert(kinds == Set("img", "aud", "vid"))
  }

  test("checkpointed file-source → file-sink restart is exactly-once (no loss, no duplicates)") {
    // the fault-tolerance contract a production stream lives on: kill
    // the query between micro-batches, restart from the checkpoint,
    // and the (idempotent) file sink must hold each closed window's
    // aggregate exactly once — proven against the batch answer
    val root = java.nio.file.Files.createTempDirectory("graft-restart").toString
    val (srcDir, outDir, ckpt) = (s"$root/src", s"$root/out", s"$root/ckpt")
    val all = events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
      .orderBy("ts").collect()
    val sch = events.select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value")).schema
    def writeSlice(rows: Seq[org.apache.spark.sql.Row], part: Int): Unit =
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), sch)
        .write.mode("append").parquet(srcDir)
    def startQ() = EventsStream
      .windowedCounts(spark.readStream.schema(sch).parquet(srcDir))
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).outputMode("append").start()

    val third = all.length / 3
    writeSlice(all.slice(0, third).toSeq, 0)
    val q1 = startQ()
    try { q1.processAllAvailable() } finally q1.stop()
    writeSlice(all.slice(third, 2 * third).toSeq, 1) // lands while the query is DOWN
    val q2 = startQ()
    try {
      q2.processAllAvailable()
      writeSlice(all.slice(2 * third, all.length).toSeq, 2)
      q2.processAllAvailable()
      // sentinel far in the future closes every real window
      writeSlice(Seq(org.apache.spark.sql.Row(0L,
        java.sql.Timestamp.valueOf("2031-01-01 00:00:00"), 0L, "sentinel", 0.0)), 3)
      q2.processAllAvailable()
    } finally q2.stop()

    val got = spark.read.parquet(outDir)
      .filter(col("event_type") =!= "sentinel")
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("n_events")).as("n_events"), count(lit(1)).as("emissions"))
      .collect()
    // exactly-once: every (day, type) emitted exactly one aggregate row
    got.foreach(r => assert(r.getAs[Long]("emissions") == 1L,
      s"duplicate emission for ${r.get(0)}/${r.get(1)}"))
    val want = events
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .collect().map(r => (r.get(0), r.getAs[String]("event_type")) -> r.getAs[Long]("n_events")).toMap
    val gotMap = got.map(r => (r.get(0), r.getAs[String]("event_type")) -> r.getAs[Long]("n_events")).toMap
    assert(gotMap == want, s"restart lost or duplicated data: got=${gotMap.size} want=${want.size}")
  }

  test("streaming growth classifier equals batch classification INCLUDING trailing churn") {
    implicit val sc = spark.sqlContext
    import EventsStream.{GrowthOut, UserDay}

    val MsPerDay = 86400000L
    def dayTs(day: Long, offsetMs: Long = 0L) = new java.sql.Timestamp(day * MsPerDay + offsetMs)
    val userDays = events
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().as[(Long, Long)].collect().map(t => UserDay(t._1, t._2, dayTs(t._2))).toSeq
    val dMax = userDays.map(_.day).max

    val stream = MemoryStream[UserDay]
    val q = EventsStream.growthClasses(stream.toDS())
      .writeStream.format("memory").queryName("growth_out").outputMode("append").start()
    try {
      // in-order-per-user split across three micro-batches by day range
      val days = userDays.map(_.day).distinct.sorted
      val cut1 = days(days.length / 3); val cut2 = days(2 * days.length / 3)
      stream.addData(userDays.filter(_.day <= cut1)); q.processAllAvailable()
      stream.addData(userDays.filter(d => d.day > cut1 && d.day <= cut2)); q.processAllAvailable()
      stream.addData(userDays.filter(_.day > cut2)); q.processAllAvailable()
      // advance the watermark to JUST past the close of the final real
      // day: users last active before dMax see their (last+2)-day
      // timeout crossed and emit trailing churn; users active ON dMax
      // time out strictly later and never churn — batch's d_max clip.
      // Two sentinel batches: the first moves the watermark at its
      // batch end, the second triggers the batch that processes the
      // now-expired timeouts.
      stream.addData(Seq(UserDay(-1L, dMax + 1, dayTs(dMax + 1, 1000)))); q.processAllAvailable()
      stream.addData(Seq(UserDay(-2L, dMax + 1, dayTs(dMax + 1, 1000)))); q.processAllAvailable()

      val got = spark.table("growth_out").as[GrowthOut].collect()
        .filter(_.user_id >= 0)
        .map(o => (o.user_id, o.day, o.status)).toSet

      // batch replay: qGrowth's FULL classification — gap churn the
      // moment it is observed, trailing churn at last+1 clipped at d_max
      val want = userDays.groupBy(_.user_id).toSeq.flatMap { case (u, xs) =>
        val ds = xs.map(_.day).distinct.sorted
        val classes = ds.zipWithIndex.flatMap { case (d, i) =>
          if (i == 0) Seq((u, d, "new"))
          else if (ds(i - 1) == d - 1) Seq((u, d, "retained"))
          else Seq((u, ds(i - 1) + 1, "churned"), (u, d, "resurrected"))
        }
        val trailing =
          if (ds.last < dMax) Seq((u, ds.last + 1, "churned")) else Nil
        classes ++ trailing
      }.toSet
      assert(got == want, "streaming growth classes diverge from the batch classification")
      // cross-check ALL FOUR classes against batch qGrowth day totals —
      // trailing churn now included, so the parity is complete
      val batch = operators.Relational.qGrowth(spark, sf).collect()
        .map(r => r.getAs[Long]("day") ->
          ((r.getAs[Long]("n_new"), r.getAs[Long]("n_retained"),
            r.getAs[Long]("n_resurrected"), r.getAs[Long]("n_churned"))))
        .toMap
      val gotByDay = got.toSeq.groupBy(_._2).map { case (d, xs) =>
        d -> ((xs.count(_._3 == "new").toLong, xs.count(_._3 == "retained").toLong,
          xs.count(_._3 == "resurrected").toLong, xs.count(_._3 == "churned").toLong))
      }
      batch.foreach { case (d, want4) =>
        assert(gotByDay.getOrElse(d, ((0L, 0L, 0L, 0L))) == want4, s"day $d class totals diverge")
      }
    } finally q.stop()
  }

  test("streaming CUSUM monitor equals a plain-Scala replay and alerts on planted drift") {
    implicit val sc = spark.sqlContext
    import EventsStream.{CusumOut, DayCount}

    // per-(type, day) counts from the corpus, plus a planted upward
    // drift: a synthetic type at its reference level for 3 days then 6×
    val corpus = events
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().map(t => DayCount(t._1, t._2, t._3)).toSeq
    val planted = (0L to 9L).map(d => DayCount("drift", d, if (d < 3) 10 else 60))
    val all = corpus ++ planted

    val stream = MemoryStream[DayCount]
    val q = EventsStream.cusumMonitor(stream.toDS(), refDays = 3, threshold = 50)
      .writeStream.format("memory").queryName("cusum_out").outputMode("append").start()
    try {
      // split across micro-batches in day order per type (the
      // windowedCounts→watermark emission contract)
      val days = all.map(_.day).distinct.sorted
      val (early, late) = days.splitAt(days.length / 2)
      stream.addData(all.filter(d => early.contains(d.day))); q.processAllAvailable()
      stream.addData(all.filter(d => late.contains(d.day))); q.processAllAvailable()

      val got = spark.table("cusum_out").as[CusumOut].collect()
        .map(o => (o.event_type, o.day) -> ((o.n, o.s_scaled, o.alert))).toMap

      // plain-Scala replay of the identical integer recursion
      val want = all.groupBy(_.event_type).flatMap { case (tpe, xs) =>
        val sorted = xs.sortBy(_.day)
        val ref = sorted.take(3)
        val refSum = ref.map(_.n).sum
        var s = 0L
        ref.map(dc => (tpe, dc.day) -> ((dc.n, 0L, false))) ++
          sorted.drop(3).map { dc =>
            s = math.max(0L, s + (dc.n * 3 - refSum))
            (tpe, dc.day) -> ((dc.n, s, s > 50 * 3))
          }
      }
      assert(got == want, "streaming CUSUM diverges from the replay")
      // the planted drift must alarm, and never during its reference days
      val driftAlerts = planted.filter(p => got((p.event_type, p.day))._3).map(_.day)
      assert(driftAlerts.nonEmpty && driftAlerts.min >= 3)
      assert(got(("drift", 3L))._3 || got(("drift", 4L))._3, "drift must alarm within 2 days")
    } finally q.stop()
  }

  test("streaming MinHash signatures converge to the batch signature across splits") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val input = stream.toDF().toDF("source", "text")

    val q = EventsStream.minhashSignatures(input)
      .writeStream.format("memory").queryName("mh_out").outputMode("update").start()
    try {
      val docs = GraftSession.table(spark, sf, "documents")
        .select(col("source"), col("text")).as[(String, String)].collect().toSeq
      // arrival order decorrelated from source: hash-sliced batches
      val b = docs.groupBy(d => (d._2.hashCode & Int.MaxValue) % 3)
      stream.addData(b.getOrElse(0, Nil)); q.processAllAvailable()
      stream.addData(b.getOrElse(1, Nil)); q.processAllAvailable()
      stream.addData(b.getOrElse(2, Nil)); q.processAllAvailable()

      // last emission per source = the converged signature
      val K = graft.operators.TextAnalysis.SketchK
      val rows = spark.table("mh_out").collect()
      val got = rows.groupBy(_.getString(0)).view.mapValues { rs =>
        // rows arrive in emission order within the memory sink; the
        // converged value of every slot is its minimum across
        // emissions (min only ever decreases)
        Array.tabulate(K)(j => rs.map(_.getLong(j + 1)).min)
      }.toMap

      def md5hex(s: String): String =
        java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      def shingles(text: String): Set[String] = {
        val ws = text.split(" ", -1)
        if (ws.length >= 3) ws.sliding(3).map(_.mkString(" ")).toSet
        else Set(ws.mkString(" "))
      }
      val P = 4294967311L
      val want = docs.groupBy(_._1).view.mapValues { ds =>
        val hs = ds.iterator.flatMap(d => shingles(d._2)).toSet.toArray
          .map((g: String) => java.lang.Long.parseLong(md5hex(g).take(8), 16))
        Array.tabulate(K)(j => hs.map(h => ((2L * j + 1) * h + j) % P).min)
      }.toMap

      assert(got.keySet == want.keySet)
      for (s <- want.keySet)
        assert(got(s).sameElements(want(s)), s"signature diverges for $s")
      // bounded state: one row per source per emission, never per doc
      assert(rows.length <= want.size * 3)
    } finally q.stop()
  }

  test("live overlap-matrix monitor republishes on update and converges to the batch sketch matrix") {
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val input = stream.toDF().toDF("source", "text")

    val published = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[(String, String, Long, Long)])]
    val q = EventsStream.overlapMatrixMonitor(input) { (id, matrix) =>
      published += ((id, matrix.collect().map(r =>
        (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))))
    }.start()
    try {
      val docs = GraftSession.table(spark, sf, "documents")
        .select(col("source"), col("text")).as[(String, String)].collect().toSeq
      val nSources = docs.map(_._1).distinct.size
      val b = docs.groupBy(d => (d._2.hashCode & Int.MaxValue) % 3)
      stream.addData(b.getOrElse(0, Nil)); q.processAllAvailable()
      stream.addData(b.getOrElse(1, Nil)); q.processAllAvailable()
      // duplicate replay of split 0: min-merge must absorb it
      stream.addData(b.getOrElse(0, Nil)); q.processAllAvailable()
      stream.addData(b.getOrElse(2, Nil)); q.processAllAvailable()

      assert(published.nonEmpty, "every trigger republishes the matrix")
      // bounded publish: never more than the full pair grid
      published.foreach { case (_, m) =>
        assert(m.length <= nSources * (nSources - 1) / 2)
      }
      // converged matrix ≡ the batch sketch op on the same corpus,
      // bit-exactly (same signature arithmetic, same pair-stage code)
      val want = graft.operators.TextAnalysis.textOverlapSketch(spark, sf)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toVector
      assert(published.last._2.toVector == want,
        "live matrix after the full corpus must equal the batch sketch matrix")
    } finally q.stop()
  }

  test("overlap monitor with persisted state survives a restart: second run sees only new data, matrix still converges") {
    implicit val sc = spark.sqlContext
    val stateDir = java.nio.file.Files.createTempDirectory("ovstate").toString + "/sigs"
    val docs = GraftSession.table(spark, sf, "documents")
      .select(col("source"), col("text")).as[(String, String)].collect().toSeq
    val b = docs.groupBy(d => (d._2.hashCode & Int.MaxValue) % 2)

    def runOnce(data: Seq[(String, String)]): Array[(String, String, Long, Long)] = {
      val stream = MemoryStream[(String, String)]
      var last: Array[(String, String, Long, Long)] = Array.empty
      val q = EventsStream.overlapMatrixMonitor(
        stream.toDF().toDF("source", "text"), Some(stateDir)) { (_, matrix) =>
        last = matrix.collect().map(r =>
          (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      }.start()
      try { stream.addData(data); q.processAllAvailable() } finally q.stop()
      last
    }

    runOnce(b.getOrElse(0, Nil))
    // "restart": a FRESH query and stream — no checkpoint, no shared
    // memory — fed ONLY the remaining half; the persisted store must
    // carry the first half's signature minima across the boundary
    val after = runOnce(b.getOrElse(1, Nil))
    val want = graft.operators.TextAnalysis.textOverlapSketch(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toVector
    assert(after.toVector == want,
      "restarted monitor must converge to the batch sketch matrix from only the new data")
  }

  test("streaming incremental curation reproduces the batch pipeline_incremental delta classification exactly") {
    implicit val sc = spark.sqlContext
    import EventsStream.{CurationOut, DocVersion}
    val stream = MemoryStream[DocVersion]
    val perBatch = scala.collection.mutable.ArrayBuffer.empty[Array[CurationOut]]
    val q = EventsStream.incrementalCurationStream(stream.toDS())
      .writeStream.outputMode("update")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[CurationOut], batchId: Long) =>
        perBatch += b.collect(): Unit
      }
      .start()
    try {
      val docs = GraftSession.table(spark, sf, "documents")
        .select(col("doc_id"), col("source"), col("text")).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[String]("text")))
      // batch 1: the simulated v1 snapshot pipeline_incremental derives
      val v1 = docs.filter(_._1 % 10 != 0).map { case (id, src, t) =>
        DocVersion(id, src, if (id % 7 == 0) t + " legacy-rev" else t)
      }
      stream.addData(v1.toSeq); q.processAllAvailable()
      // batch 2: the v2 corpus (current text)
      stream.addData(docs.map(d => DocVersion(d._1, d._2, d._3)).toSeq); q.processAllAvailable()

      assert(perBatch.head.forall(_.status == "new"), "an empty manifest classifies everything new")
      // the v2 batch must reproduce the batch operator's report
      val got = perBatch(1).groupBy(_.source).map { case (src, rs) =>
        src -> ((rs.count(_.status == "new").toLong, rs.count(_.status == "changed").toLong,
          rs.count(_.status == "unchanged").toLong, rs.map(_.n_tokens).sum,
          rs.filter(_.status != "unchanged").map(_.n_tokens).sum))
      }
      val want = graft.operators.Pipeline.pipelineIncremental(spark, sf).collect().map { r =>
        r.getAs[String]("source") -> ((r.getAs[Long]("n_new"), r.getAs[Long]("n_changed"),
          r.getAs[Long]("n_unchanged"), r.getAs[Long]("tokens_total"),
          r.getAs[Long]("tokens_recomputed")))
      }.toMap
      assert(got == want, s"stream delta report diverges from batch:\n$got\nvs\n$want")
    } finally q.stop()
  }

  test("overlap monitor store persist is crash-safe: a crash between demote and promote still restores from .old") {
    implicit val sc = spark.sqlContext
    val stateDir = java.nio.file.Files.createTempDirectory("ovcrash").toString + "/sigs"
    val docs = GraftSession.table(spark, sf, "documents")
      .select(col("source"), col("text")).as[(String, String)].collect().toSeq
    val b = docs.groupBy(d => (d._2.hashCode & Int.MaxValue) % 2)

    def runOnce(data: Seq[(String, String)]): Array[(String, String, Long, Long)] = {
      val stream = MemoryStream[(String, String)]
      var last: Array[(String, String, Long, Long)] = Array.empty
      val q = EventsStream.overlapMatrixMonitor(
        stream.toDF().toDF("source", "text"), Some(stateDir)) { (_, matrix) =>
        last = matrix.collect().map(r =>
          (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      }.start()
      try { stream.addData(data); q.processAllAvailable() } finally q.stop()
      last
    }

    runOnce(b.getOrElse(0, Nil))
    // simulate the mid-persist crash: the live store was demoted to
    // `.old` but the new one never took the live name
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    assert(fs.rename(new org.apache.hadoop.fs.Path(stateDir),
      new org.apache.hadoop.fs.Path(stateDir + ".old")), "test setup: demote live store")
    val after = runOnce(b.getOrElse(1, Nil))
    val want = graft.operators.TextAnalysis.textOverlapSketch(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toVector
    assert(after.toVector == want,
      "monitor restarted from the .old fallback must still converge to the batch matrix")
  }

  test("promoteStore never deletes a sole-survivor .old before the new store is live") {
    // the r12 ADVICE scenario: recovery state (only `.old` exists —
    // a prior crash landed between demote and promote), and THIS
    // persist fails before tmp→dst. The old code deleted `.old` up
    // front, so the failure left zero loadable stores; the fix only
    // clears `.old` to make room for a demote.
    val base = java.nio.file.Files.createTempDirectory("promote").toString
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    def p(s: String) = new org.apache.hadoop.fs.Path(s"$base/$s")
    def mk(s: String): Unit = {
      fs.mkdirs(p(s))
      val out = fs.create(new org.apache.hadoop.fs.Path(s"$base/$s/part-0"))
      out.writeBytes(s); out.close()
    }

    // 1) recovery state + failing promote (tmp absent → rename fails):
    //    must throw AND leave `.old` untouched
    mk("sigs.old")
    intercept[java.io.IOException] {
      EventsStream.promoteStore(fs, p("sigs.inprogress"), p("sigs"), p("sigs.old"))
    }
    assert(fs.exists(p("sigs.old")),
      "failed promote from the recovery state must preserve the sole-survivor .old")
    assert(!fs.exists(p("sigs")), "failed promote must not fabricate a live store")

    // 2) recovery state + valid tmp: promote lands, `.old` discarded
    mk("sigs.inprogress")
    EventsStream.promoteStore(fs, p("sigs.inprogress"), p("sigs"), p("sigs.old"))
    assert(fs.exists(p("sigs")) && !fs.exists(p("sigs.old")) && !fs.exists(p("sigs.inprogress")),
      "successful promote must leave exactly the live store")

    // 3) steady state (live + stale .old from a crash after promote):
    //    demote replaces .old, new store takes the live name
    mk("sigs.old"); mk("sigs.inprogress")
    EventsStream.promoteStore(fs, p("sigs.inprogress"), p("sigs"), p("sigs.old"))
    assert(fs.exists(p("sigs")) && !fs.exists(p("sigs.old")),
      "steady-state promote must rotate the stores")
  }
}
