package graft

import java.sql.Timestamp

import graft.streaming.EventsStream
import graft.streaming.EventsStream.{CdcOut, Change, Event, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The stateful streaming suite re-run under the RocksDB state store
  * provider (SURVEY §2.7 scale note): the default HDFS-backed provider
  * keeps every live key ON HEAP, so O(users) state (CDC apply, growth
  * classes) outgrows executor memory at 100 TB — RocksDB spills state
  * to local disk and is the provider a production deployment runs.
  * These tests prove the operators are provider-agnostic: identical
  * results for the state shapes that matter (mapGroupsWithState carry,
  * dropDuplicates state, update-mode convergence, bounded-sketch
  * state) on a session whose only difference is the provider conf.
  */
class RocksDbStateSpec extends AnyFunSuite {
  import TestSpark._

  /** Separate session: conf is session-scoped and read at query start,
    * so the provider swap cannot leak into the default-provider suite.
    */
  private lazy val rs = {
    val s = spark.newSession()
    s.conf.set(
      "spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }
  import rs.implicits._

  private lazy val events = GraftSession.table(rs, sf, "events")
    .select(col("user_id"), col("ts"), col("event_id"), col("event_type"), col("value"))
    .cache()

  test("rocksdb: sessionization carries open state across micro-batches identically") {
    implicit val sc = rs.sqlContext
    val stream = MemoryStream[Event]
    val q = EventsStream
      .sessionize(stream.toDS(), gapMs = 1800L * 1000)
      .writeStream.format("memory").queryName("rdb_sess_out").outputMode("append").start()
    try {
      val evs = events.select("user_id", "ts", "event_id").as[Event].collect().toSeq
      val (b1, b2) = evs.sortBy(e => (e.ts.getTime, e.event_id)).splitAt(evs.size / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val got = rs.table("rdb_sess_out").as[SessionOut].collect()
        .map(s => (s.user_id, s.session_start.getTime, s.session_end.getTime, s.n_events)).toSet
      val batch = operators.Relational.qSessionize(rs, sf).collect()
        .map(r => (r.getAs[Long]("user_id"),
          r.getAs[Timestamp]("session_start").getTime,
          r.getAs[Timestamp]("session_end").getTime,
          r.getAs[Long]("n_events")))
      val lastPerUser = batch.groupBy(_._1).map { case (_, ss) => ss.maxBy(_._2) }.toSet
      assert(got == batch.toSet -- lastPerUser)
    } finally q.stop()
  }

  test("rocksdb: streaming dedup state drops duplicates exactly") {
    implicit val sc = rs.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Long)]
    val input = stream.toDF().toDF("user_id", "ts", "event_id")
    val q = EventsStream.dedupEvents(input)
      .writeStream.format("memory").queryName("rdb_dedup_out").outputMode("append").start()
    try {
      val base = events.select("user_id", "ts", "event_id")
        .as[(Long, Timestamp, Long)].collect().toSeq.take(2000)
      stream.addData(base ++ base); q.processAllAvailable()
      stream.addData(base.take(500)); q.processAllAvailable()
      assert(rs.table("rdb_dedup_out").count() == base.distinct.size.toLong)
    } finally q.stop()
  }

  test("rocksdb: CDC apply converges to the batch latest-wins snapshot") {
    implicit val sc = rs.sqlContext
    val stream = MemoryStream[Change]
    val q = EventsStream.cdcApply(stream.toDS())
      .writeStream.format("memory").queryName("rdb_cdc_out").outputMode("update").start()
    try {
      val changes = events
        .select((col("user_id") % 50).as("key"), col("event_id").as("seq"),
          when(col("event_id") % 11 === 0, "delete").otherwise("upsert").as("op"), col("value"))
        .as[Change].collect().toSeq
      val b = changes.groupBy(c => (c.seq * 2654435761L % 3 + 3) % 3)
      stream.addData(b(0L)); q.processAllAvailable()
      stream.addData(b(1L)); q.processAllAvailable()
      stream.addData(b(1L)); q.processAllAvailable() // replay
      stream.addData(b(2L)); q.processAllAvailable()
      val w = Window.partitionBy(col("key")).orderBy(col("seq").desc)
      val got = rs.table("rdb_cdc_out")
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
        .as[CdcOut].collect().toSeq.sortBy(_.key)
      val want = changes.groupBy(_.key).map { case (k, cs) =>
        val top = cs.maxBy(c => (c.seq, c.op, c.value))
        CdcOut(k, top.seq, top.value, top.op == "delete")
      }.toSeq.sortBy(_.key)
      assert(got == want)
    } finally q.stop()
  }

  test("rocksdb: CMS cells converge to the batch sketch with bounded state") {
    implicit val sc = rs.sqlContext
    val stream = MemoryStream[Long]
    val input = stream.toDF().toDF("user_id")
    val (depth, width) = (operators.TableFormat.CmsDepth, operators.TableFormat.CmsWidth)
    val q = EventsStream.cmsSketch(input, depth, width)
      .writeStream.format("memory").queryName("rdb_cms_out").outputMode("update").start()
    try {
      val users = GraftSession.table(rs, sf, "events")
        .select(col("user_id")).as[Long].collect().toSeq
      val b = users.groupBy(u => (u * 2654435761L % 3 + 3) % 3)
      stream.addData(b(0L)); q.processAllAvailable()
      stream.addData(b(1L)); q.processAllAvailable()
      stream.addData(b(2L)); q.processAllAvailable()
      val w = Window.partitionBy(col("r"), col("b")).orderBy(col("cell").desc)
      val got = rs.table("rdb_cms_out")
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
      assert(got == want.toMap)
      assert(got.size <= depth * width)
    } finally q.stop()
  }

  test("rocksdb: growth trailing-edge churn fires on watermark close identically") {
    implicit val sc = rs.sqlContext
    import EventsStream.{GrowthOut, UserDay}
    val MsPerDay = 86400000L
    def dayTs(day: Long, offsetMs: Long = 0L) = new Timestamp(day * MsPerDay + offsetMs)
    val userDays = events
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct().as[(Long, Long)].collect().map(t => UserDay(t._1, t._2, dayTs(t._2))).toSeq
    val dMax = userDays.map(_.day).max
    val stream = MemoryStream[UserDay]
    val q = EventsStream.growthClasses(stream.toDS())
      .writeStream.format("memory").queryName("rdb_growth_out").outputMode("append").start()
    try {
      stream.addData(userDays); q.processAllAvailable()
      // watermark past the close of the final real day, then one more
      // batch to process the expired timeouts (the StreamingSpec shape)
      stream.addData(Seq(UserDay(-1L, dMax + 1, dayTs(dMax + 1, 1000)))); q.processAllAvailable()
      stream.addData(Seq(UserDay(-2L, dMax + 1, dayTs(dMax + 1, 1000)))); q.processAllAvailable()
      val got = rs.table("rdb_growth_out").as[GrowthOut].collect()
        .filter(_.user_id >= 0).map(o => (o.user_id, o.day, o.status)).toSet
      val want = userDays.groupBy(_.user_id).toSeq.flatMap { case (u, xs) =>
        val ds = xs.map(_.day).distinct.sorted
        val classes = ds.zipWithIndex.flatMap { case (d, i) =>
          if (i == 0) Seq((u, d, "new"))
          else if (ds(i - 1) == d - 1) Seq((u, d, "retained"))
          else Seq((u, ds(i - 1) + 1, "churned"), (u, d, "resurrected"))
        }
        (if (ds.last < dMax) Seq((u, ds.last + 1, "churned")) else Nil) ++ classes
      }.toSet
      assert(got == want, "rocksdb growth classes diverge from the batch classification")
    } finally q.stop()
  }

  test("rocksdb: mixture monitor shares emit on watermark close identically") {
    implicit val sc = rs.sqlContext
    val stream = MemoryStream[(Timestamp, String, Long)]
    val input = stream.toDF().toDF("ts", "source", "toks")
    val docs = for {
      d <- 1 to 2; s <- Seq("web", "code"); i <- 1 to (d * 5 + s.length)
    } yield (Timestamp.valueOf(f"2024-03-0$d ${9 + i % 10}%02d:00:00"), s, (i * 13 + s.length).toLong)
    val q = EventsStream.mixtureMonitor(input)
      .writeStream.format("memory").queryName("rdb_mix_out").outputMode("append").start()
    try {
      stream.addData(docs); q.processAllAvailable()
      stream.addData(Seq((Timestamp.valueOf("2030-01-01 00:00:00"), "sentinel", 0L)))
      q.processAllAvailable()
      val got = rs.table("rdb_mix_out").filter(col("source") =!= "sentinel").collect()
        .map(r => (r.getAs[Timestamp]("day"), r.getAs[String]("source")) ->
          ((r.getAs[Long]("toks"), r.getAs[Long]("share_ppm")))).toMap
      val want = docs.groupBy { case (ts, _, _) =>
        Timestamp.valueOf(ts.toLocalDateTime.toLocalDate.atStartOfDay)
      }.flatMap { case (day, ds) =>
        val bySrc = ds.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
        val total = bySrc.values.sum
        bySrc.map { case (src, t) =>
          (day, src) -> ((t, (t * 1000 / total) * 1000 + (t * 1000 % total) * 1000 / total))
        }
      }
      assert(got == want, "rocksdb mixture shares diverge from the batch replay")
    } finally q.stop()
  }

  test("rocksdb: IVF ingest monitor converges to the batch ann_incremental report") {
    implicit val sc = rs.sqlContext
    val stream = MemoryStream[(Long, Seq[Float])]
    val input = stream.toDF().toDF("id", "embedding")
    val e = GraftSession.table(rs, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val snap = operators.VectorOps.ivfSnapshot(e.filter(col("id") % 10 =!= 0), 16)
    @volatile var latest: Seq[(Int, Long, Long, Long, Long, Long, Long)] = Seq.empty
    val q = streaming.EventsStream.ivfIngestMonitor(input, snap) { (_, rep) =>
      latest = rep.collect().toSeq.map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    }.start()
    try {
      val fresh = e.filter(col("id") % 10 === 0).as[(Long, Seq[Float])].collect().toSeq
      val (b1, b2) = fresh.splitAt(fresh.length / 2)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      val want = operators.VectorOps.queries("ann_incremental")(rs, sf)
        .collect().toSeq.map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      assert(latest.sortBy(_._1) == want.sortBy(_._1),
        "rocksdb ivf ingest report diverges from the batch report")
    } finally q.stop()
  }

  test("rocksdb: the provider actually in use is RocksDB, not the default") {
    // guard against a silently-ignored conf: the session must report
    // the provider these tests claim to exercise
    assert(rs.conf.get("spark.sql.streaming.stateStore.providerClass")
      .contains("RocksDBStateStoreProvider"))
    // and the default-provider session must NOT have been switched
    assert(!spark.conf
      .get("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider")
      .contains("RocksDB"))
  }
}
