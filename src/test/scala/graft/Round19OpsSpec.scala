package graft

import graft.operators.Pipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-19 pins: the parameterized incremental-curation API
  * (`Pipeline.incrementalClassify` / `incrementalManifest` /
  * `pipelineIncremental(prev, next)`) driven with an arbitrary
  * two-version corpus — including the deleted-doc case the named
  * demo query never exercises — and manifest CHAINING (run N's
  * manifest is run N+1's `prev`).
  */
class Round19OpsSpec extends AnyFunSuite {
  import TestSpark._

  private def sha256hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def tok(s: String): Long = s.split(" ", -1).length.toLong

  // an arbitrary hand-built two-version corpus: adds, edits, holds,
  // AND deletes — none of the demo scenario's mod-10/mod-7 structure
  private val v1 = Seq(
    (1L, "web", "alpha beta gamma"),
    (2L, "web", "delta epsilon"),
    (3L, "book", "zeta eta theta iota"),
    (4L, "book", "kappa"),
    (5L, "code", "lambda mu nu"),
  )
  private val v2 = Seq(
    (1L, "web", "alpha beta gamma"),        // unchanged
    (2L, "web", "delta epsilon REVISED"),   // changed
    // 3L deleted
    (4L, "book", "kappa"),                  // unchanged
    // 5L deleted
    (6L, "web", "xi omicron pi rho"),       // new
    (7L, "code", "sigma tau"),              // new
  )

  private def snapshot(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
  }
  private def manifestOf(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.map { case (id, src, t) => (id, src, sha256hex(t), tok(t)) }
      .toDF("doc_id", "source", "content_hash", "n_tokens")
  }

  test("incrementalClassify on an arbitrary two-version corpus: new/changed/unchanged/deleted all exact") {
    val got = Pipeline.incrementalClassify(manifestOf(v1), snapshot(v2))
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("status"), r.getAs[String]("content_hash"), r.getAs[Long]("n_tokens"))))
      .toMap
    val v1m = v1.map(d => d._1 -> d).toMap
    val v2m = v2.map(d => d._1 -> d).toMap
    val want = (v1m.keySet ++ v2m.keySet).map { id =>
      (v1m.get(id), v2m.get(id)) match {
        case (None, Some(n)) => id -> (("new", sha256hex(n._3), tok(n._3)))
        case (Some(p), None) => id -> (("deleted", sha256hex(p._3), tok(p._3)))
        case (Some(p), Some(n)) if p._3 != n._3 => id -> (("changed", sha256hex(n._3), tok(n._3)))
        case (Some(p), Some(_)) => id -> (("unchanged", sha256hex(p._3), tok(p._3)))
        case _ => fail("unreachable")
      }
    }.toMap
    assert(got == want, s"classification diverges:\n$got\nvs\n$want")
  }

  test("pipelineIncremental(prev, next) rollup: per-source counts, deleted docs excluded from live totals") {
    val rep = Pipeline.pipelineIncremental(manifestOf(v1), snapshot(v2))
      .collect()
      .map(r => r.getAs[String]("source") -> r)
      .toMap
    // web: 1 unchanged, 1 changed, 1 new -> 3 live docs
    val web = rep("web")
    assert(web.getAs[Long]("n_docs") == 3 && web.getAs[Long]("n_new") == 1 &&
      web.getAs[Long]("n_changed") == 1 && web.getAs[Long]("n_unchanged") == 1 &&
      web.getAs[Long]("n_deleted") == 0)
    assert(web.getAs[Long]("tokens_total") ==
      tok("alpha beta gamma") + tok("delta epsilon REVISED") + tok("xi omicron pi rho"))
    assert(web.getAs[Long]("tokens_recomputed") ==
      tok("delta epsilon REVISED") + tok("xi omicron pi rho"))
    assert(web.getAs[Long]("recompute_ppm") == 2 * 1000000L / 3)
    // book: 1 unchanged, 1 deleted -> 1 live doc, deleted tokens excluded
    val book = rep("book")
    assert(book.getAs[Long]("n_docs") == 1 && book.getAs[Long]("n_deleted") == 1 &&
      book.getAs[Long]("n_unchanged") == 1)
    assert(book.getAs[Long]("tokens_total") == tok("kappa"))
    assert(book.getAs[Long]("tokens_recomputed") == 0)
    assert(book.getAs[Long]("recompute_ppm") == 0)
    // code: 1 deleted, 1 new -> 1 live doc, 100% recompute
    val code = rep("code")
    assert(code.getAs[Long]("n_docs") == 1 && code.getAs[Long]("n_deleted") == 1 &&
      code.getAs[Long]("n_new") == 1)
    assert(code.getAs[Long]("tokens_total") == tok("sigma tau"))
    assert(code.getAs[Long]("recompute_ppm") == 1000000L)
  }

  test("incrementalManifest chains: run N's manifest as run N+1's prev reproduces a from-scratch manifest") {
    // chain v0 (empty) -> v1 -> v2; the chained manifest after v2 must
    // equal the manifest computed directly from the v2 snapshot
    import spark.implicits._
    val empty = Seq.empty[(Long, String, String, Long)]
      .toDF("doc_id", "source", "content_hash", "n_tokens")
    val m1 = Pipeline.incrementalManifest(empty, snapshot(v1))
    // everything classifies new against an empty manifest
    val c0 = Pipeline.incrementalClassify(empty, snapshot(v1)).collect()
    assert(c0.forall(_.getAs[String]("status") == "new"),
      "an empty manifest classifies everything new")
    val m2 = Pipeline.incrementalManifest(m1, snapshot(v2))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("content_hash"), r.getAs[Long]("n_tokens"))).sortBy(_._1)
    val direct = manifestOf(v2)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[String]("content_hash"), r.getAs[Long]("n_tokens"))).sortBy(_._1)
    assert(m2.toSeq == direct.toSeq,
      "chained manifest must equal the from-scratch manifest of the latest snapshot")
  }

  test("named pipeline_incremental demo == the parameterized API on the simulated v1 manifest") {
    val sf = "/root/testdata/sf0.001"
    val d = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val prev = d.filter(col("doc_id") % 10 =!= 0)
      .withColumn("text_v1",
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" legacy-rev")))
          .otherwise(col("text")))
      .select(col("doc_id"), col("source"),
        sha2(col("text_v1"), 256).as("content_hash"),
        size(split(col("text_v1"), " ")).cast("long").as("n_tokens"))
    val viaApi = Pipeline.pipelineIncremental(prev, d)
      .orderBy("source").collect().map(_.toSeq.toVector).toVector
    val named = Pipeline.pipelineIncremental(spark, sf)
      .collect().map(_.toSeq.toVector).toVector
    assert(viaApi == named, "the named query is exactly the API on the simulated manifest")
    // the demo never deletes: v2 covers v1
    assert(named.forall(_(5) == 0L), "demo scenario must have zero deleted docs")
  }
}
