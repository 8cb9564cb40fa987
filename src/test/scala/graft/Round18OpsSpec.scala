package graft

import graft.operators.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-18 pins: the composed IVF-PQ index (`ann_ivfpq`) — PQ codes
  * stored inside the centroid-partitioned inverted lists, ADC scan of
  * the probed lists only, exact re-rank from the raw table.
  */
class Round18OpsSpec extends AnyFunSuite {
  import TestSpark._

  private val sf = "/root/testdata/sf0.001"
  private def corpus = GraftSession.table(spark, sf, "embeddings")
    .select(col("vec_id").as("id"), col("embedding"))

  test("ivfpq artifact: lists hold codes not vectors; codes replay the shared PQ encode; one list per vector") {
    val (lists, cents, cb) = VectorOps.ivfPqIndexTable(spark, sf)
    assert(lists.columns.sorted.toSeq == Seq("centroid_id", "codes", "id", "norm"),
      s"a list row is (id, codes, norm) — raw vectors must NOT be in the lists: ${lists.columns.toSeq}")
    assert(lists.count() == corpus.count(), "every vector in exactly one list")
    assert(cb.length == 16 * 16 && cb.forall(_.length == 4), "16 subspaces x 16 codes over 64 dims")
    assert(cents.count() == 16)

    // codes in the artifact == plain-Scala nearest-codebook encode of
    // the quantized raw vector (the annPq arithmetic, replayed)
    val qv = corpus.select(col("id"),
      transform(col("embedding"), x => floor(x.cast("double") * 10000 + 0.5).cast("long")).as("qv"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Seq[Long]]("qv").toArray).toMap
    def encode(v: Array[Long]): Seq[Int] = (0 until 16).map { j =>
      val sub = java.util.Arrays.copyOfRange(v, j * 4, (j + 1) * 4)
      (0 until 16).minBy { c =>
        val ctr = cb(j * 16 + c)
        var s = 0.0; var i = 0
        while (i < 4) { val d = (sub(i) - ctr(i)).toDouble; s += d * d; i += 1 }
        (s, c)
      }
    }
    lists.collect().foreach { r =>
      val id = r.getAs[Long]("id")
      val got = r.getSeq[Int](r.fieldIndex("codes")).toList
      assert(got == encode(qv(id)).toList, s"stored codes diverge from the PQ encode for vec $id")
    }

    // the scale claim, measured: the compressed lists are a fraction
    // of the raw-vector lists ON DISK (same corpus, same partitioning,
    // both parquet-encoded) — the probed read shrinks by this factor
    VectorOps.ivfIndexTable(spark, sf)
    val scratch = graft.sources.Ingest.scratchDir(spark)
    val dirKey = java.security.MessageDigest.getInstance("SHA-256")
      .digest(sf.getBytes("UTF-8")).take(12).map("%02x".format(_)).mkString
    def duBytes(p: String): Long = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
        else f.length()
      walk(new java.io.File(p))
    }
    val rawBytes = duBytes(s"$scratch/ivf_index_16_$dirKey/lists")
    val pqBytes = duBytes(s"$scratch/ivfpq_index_16_16_16_$dirKey/lists")
    info(s"probed-list bytes: raw IVF $rawBytes, IVF-PQ $pqBytes (${rawBytes.toDouble / pqBytes}x smaller)")
    assert(pqBytes * 3 < rawBytes, s"compressed lists must be well under a third of the raw lists: $pqBytes vs $rawBytes")
  }

  test("ann_ivfpq: probed-list partition pruning — the compressed scan reads only the probed directories") {
    val (_, _, _) = VectorOps.ivfPqIndexTable(spark, sf)
    val scratch = graft.sources.Ingest.scratchDir(spark)
    val dirKey = java.security.MessageDigest.getInstance("SHA-256")
      .digest(sf.getBytes("UTF-8")).take(12).map("%02x".format(_)).mkString
    val listDirs = new java.io.File(s"$scratch/ivfpq_index_16_16_16_$dirKey/lists")
      .listFiles().map(_.getName).filter(_.startsWith("centroid_id="))
    assert(listDirs.length == 16, "one directory per inverted list")

    def listScanFilters(df: org.apache.spark.sql.DataFrame): String = {
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val ls = s.linesIterator.toVector
      ls.zipWithIndex.collect {
        case (l, i) if l.contains("PartitionFilters") &&
          ls.take(i).reverse.find(_.contains("Location")).exists(_.contains("ivfpq_index")) => l
      }.mkString("\n")
    }
    val narrow = VectorOps.annIvfPq(spark, sf, corpus.filter(col("id") === 0), 5, 4)
    val nf = listScanFilters(narrow)
    val inset =
      "\\bIN \\(([^)]*)\\)".r.findFirstMatchIn(nf)
        .map(_.group(1).split(",").count(t => t.trim.nonEmpty && t.trim.forall(_.isDigit)))
        .orElse("INSET ([^\\]]*)".r.findFirstMatchIn(nf)
          .map(_.group(1).split(", ").count(t => t.nonEmpty && t.forall(_.isDigit))))
        .getOrElse(-1)
    assert(inset >= 1 && inset <= 4, s"1-query 4-probe batch must read <= 4 lists, got $inset:\n$nf")
  }

  test("lake_rebalance_exec: conservation, the exact bit-6 moved set, plan agreement, one file per bucket") {
    import graft.operators.LakeOps
    val rep = LakeOps.lakeRebalanceExec(spark, sf).collect()

    // independent ground truth from the corpus: unique chunk hashes,
    // their h, refs, and the bit-6 property that decides movement
    val docs = GraftSession.table(spark, sf, "documents")
      .select(col("text")).collect().map(_.getString(0)).filter(_.getBytes("UTF-8").length > 64)
    def sha(s: String): String = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // mirror chunkSplit exactly: byte-length part count, CHARACTER
    // substring windows (identical on this ASCII corpus, and the
    // sf-level oracle hash-match covers the general agreement)
    val refs = docs.flatMap { t =>
      val n = (t.getBytes("UTF-8").length + 255) / 256
      (0 until n).map { i =>
        sha(t.substring(math.min(i * 256, t.length), math.min((i + 1) * 256, t.length)))
      }
    }
    val uniq = refs.distinct
    def hOf(hash: String): Long =
      ("0123456789abcdef".indexOf(hash(0)) * 16 + "0123456789abcdef".indexOf(hash(1))).toLong

    assert(rep.map(_.getAs[Long]("n_chunks")).sum == uniq.length, "every unique chunk in exactly one bucket")
    assert(rep.map(_.getAs[Long]("n_refs")).sum == refs.length, "reference counts conserved")
    // h mod 128 != h mod 64 exactly when bit 6 of h is set — the
    // doubling migration moves exactly that set, nothing else
    val wantMoved = uniq.count(h => (hOf(h) & 64L) != 0L)
    assert(rep.map(_.getAs[Long]("n_moved")).sum == wantMoved, "moved set must be exactly the bit-6-set chunks")
    // the execution agrees with the lake_rebalance PLAN's B'=128 row
    // (plan counts references, exec counts unique physical chunks —
    // compare on the shared invariant: which h values move)
    val planRow = LakeOps.lakeRebalance(spark, sf).collect()
      .find(_.getAs[Long]("new_buckets") == 128L).get
    assert(planRow.getAs[Long]("n_moved") == refs.count(h => (hOf(h) & 64L) != 0L),
      "plan's moved refs must be the bit-6 set over references")
    // physical layout: the migration consolidated each bucket into ONE file
    rep.foreach { r =>
      assert(r.getAs[Long]("n_phys_files") == 1L, s"bucket ${r.getAs[Long]("bucket")} spans multiple files")
      assert(r.getAs[Long]("bucket") >= 0L && r.getAs[Long]("bucket") < 128L)
    }
  }

  test("ann_ivfpq_live: no corpse surfaces, undeleted queries only, empty tombstones equals the plain composed read") {
    import spark.implicits._
    val live = VectorOps.annIvfPqLive(spark, sf).collect()
    assert(live.nonEmpty)
    live.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") % 7 != 3, "a tombstoned vector surfaced as a neighbor")
      assert(r.getAs[Long]("query_id") % 7 != 3, "a tombstoned vector was used as a query")
    }
    // empty tombstone set reproduces the plain composed read exactly
    val e = corpus
    val q = e.filter(col("id") < 20)
    val none = e.select(col("id")).filter(org.apache.spark.sql.functions.lit(false))
    val a = VectorOps.annIvfPq(spark, sf, q, 5, 8, shortlistFactor = 16, tombstones = Some(none))
      .collect().map(_.toSeq.toVector).toVector
    val b = VectorOps.annIvfPq(spark, sf).collect().map(_.toSeq.toVector).toVector
    assert(a == b, "empty tombstones must reproduce the plain composed index read")
  }

  test("pipeline_incremental: reuse is safe (incremental total == full recompute) and the delta classification is exact") {
    import graft.operators.Pipeline
    val rep = Pipeline.pipelineIncremental(spark, sf).collect()
    val d = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[String]("text")))

    // the invariant that makes hash-keyed reuse SAFE: summing cached
    // stats for unchanged docs + recomputed stats for the delta must
    // equal the full recompute, exactly
    val fullBySrc = d.groupBy(_._2).view.mapValues(_.map(_._3.split(" ", -1).length.toLong).sum).toMap
    rep.foreach { r =>
      assert(r.getAs[Long]("tokens_total") == fullBySrc(r.getAs[String]("source")),
        s"incremental total diverges from full recompute for ${r.getAs[String]("source")}")
    }
    // exact delta classification: new = absent from v1 (id % 10 == 0),
    // changed = present with an edited v1 text (id % 7 == 0), else
    // unchanged — replayed per source
    val bySrc = d.groupBy(_._2)
    rep.foreach { r =>
      val ds = bySrc(r.getAs[String]("source"))
      val nNew = ds.count(_._1 % 10 == 0).toLong
      val nChanged = ds.count(t => t._1 % 10 != 0 && t._1 % 7 == 0).toLong
      assert(r.getAs[Long]("n_new") == nNew)
      assert(r.getAs[Long]("n_changed") == nChanged)
      assert(r.getAs[Long]("n_unchanged") == ds.length - nNew - nChanged)
      assert(r.getAs[Long]("recompute_ppm") == (nNew + nChanged) * 1000000L / ds.length)
      // the recomputed-token count covers exactly the delta set
      val wantRecomp = ds.filter(t => t._1 % 10 == 0 || t._1 % 7 == 0)
        .map(_._3.split(" ", -1).length.toLong).sum
      assert(r.getAs[Long]("tokens_recomputed") == wantRecomp)
    }
  }

  test("ann_ivfpq: recall@5 vs brute force, determinism, and containment in the probed candidate space") {
    import spark.implicits._
    val bf = VectorOps.annBruteforce(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got1 = VectorOps.annIvfPq(spark, sf)
    val got = got1.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = bf.count(got.contains).toDouble / bf.size
    info(s"ann_ivfpq recall@5 = $recall")
    // deterministic (frozen coarse + product quantizers); 8/16 probes
    // with an 80-deep exact re-rank measures 0.76 here — exactly
    // ann_ivf's probe ceiling: the ADC+re-rank stage loses nothing
    assert(recall >= 0.7, s"IVF-PQ recall under the pinned floor: $recall")
    val again = VectorOps.annIvfPq(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(got == again, "composed index read must be deterministic")

    // containment: the composed index can only surface candidates the
    // probed lists admitted — every result id must be in the lists,
    // and no query may return itself
    val (lists, _, _) = VectorOps.ivfPqIndexTable(spark, sf)
    val inLists = lists.select(col("id")).collect().map(_.getLong(0)).toSet
    got.foreach { case (q, n) =>
      assert(inLists.contains(n), s"neighbor $n missing from the lists")
      assert(q != n, "a query must not return itself")
    }
  }
}
