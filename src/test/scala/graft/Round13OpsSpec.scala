package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 additions: plain-Scala replays for the session's new
  * operators (SURVEY §2 rows reference these tests as their
  * engine-independent oracle companions).
  */
class Round13OpsSpec extends AnyFunSuite {
  import TestSpark._

  private def asL(r: org.apache.spark.sql.Row, c: String): Long =
    r.get(r.fieldIndex(c)) match {
      case l: Long => l
      case i: Int  => i.toLong
      case x       => throw new IllegalArgumentException(s"$c: $x")
    }

  test("text_zipf: slope and top-1 share replay the plain-Scala OLS exactly") {
    val corpus = GraftSession.table(spark, sf, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("text")))
    val bySource = corpus.groupBy(_._1)
    val want = bySource.map { case (src, ds) =>
      val tf = scala.collection.mutable.Map.empty[String, Long]
      ds.foreach(_._2.split(' ').foreach(w => tf(w) = tf.getOrElse(w, 0L) + 1L))
      val totalTf = tf.valuesIterator.sum
      val top = tf.toSeq.sortBy { case (t, n) => (-n, t) }.take(TextAnalysis.ZipfTopK)
      val pts = top.zipWithIndex.map { case ((_, n), i) =>
        val x = math.floor(math.log((i + 1).toDouble) * 1000).toLong
        val y = math.floor(math.log(n.toDouble) * 1000).toLong
        (x, y)
      }
      val n = pts.length.toLong
      val sx = pts.map(_._1).sum
      val sy = pts.map(_._2).sum
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val slope = (sx * sy - n * sxy) * 1000000L / (n * sxx - sx * sx)
      val top1 = top.head._2
      src -> ((n, totalTf, top1 * 1000000L / totalTf, slope))
    }
    val rows = TextAnalysis.textZipf(spark, sf).collect()
    assert(rows.length == bySource.size)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val (n, tot, top1Share, slope) = want(src)
      assert(asL(r, "n_terms") == n, s"$src n_terms")
      assert(asL(r, "total_tf") == tot, s"$src total_tf")
      assert(asL(r, "top1_share_ppm") == top1Share, s"$src top1_share")
      assert(asL(r, "zipf_slope_ppm") == slope, s"$src slope")
      // Zipf-ish synthetic text: the fitted exponent must be positive
      // (covariance of a non-increasing head is provably ≤ 0).
      assert(slope >= 0L, s"$src negative-magnitude slope")
    }
  }

  test("q_theilsen: lower-median pairwise slope replays the plain-Scala estimator") {
    val events = GraftSession.table(spark, sf, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), asL(r, "day")))
    val daily = events.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case ((t, d), n) => (t, d, n) }
    val byType = daily.groupBy(_._1)
    def slopePpm(c1: Long, c2: Long, dx: Long): Long =
      if (c2 >= c1) (c2 - c1) * 1000000L / dx else -((c1 - c2) * 1000000L / dx)
    val want = byType.collect {
      case (t, ds) if ds.length >= 2 =>
        val pairs = for {
          (_, d1, c1) <- ds; (_, d2, c2) <- ds if d1 < d2
        } yield (slopePpm(c1, c2, d2 - d1), d1, d2)
        val sorted = pairs.sortBy(p => (p._1, p._2, p._3))
        val med = sorted((sorted.length + 1) / 2 - 1)._1
        t -> ((ds.length.toLong, pairs.length.toLong, med))
    }
    val rows = operators.Relational.qTheilSen(spark, sf).collect()
    assert(rows.length == want.size)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val (nDays, nPairs, med) = want(t)
      assert(asL(r, "n_days") == nDays, s"$t n_days")
      assert(asL(r, "n_pairs") == nPairs, s"$t n_pairs")
      assert(asL(r, "ts_slope_ppm") == med, s"$t median slope")
    }
  }

  test("multimodal_scenes: storyboard replay from the raw payload bytes") {
    val vids = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .filter(_._1 % 3 == 2)
    val want = vids.map { case (id, text) =>
      val b = text.getBytes("UTF-8")
      val frames = 1L + b.length / 64
      val stride = math.max(1L, math.ceil(frames.toDouble / 8).toLong)
      val lumas = (0L until frames by stride).map { f =>
        val from = (f * 64).toInt
        val slice = b.slice(from, math.min(from + 64, b.length))
        val luma =
          if (slice.isEmpty) 0.0
          else slice.foldLeft(0L)((acc, x) => acc + (x & 0xff)).toDouble / slice.length
        (f, luma)
      }
      val deltas = lumas.zip(lumas.drop(1)).map { case ((_, l1), (f2, l2)) => (f2, math.abs(l2 - l1)) }
      val nScenes = 1L + deltas.count(_._2 > 16.0)
      val (kfIdx, kfDelta) =
        if (deltas.isEmpty) (0L, 0.0)
        else {
          val m = deltas.map(_._2).max
          (deltas.filter(_._2 == m).map(_._1).min, m)
        }
      id -> ((frames, lumas.length.toLong, nScenes, kfIdx, kfDelta))
    }.toMap
    val rows = multimodal.Multimodal.multimodalScenes(spark, sf).collect()
    assert(rows.length == want.size)
    rows.foreach { r =>
      val id = asL(r, "doc_id")
      val (nf, ns, nsc, kf, kd) = want(id)
      assert(asL(r, "n_frames") == nf, s"vid $id n_frames")
      assert(asL(r, "n_sampled") == ns, s"vid $id n_sampled")
      assert(asL(r, "n_scenes") == nsc, s"vid $id n_scenes")
      assert(asL(r, "keyframe_idx") == kf, s"vid $id keyframe")
      assert(r.getAs[Double]("keyframe_delta") == kd, s"vid $id delta")
      assert(nsc >= 1 && nsc <= ns, s"vid $id scene bounds")
    }
  }

  test("lake_delta_sync: dual gear chunking replays exact per-doc reuse accounting") {
    import graft.functions.GearCdcChunks
    def gearChunks(b: Array[Byte]): Seq[Int] = {
      val gear = GearCdcChunks.gearTable
      val out = scala.collection.mutable.ArrayBuffer.empty[Int]
      var h = 0L; var len = 0
      b.foreach { byte =>
        h = (h << 1) + gear(byte & 0xff); len += 1
        if ((len >= 32 && (h & 63L) == 0L) || len >= 256) { out += len; h = 0L; len = 0 }
      }
      if (len > 0) out += len
      out.toSeq
    }
    def hashes(b: Array[Byte]): Seq[(String, Int)] = {
      val lens = gearChunks(b)
      val md = java.security.MessageDigest.getInstance("SHA-256")
      lens.scanLeft(0)(_ + _).zip(lens).map { case (off, l) =>
        (md.digest(b.slice(off, off + l)).map("%02x".format(_)).mkString, l)
      }
    }
    val texts = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
      .filter(_._2.nonEmpty)
    val off = operators.LakeOps.DeltaEditOffset
    val want = texts.map { case (id, t) =>
      val v1 = t.getBytes("UTF-8")
      val v2 = (t.take(off) + " patched-at-v2 " + t.drop(off)).getBytes("UTF-8")
      val have = hashes(v1).map(_._1).toSet
      val c2 = hashes(v2)
      val reused = c2.filter(c => have(c._1))
      val bytesTotal = c2.map(_._2.toLong).sum
      val bytesNew = c2.filterNot(c => have(c._1)).map(_._2.toLong).sum
      id -> ((c2.length.toLong, reused.length.toLong, bytesTotal, bytesNew,
        (bytesTotal - bytesNew) * 1000000L / bytesTotal))
    }.toMap
    val rows = operators.LakeOps.lakeDeltaSync(spark, sf).collect()
    assert(rows.length == want.size)
    var anyReuse = false
    rows.foreach { r =>
      val id = asL(r, "doc_id")
      val (nc, nr, bt, bn, ppm) = want(id)
      assert(asL(r, "n_chunks_v2") == nc, s"doc $id n_chunks")
      assert(asL(r, "n_reused") == nr, s"doc $id n_reused")
      assert(asL(r, "bytes_total") == bt, s"doc $id bytes_total")
      assert(asL(r, "bytes_new") == bn, s"doc $id bytes_new")
      assert(asL(r, "reuse_ppm") == ppm, s"doc $id reuse_ppm")
      if (nr > 0) anyReuse = true
    }
    // the CDC resync property in aggregate: offset-based chunking can
    // only ever reuse bytes BEFORE the edit point (≤ 64/doc — every
    // downstream boundary shifts); content-defined boundaries re-sync,
    // so reused bytes must strictly exceed that prefix-only ceiling
    val longTexts = texts.filter(_._2.length > 400)
    assert(longTexts.nonEmpty)
    val (totL, newL) = longTexts.foldLeft((0L, 0L)) { case ((t, n), (id, _)) =>
      val (_, _, bt, bn, _) = want(id)
      (t + bt, n + bn)
    }
    val prefixCeiling = longTexts.map(t => math.min(operators.LakeOps.DeltaEditOffset, t._2.length).toLong).sum
    assert(totL - newL > prefixCeiling,
      s"CDC reused only ${totL - newL} bytes — no better than the $prefixCeiling-byte prefix ceiling")
    assert(anyReuse)
  }
}
