package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BpeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** plain-Scala reference: the same greedy BPE recurrence. */
  private def replay(wf: Map[String, Long], numMerges: Int): Seq[(Long, String, String, String, Long)] = {
    var syms: Seq[(Vector[String], Long)] = wf.toSeq.map { case (w, f) => (w.split("").toVector, f) }
    val out = scala.collection.mutable.ArrayBuffer[(Long, String, String, String, Long)]()
    for (i <- 0 until numMerges if syms.exists(_._1.length >= 2)) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      syms.foreach { case (s, f) =>
        s.sliding(2).filter(_.length == 2).foreach(p => counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f)
      }
      if (counts.nonEmpty) {
        val ((l, r), cnt) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((i.toLong, l, r, l + r, cnt))
        syms = syms.map { case (s, f) =>
          val acc = scala.collection.mutable.ArrayBuffer[String]()
          s.foreach { c =>
            if (acc.nonEmpty && acc.last == l && c == r) acc(acc.length - 1) = l + r
            else acc += c
          }
          (acc.toVector, f)
        }
      }
    }
    out.toSeq
  }

  test("bpeTrain equals the exact replay on a hand-checkable vocab") {
    // aaab×3, ab×2: (a,a) appears twice per aaab → count 6 beats (a,b)=5
    val wf = Seq(("aaab", 3L), ("ab", 2L)).toDF("word", "freq")
    val got = Bpe.bpeTrain(wf, 4)
      .as[(Long, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got.head == ((0L, "a", "a", "aa", 6L)))
    assert(got(1) == ((1L, "a", "b", "ab", 5L)))
    assert(got == replay(Map("aaab" -> 3L, "ab" -> 2L), 4))
  }

  test("bpeTrain on the corpus equals the exact replay and is deterministic") {
    val wf = GraftSession.table(spark, sf, "documents")
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .as[(String, Long)].collect().toMap
    val expected = replay(wf, 16)
    val got = Bpe.textBpe(spark, sf)
      .as[(Long, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == expected, s"got=${got.take(4)} expected=${expected.take(4)}")
    val again = Bpe.textBpe(spark, sf)
      .as[(Long, String, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == again)
    assert(got.nonEmpty && got.forall(_._5 > 0))
    // merged tokens grow monotonically useful: each merge's count can't
    // exceed the previous round's winning count
    got.sliding(2).foreach { case Seq(a, b) => assert(b._5 <= a._5); case _ => }
  }

  test("text_fertility equals the plain-Scala per-source replay with the shared encodeWord") {
    val sf = "/root/testdata/sf0.001"
    val got = Bpe.textFertility(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r).toMap

    // replay: same trained merges (via the Spark trainer — the
    // trainer itself is pinned by the suites above), same encodeWord
    val wf = GraftSession.table(spark, sf, "documents")
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val merges = Bpe.bpeTrain(wf, 16).orderBy("merge_idx")
      .select("left", "right").as[(String, String)].collect()
    val (ls, rs) = (merges.map(_._1), merges.map(_._2))
    val docs = GraftSession.table(spark, sf, "documents")
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val tokCache = scala.collection.mutable.Map[String, Long]()
    def nTok(w: String): Long =
      tokCache.getOrElseUpdate(w, Bpe.encodeWord(w, ls, rs).length.toLong)
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val wordsAll = ds.flatMap(_._3.toLowerCase.split(" ").filter(_.nonEmpty))
      val nWords = wordsAll.length.toLong
      val nBpe = wordsAll.map(nTok).sum
      val nBytes = ds.map(_._3.getBytes("UTF-8").length.toLong).sum
      val r = got(src)
      assert(r.getAs[Long]("n_docs") == ds.length.toLong)
      assert(r.getAs[Long]("n_words") == nWords, s"$src words")
      assert(r.getAs[Long]("n_bpe_tokens") == nBpe, s"$src bpe tokens")
      assert(r.getAs[Long]("n_bytes") == nBytes, s"$src bytes")
      assert(r.getAs[Long]("fertility_ppm") == nBpe * 1000000L / nWords)
      assert(r.getAs[Long]("bytes_per_token_ppm") == nBytes * 1000000L / nBpe)
    }
  }

  test("overlapping merges collapse left-to-right: aaaa + (a,a) -> [aa, aa]") {
    val wf = Seq(("aaaa", 1L)).toDF("word", "freq")
    val got = Bpe.bpeTrain(wf, 2).as[(Long, String, String, String, Long)].collect().toSeq
    // round 0: (a,a) count 3 (overlapping adjacency); round 1 merges (aa,aa)
    assert(got.head == ((0L, "a", "a", "aa", 3L)))
    assert(got(1) == ((1L, "aa", "aa", "aaaa", 1L)))
  }
}
