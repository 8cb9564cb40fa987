package graft

import graft.operators.{Dedup, Relational, TextAnalysis, VectorOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the r3 additions beyond their DuckDB oracles:
  * the blocked implementations must equal their brute-force
  * formulations, and derived quantities must satisfy their bounds.
  */
class Round3OpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("fuzzy_pairs length-band blocking equals the brute-force cross join") {
    val names = GraftSession.table(spark, sf, "part").select(col("p_name").as("name"))
    val got = Dedup.fuzzyPairs(names, 2).select("name_a", "name_b").as[(String, String)].collect().toSet
    val d = names.distinct()
    val brute = d.select(col("name").as("a"))
      .crossJoin(d.select(col("name").as("b")))
      .filter(col("a") < col("b") && levenshtein(col("a"), col("b")) <= 2)
      .as[(String, String)].collect().toSet
    assert(got == brute)
    assert(got.nonEmpty, "part names should contain near-matches")
  }

  test("q_rangejoin bucketed interval join equals the brute-force non-equi join") {
    val got = Relational.qRangejoin(spark, sf)
      .select(col("event_id"), col("n_clicks")).as[(Long, Long)].collect().toMap
    val ev = GraftSession.table(spark, sf, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").as("pu"), unix_micros(col("ts")).as("p_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), unix_micros(col("ts")).as("c_us"))
    val brute = p.join(
        c,
        col("pu") === col("cu") && col("c_us") >= col("p_us") - lit(600000000L) && col("c_us") < col("p_us"),
        "left",
      )
      .groupBy(col("event_id")).agg(count(col("c_us")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == brute)
    assert(got.values.exists(_ > 0), "some purchase should have preceding clicks")
  }

  test("emb_quantize: error bounded by half a quantum, max element saturates") {
    val rows = VectorOps.embQuantize(spark, sf)
      .select(col("scale"), col("n_sat"), col("err_max"))
      .as[(Double, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (scale, nSat, errMax) =>
      assert(nSat >= 1, "the max-abs element must quantize to ±127")
      // |x/scale*127 - q| <= 0.5  =>  |q*scale/127 - x| <= scale/254 (+ 1 ulp slack)
      assert(errMax <= scale / 254 * (1 + 1e-9), s"errMax=$errMax scale=$scale")
    }
  }

  test("text_tfidf: ranks are 1..10 per source and score = tf*N/df") {
    val out = TextAnalysis.textTfidf(spark, sf)
    val n = GraftSession.table(spark, sf, "documents").count()
    val rows = out.select("source", "rk", "tf", "df", "score")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq)
      assert(rs.length <= 10)
    }
    rows.foreach { case (_, _, tf, df, score) =>
      assert(score == tf.toDouble * n / df)
    }
  }

  test("text_filter: keep iff reasons empty, and both verdicts occur") {
    val rows = operators.Pipeline.textFilter(spark, sf)
      .select("keep", "reasons").as[(Boolean, String)].collect()
    rows.foreach { case (keep, reasons) => assert(keep == reasons.isEmpty) }
    assert(rows.exists(_._1) && rows.exists(!_._1), "filter should split the corpus")
  }

  test("shard_assign: balanced-ish deterministic shards with dense positions") {
    val rows = operators.Pipeline.shardAssign(spark, sf, 16)
      .select("shard_id", "pos_in_shard").as[(Long, Long)].collect()
    val byShard = rows.groupBy(_._1)
    assert(byShard.keys.forall(s => s >= 0 && s < 16))
    byShard.foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq, "positions are dense 1..k")
    }
    // content-keyed md5 sharding: no shard takes more than ~3x its fair share
    assert(byShard.values.map(_.length).max <= rows.length / 16 * 3)
    // determinism across evaluations
    val again = operators.Pipeline.shardAssign(spark, sf, 16)
      .select("shard_id", "pos_in_shard").as[(Long, Long)].collect()
    assert(rows.toSeq == again.toSeq)
  }

  test("connectedComponents: driver union-find fast path equals the distributed loop") {
    val pairs = Seq(
      (1L, 2L), (2L, 3L), // chain -> {1,2,3}
      (10L, 11L), // pair
      (20L, 21L), (21L, 22L), (20L, 22L), // triangle
      (30L, 31L), (32L, 31L), (33L, 30L), (34L, 33L), // deeper chain
    ).toDF("doc_a", "doc_b")
    val fast = operators.Pipeline.connectedComponents(pairs)
      .as[(Long, Long)].collect().toSet
    val dist = operators.Pipeline.connectedComponents(pairs, driverMaxEdges = -1L)
      .as[(Long, Long)].collect().toSet
    assert(fast == dist)
    assert(fast.filter(_._1 <= 3L).map(_._2) == Set(1L))
    assert(fast.filter(t => t._1 >= 30 && t._1 <= 34).map(_._2) == Set(30L))
  }

  test("q_grouping_sets: finer sets roll up consistently") {
    val rows = Relational.qGroupingSets(spark, sf)
      .select(col("gid"), col("n_rows")).as[(Long, Long)].collect()
    val fine = rows.collect { case (0L, n) => n }.sum
    val mid = rows.collect { case (1L, n) => n }.sum
    val total = rows.collect { case (3L, n) => n }.sum
    assert(fine == total && mid == total && total > 0)
  }
}
