package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = GraftSession.build("local[4]", shufflePartitions = 4)
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("every declared query has an oracle or is explicitly rows-only") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name runs at sf0.001 and returns rows") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("q1_agg values are internally consistent") {
    val rows = operators.Relational.q1Agg(spark, sf).collect()
    rows.foreach { r =>
      val sumQty = r.getAs[Double]("sum_qty")
      val n = r.getAs[Long]("count_order")
      val avg = r.getAs[Double]("avg_qty")
      assert(math.abs(sumQty / n - avg) < 1e-9)
      assert(r.getAs[Double]("sum_charge") >= r.getAs[Double]("sum_disc_price"))
    }
  }

  test("q_sessionize session bounds are ordered and disjoint per user") {
    val rows = operators.Relational.qSessionize(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("session_id"))
      sorted.foreach { r =>
        assert(!r.getAs[java.sql.Timestamp]("session_start").after(r.getAs[java.sql.Timestamp]("session_end")))
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val gap = b.getAs[java.sql.Timestamp]("session_start").getTime -
            a.getAs[java.sql.Timestamp]("session_end").getTime
          assert(gap > 1800L * 1000, "adjacent sessions must be > 30min apart")
        case _ => ()
      }
    }
  }
}

/** Plan-quality gates (SURVEY.md §4): pushdown reaches the scan,
  * small dims broadcast. These guard the 100 TB story, not just
  * correctness.
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  test("q6_filter pushes predicates into the parquet scan") {
    val plan = operators.Relational.q6Filter(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("l_shipdate"), "shipdate filter should be pushed")
  }

  test("q1_agg prunes columns at the scan") {
    val scan = operators.Relational.q1Agg(spark, sf)
      .queryExecution.executedPlan.toString
    // l_orderkey is never referenced by q1 → must not be read
    assert(!scan.contains("l_orderkey"), "q1 must not read l_orderkey")
  }

  test("q5_multijoin broadcasts the dimension tables") {
    val plan = operators.Relational.q5Multijoin(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q_bloom_prune probes map-side before the verify join") {
    val plan = operators.Relational.qBloomPrune(spark, sf).queryExecution.executedPlan.toString
    // the probe must be a Filter on the fact scan side (map-side,
    // pre-shuffle), not evaluated after the join
    val probeAt = plan.indexOf("bloommightcontainlong")
    val joinAt = plan.indexOf("Join")
    assert(probeAt >= 0, s"bloom probe missing from the plan:\n$plan")
    assert(joinAt >= 0 && probeAt > joinAt,
      "probe should sit below (print after) the verify join, on the scan side")
  }

  test("no accidental cartesian products in the pair-space operators") {
    Seq(
      operators.Dedup.dedupMinhashLsh(spark, sf),
      operators.Dedup.dedupSimhash(spark, sf),
      operators.TextAnalysis.textWinnowPairs(spark, sf),
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan.linesIterator.take(5).mkString("\n"))
    }
  }

  test("chunk-store point lookup prunes to the hash-prefix bucket partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prune").toString
    val store = lake.ChunkStore.init(spark, dir)
    import spark.implicits._
    val payload = ("z" * 900) // 4 parts → a few distinct buckets
    store.putBlobs(Seq((1L, payload)).toDF("id", "s").select(col("id"), col("s").cast("binary").as("data")))
    val hash = store.catalog.select("blob_hash").as[String].head()
    val df = store.getBlobsByHashes(Seq(hash))
    assert(new String(df.filter(col("verified")).select("data").as[Array[Byte]].head()) == payload)
    // the chunks scan must carry partition filters on bucket
    val scans = df.queryExecution.executedPlan.toString
    assert(scans.contains("PartitionFilters: [bucket"), scans.linesIterator.filter(_.contains("FileScan")).take(3).mkString("\n"))
  }

  test("global audit: no query plans a CartesianProduct or an unbounded BNLJ") {
    // BroadcastNestedLoopJoin is acceptable ONLY when the broadcast side
    // is a bounded set by construction: ann_bruteforce (≤20 queries,
    // exact-baseline by design), ann_ivf and dedup_semantic (both join
    // against the same broadcast 16-centroid quantizer), and text_tfidf
    // + text_bm25 (a 1-row global-stats aggregate cross-joined in as
    // corpus size N / avgdl — surfaced only once this audit stopped
    // fail-fasting). Everywhere else a BNLJ means an all-pairs
    // scale-killer slipped in (round-1 dedup_embedding lesson).
    // ann_pq joins a broadcast BOUNDED query batch (20 rows by API
    // contract) against the compressed code relation — the same shape
    // as ann_bruteforce.
    // text_surprisal cross-joins a broadcast 1-ROW corpus total into
    // the per-term table — the text_tfidf/text_bm25 shape.
    // q_histogram and sample_negatives cross-join a broadcast 1-ROW
    // bounds/count aggregate into the scan — the q_zorder shape.
    // q22_idle broadcast-crosses a 1-ROW average-balance aggregate
    // into the customer scan — the q_zorder shape again.
    // q_abtest cross-joins TWO broadcast 1-ROW arm-size aggregates
    // (n_a, n_b) into the per-event-type conversion table — the same
    // bounded 1-row-broadcast shape.
    // q_rolling_dau cross-joins a broadcast 1-ROW day-bounds aggregate
    // into the (user, day) rollup — the q_zorder shape.
    // q_decay (1-row max-day anchor) and q_benford (1-row corpus
    // count) are the same bounded 1-row-broadcast shape.
    // text_rrf fuses two top-100 rankings; the BM25 side carries
    // text_bm25's 1-row global-stats cross join.
    val boundedBroadcast = Set("ann_bruteforce", "ann_ivf", "ann_pq",
      "text_tfidf", "text_bm25", "text_surprisal", "q_zorder", "q_histogram",
      "sample_negatives", "q22_idle", "ann_classify", "text_pmi", "text_heavy_hitters",
      "q_skew_report", "q_abtest", "q_rolling_dau", "text_rrf", "q_decay", "q_benford",
      // emb_kmeans assigns against the broadcast 8-centroid table —
      // the ann_ivf quantizer shape
      "emb_kmeans",
      // q_growth clips churn at a broadcast 1-ROW max-day anchor —
      // the q_decay shape
      "q_growth",
      // q_basket_lift cross-joins a broadcast 1-ROW basket total —
      // the q_zorder shape
      "q_basket_lift",
      // q_seqmine cross-joins a broadcast 1-ROW distinct-user count
      // into the ≤|event_types|² pattern table — the q_benford shape
      "q_seqmine",
      // ann_delete assigns the corpus against the broadcast
      // 16-centroid table (ann_ivf quantizer shape); the tombstone
      // join is a broadcast equi-join, not part of the BNLJ
      "ann_delete",
      // ann_ivf_indexed probes the broadcast persisted centroid table
      // (the ann_ivf quantizer shape); the list read is an equi-join
      // on the partition column
      "ann_ivf_indexed",
      // ann_ivfpq probes the same broadcast persisted centroid table;
      // the compressed-list read and the re-rank are equi-joins
      "ann_ivfpq",
      // ann_ivfpq_live adds only a broadcast tombstone ANTI equi-join
      // on top of the ann_ivfpq shape
      "ann_ivfpq_live",
      // q11_important cross-joins a broadcast 1-ROW nation-total
      // aggregate into the per-part stock rollup — the q22_idle shape
      "q11_important",
      // sample_temperature cross-joins a broadcast 1-ROW corpus-total
      // aggregate into the |sources|-row rate table — the same shape
      "sample_temperature",
      // ann_graph_expand embeds annIvf's broadcast 16-centroid
      // quantizer assignment (its seed stage) — the ann_ivf shape
      "ann_graph_expand",
      // q_theta_sets pairwise-joins the per-type sketch table with
      // itself on a non-equi (type_a < type_b) predicate — both sides
      // ≤ |event_types| rows by construction, a bounded broadcast
      "q_theta_sets",
      // sample_dsir cross-joins a broadcast 1-ROW corpus-totals
      // aggregate into the 4096-row λ table — the q_zorder shape
      "sample_dsir",
      // decontaminate_semantic broadcasts the eval-benchmark suite
      // (fixed-size by nature) and scores corpus vectors map-side —
      // the ann_bruteforce contract
      "decontaminate_semantic",
      // pipeline_mixture cross-joins TWO broadcast 1-ROW token totals
      // into the |sources|-row share table — the q_abtest shape
      "pipeline_mixture",
      // q_join_card cross-joins two 1-ROW aggregates (the exact-pairs
      // rollup and the 256-bucket sketch summary) — the q_abtest
      // two-anchor shape
      "q_join_card",
      // q_join_card2 joins two ≤256-ROW bucket sketches plus 1-row
      // summary anchors — the q_join_card shape with the sketch⋈sketch
      // equi-join riding a bounded broadcast
      "q_join_card2",
      // lake_preflight points the q_join_card2 two-sketch algebra at
      // the manifest⋈store join — the same ≤256-row bounded shape
      "lake_preflight",
      // q_acf cross-joins a broadcast 1-ROW global day-span aggregate
      // into the per-type grid explode — the q_zorder shape
      "q_acf",
      // q_kanon cross-joins a broadcast 1-ROW record total into the
      // <=5-row class-size rollup — the q_zorder shape
      "q_kanon",
      // q_freshness cross-joins a broadcast 1-ROW corpus-max anchor
      // into the per-type rollup — the q_decay shape
      "q_freshness",
      // text_overlap crosses the TWO ≤|sources|-row (20) shingle-set
      // size tables on a non-equi (src_a < src_b) predicate to build
      // the 190-row pair grid — the q_theta_sets bounded-both-sides
      // shape; the fact-sized work is all equi-keyed
      "text_overlap",
      // text_js: the same ≤|sources|-row pair grid (totals × totals,
      // src_a < src_b) — the text_overlap shape
      "text_js",
      // text_overlap_sketch crosses the TWO ≤|sources|-row (20)
      // MinHash signature tables on the same non-equi predicate —
      // the text_overlap bounded-both-sides shape
      "text_overlap_sketch",
      // ann_range broadcasts the bounded 20-query batch against the
      // corpus on the non-equi self-exclusion predicate — the
      // ann_bruteforce contract (queries ≪ corpus by API contract)
      "ann_range",
      // ann_rp: the same broadcast bounded-query-batch shape for the
      // 32-dim shortlist scan; the exact re-rank is an equi-join on
      // (query_id, neighbor_id)
      "ann_rp",
      // pipeline_dataset_card cross-joins a broadcast 1-ROW corpus
      // byte total into the |sources|-row card — the q_zorder shape
      "pipeline_dataset_card",
      // ann_hamming broadcasts the bounded 20-query batch against the
      // corpus on the non-equi self-exclusion predicate — the
      // ann_bruteforce contract (queries ≪ corpus by API contract)
      "ann_hamming",
      // (ann_hamming_rerank's hamming-shortlist BNLJ runs at
      // CONSTRUCTION time against the materialized code table; its
      // FINAL plan is the bounded-pair equi-join re-rank — no BNLJ,
      // so it is deliberately NOT whitelisted)
      // text_collocations cross-joins a broadcast 1-ROW token/bigram
      // totals aggregate into the bigram-type table — the q_zorder
      // shape
      "text_collocations",
      // pipeline_shards cross-joins a broadcast 1-ROW corpus byte
      // total into the ≤16-row shard manifest — the q_zorder shape
      "pipeline_shards")
    // Two-sided: a whitelisted query whose plan no longer contains a
    // BNLJ is ALSO a failure — a stale entry would silently mask a
    // future unbounded BNLJ reappearing in that query (r15 verdict:
    // dedup_semantic/ann_incremental rotted exactly this way after
    // their kernel rewrites removed the quantizer BNLJ).
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      val hasBnlj = plan.contains("BroadcastNestedLoopJoin")
      val cartesian = if (plan.contains("CartesianProduct")) Seq(s"$name plans a cartesian product") else Nil
      val bnlj =
        if (!boundedBroadcast(name) && hasBnlj) Seq(s"$name plans an unbounded BNLJ")
        else if (boundedBroadcast(name) && !hasBnlj)
          Seq(s"$name is BNLJ-whitelisted but plans no BNLJ — prune the stale entry")
        else Nil
      cartesian ++ bnlj
    }
    val unknown = boundedBroadcast -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"BNLJ whitelist names unknown queries: $unknown")
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("global audit: every unpartitioned window sits on a metadata-bounded input") {
    // a Window with no PARTITION BY moves ALL input rows to a single
    // partition — at 100 TB that is a driver-killer unless the input
    // is metadata-sized by construction. The r8 verdict asked for this
    // pin. Two layers:
    //  1. FINAL plans: zero unpartitioned windows, no whitelist needed
    //     (the audit run proved the 211 final plans clean);
    //  2. INTERMEDIATE executions during query construction (iterative
    //     ops materialize via localCheckpoint, so their plans vanish
    //     from the final tree — these are what the test log's
    //     "WindowExec: No Partition Defined" warnings come from): a
    //     QueryExecutionListener watches every execution; queries in
    //     `boundedIntermediate` may run global windows ONLY on
    //     metadata-sized inputs (|distinct sizes| rows, 1-row anchors,
    //     k-row shortlists) — reviewed per entry below.
    // TreeNode.collect does NOT descend through the AQE wrapper (or
    // query stages / cached relations) — a naive collect reported 0 on
    // plans whose WARN lines prove a global window ran. Flatten first.
    def flatten(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.SparkPlan] = {
      val expanded = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case r: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => Seq(r.relation.cachedPlan)
        case _ => p.children
      }
      p +: expanded.flatMap(flatten)
    }
    def globalWindows(plan: org.apache.spark.sql.execution.SparkPlan): Int = flatten(plan).count {
      case w: org.apache.spark.sql.execution.window.WindowExec => w.partitionSpec.isEmpty
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w.partitionSpec.isEmpty
      case _ => false
    }
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var current = ""
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String, qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        if (globalWindows(qe.executedPlan) > 0) seen.add(current)
      override def onFailure(f: String, qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    // Every name here was reviewed: its global-window input is
    // metadata-sized BY CONSTRUCTION, never the fact table. Add a name
    // ONLY with a proof comment.
    val boundedGlobalWindow = Set(
      // running max over the ≤|distinct p_size| rollup (tens of rows)
      "q_skyline",
      // rank over a limit(100) shortlist
      "text_vocab",
      // running sums over the checkpoint rollup (n_docs / bucket rows —
      // an audit table, not the corpus)
      "text_vocab_growth",
      // ranks over two ≤100-row retrieval shortlists and their fusion
      "text_rrf",
      // running sum over the (band, bucket) count rollup — ≤ 10·256
      // rows whatever the corpus size; the fact table itself only sees
      // per-(band,bucket)-partitioned windows
      "sample_curriculum")
    spark.listenerManager.register(listener)
    try {
      val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        current = name
        val df = fn(spark, sf)
        if (!boundedGlobalWindow(name) && globalWindows(df.queryExecution.executedPlan) > 0)
          Seq(s"$name plans an unpartitioned window in its FINAL plan") else Nil
      }
      assert(failures.isEmpty, failures.mkString("; "))
      // the listener bus is async; give stragglers a moment to land.
      // Attribution via `current` is best-effort (a late event may name
      // the next query) — with an expected-empty offender set that
      // slop cannot hide a finding, only mislabel it.
      Thread.sleep(1500)
      val bad = scala.jdk.CollectionConverters.CollectionHasAsScala(seen).asScala
        .toSeq.distinct.filterNot(boundedGlobalWindow)
      assert(bad.isEmpty,
        s"construction-time unpartitioned windows outside the bounded whitelist: $bad")
    } finally spark.listenerManager.unregister(listener)
  }

  test("q1_agg uses whole-stage codegen") {
    val df = operators.Relational.q1Agg(spark, sf)
    df.collect() // materialize so AQE finalizes the physical plan
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen spans in the plan string
    assert(plan.contains("*("), plan)
    assert(plan.contains("partial_sum"), "map-side combine expected before the shuffle")
  }
}
