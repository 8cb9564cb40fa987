package graft.tools

import graft.{BenchBaseline, GraftSession, SparkEntry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 scale probe (r7 verdict, next-round #7): one honest cold run of
  * the heaviest queries at ~10× the bench SF, to catch superlinear
  * blowups the sf0.1 bench cannot see (a quadratic candidate set or an
  * accidentally-global sort looks fine at 600k rows and explodes at
  * 6M).
  *
  * The driver generates no sf1 testdata, so the probe DERIVES one from
  * sf0.1: each fact/dim table is replicated `Factor` times with every
  * id column shifted by replica·10^8 — disjoint key spaces, so the
  * graph queries see `Factor` disjoint copies of the same graph (the
  * honest way to scale a graph without changing its diameter) and the
  * corpus queries see a `Factor`× corpus. Document text gets a
  * replica suffix so content addresses and shingles differ across
  * replicas instead of producing a pathological 10-way-everything
  * duplicate corpus. The derived data lives under target/ (gitignored,
  * inside the repo) and is rebuilt only when absent.
  *
  * Pass criterion: no query takes more than `Factor`× its same-run
  * sf0.1 time (linear-or-better scaling); results land in
  * BENCH_sf1.json next to the per-round bench artifacts.
  *
  * Usage: runMain graft.tools.ScaleProbe [queries...]
  */
object ScaleProbe {

  /** Replication factor over sf0.1. Default 10 (the standing sf1
    * probe); SPARK_GRAFT_SCALE_FACTOR=30 derives an sf3 dataset for
    * trend confirmation on the worst sf1 curves (two points make a
    * line; three make a trend). Every shifted id column is int64, so
    * the key stride never overflows at any plausible factor.
    */
  private val Factor = sys.env.get("SPARK_GRAFT_SCALE_FACTOR").map { v =>
    require(v.matches("\\d+") && v.toInt > 0,
      s"SPARK_GRAFT_SCALE_FACTOR must be a positive integer (replication over sf0.1), got '$v'")
    v.toInt
  }.getOrElse(10)
  /** Label for output dir + artifact: the actual scale factor
    * Factor/10 — 10 → "1" (BENCH_sf1.json, target/sf1, the
    * established names), 30 → "3", 15 → "1.5" (never "015", which
    * reads as sf0.15 for sf1.5 data).
    */
  private val SfLabel =
    if (Factor % 10 == 0) (Factor / 10).toString
    else (Factor / 10.0).toString
  private val Offset = 100000000L // replica key stride; all sf0.1 keys ≪ 10^8

  /** id columns to shift per table; everything else copies verbatim. */
  private val idCols: Map[String, Seq[String]] = Map(
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "events" -> Seq("user_id", "event_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "nation" -> Seq(),
    "region" -> Seq(),
  )

  /** The default probe set: the heaviest floors (graph family + the
    * corpus-quadratic-risk ops) plus the r10 additions whose scale
    * story deserves measurement, not just argument: the packed
    * 32-register ANF loop (widest rows in the repo), text_overlap's
    * gram-keyed pair fan-out, and q_gini's two-level prefix-sum
    * ranking over near-unique values.
    */
  private val DefaultQueries = Seq(
    "q_hits", "q_pagerank", "q_components", "q_bfs", "q_ppr",
    "q_kcore", "q_communities", "q_msf", "dedup_containment", "ann_recall",
    "q_neighborhood", "q_neighborhood_k", "text_overlap",
    "text_overlap_sketch", "q_gini",
    // r12 additions: the store rewrite (O(store) exchange — the one
    // op whose cost SHOULD be exactly linear) and the composed-index
    // read (must stay at the probed fraction as the corpus grows)
    "lake_rebalance_exec", "ann_ivfpq",
    // r14 additions: the compaction rewrite (another O(store)
    // exchange: fragmented write + consolidated rewrite), the 4-family
    // probe sweep (per-family one corpus pass — must track the
    // corpus), the exact radius scan (linear by contract), and the
    // map-side JL projection (one kernel pass — the flattest curve in
    // the set if the design claim holds)
    "lake_compact_exec", "ann_probe_sweep", "ann_range", "emb_rp")

  private def buildScaled(spark: SparkSession, src: String, out: String): Unit = {
    idCols.foreach { case (name, ids) =>
      val base = GraftSession.table(spark, src, name)
      val scaled: DataFrame =
        if (ids.isEmpty) base // dims shared by every replica
        else (0 until Factor).map { r =>
          val shifted = ids.foldLeft(base) { (df, c) =>
            // preserve the column's original type: every sf0.1 key +
            // 9·10^8 still fits an int32
            df.withColumn(c, (col(c) + lit(r * Offset)).cast(df.schema(c).dataType))
          }
          if (name == "documents")
            shifted.withColumn("text",
              if (r == 0) col("text") else concat(col("text"), lit(s" replica$r")))
          else if (name == "embeddings" && r != 0)
            // perturb one coordinate per replica: verbatim vector copies
            // would land 10-way-identical in every LSH/IVF bucket, making
            // the ann probe time a pathological duplicate corpus rather
            // than a genuine 10x one (same reason documents get a suffix)
            shifted.withColumn("embedding",
              expr(s"transform(embedding, (x, i) -> IF(i = 0, CAST(x + ${r}e-3 AS FLOAT), x))"))
          else shifted
        }.reduce(_ unionAll _)
      scaled.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scaleprobe] built $name")
    }
  }

  def main(args: Array[String]): Unit = {
    val src = "/root/testdata/sf0.1"
    val out = s"/root/repo/target/sf$SfLabel"
    val names = if (args.nonEmpty) args.toSeq else DefaultQueries
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    GraftSession.tunedConf.foreach { case (k, v) => spark.conf.set(k, v) }
    spark.sparkContext.setLogLevel("WARN")

    // sentinel written only after EVERY table lands: a crash mid-build
    // leaves no sentinel, so the next run rebuilds instead of silently
    // probing a partial dataset (idCols is an unordered Map — any table
    // may have been the one written before the crash)
    val sentinel = new java.io.File(s"$out/_GRAFT_COMPLETE")
    if (!sentinel.exists()) {
      buildScaled(spark, src, out)
      sentinel.createNewFile()
    }

    def materialize(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()
    // JIT/codegen warm-up at the smallest SF so the timing measures the plan
    names.foreach(n => try materialize(SparkEntry.queries(n)(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () })
    spark.catalog.clearCache()

    def timed(n: String, dir: String): Double = {
      val t0 = System.nanoTime()
      materialize(SparkEntry.queries(n)(spark, dir))
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      dt
    }
    // retry-on-spike, mirroring Bench's retry-on-regression: the
    // shared box shows episodic multi-second stalls on unchanged
    // plans (q_neighborhood_k measured 34 s and 113 s at sf1 in two
    // back-to-back probes of identical code+data), so a first-pass
    // ratio over the gate gets up to two fresh re-timings of the sf1
    // side (min kept) before it stands — a surviving flag spans three
    // separate windows and means real superlinearity.
    //
    // BOTH sides are spike-guarded (r12 verdict item 2): a spiked
    // sf0.1 DENOMINATOR can't trigger the gate (it deflates the
    // ratio) but it corrupts the artifact — BENCH_sf1 once recorded
    // q_communities at sf0.1 = 24.78 s against a 2.59 s bench read,
    // a nonsense 0.43x ratio in the permanent scale-evidence record,
    // and symmetrically inflates a twin's ratio. So an sf0.1 reading
    // above 2x its frozen floor (BenchBaseline.sf01Floors — itself a
    // best-honest-cold sf0.1 measurement) gets up to two re-timings
    // (min kept) before the ratio is formed. Queries without a floor
    // (none today) skip the denominator guard.
    val rows = names.map { n =>
      var t01 = timed(n, src)
      val floor = BenchBaseline.sf01Floors.get(n)
      var denomTries = 0
      while (floor.exists(f => t01 > 2 * f + 0.25) && denomTries < 2) {
        t01 = math.min(t01, timed(n, src))
        denomTries += 1
      }
      var t1 = timed(n, out)
      var tries = 0
      while (t1 / math.max(0.001, t01) > Factor && tries < 2) {
        t1 = math.min(t1, timed(n, out))
        tries += 1
      }
      val ratio = t1 / math.max(0.001, t01)
      println(f"[scaleprobe] $n%-20s sf0.1 $t01%7.2fs   sf$SfLabel%s $t1%7.2fs   ratio ${ratio}%5.2fx")
      (n, t01, t1, ratio)
    }
    def num(v: Double) = "%.2f".format(v)
    // MERGE into the standing artifact instead of clobbering it: a
    // targeted probe of one query must not erase the other 20 entries
    // of scale evidence (the bench_full.json lesson — a probe once
    // overwrote the round's full artifact). The file is this tool's
    // own fixed format, so a line-free regex pull of existing entries
    // is exact; probed queries overwrite their old entry.
    val artifact = new java.io.File(s"BENCH_sf$SfLabel.json")
    val existing: Seq[(String, String)] =
      if (!artifact.exists()) Seq.empty
      else {
        val txt = scala.io.Source.fromFile(artifact).mkString
        // entries measured under a DIFFERENT factor (or a pre-factor
        // vintage) must not be re-presented under this run's wrapper
        // as if produced by its configuration — drop them (r15 ADVICE)
        val oldFactor = """"factor":([0-9.]+)""".r.findFirstMatchIn(txt).map(_.group(1).toDouble)
        if (!oldFactor.contains(Factor.toDouble)) Seq.empty
        else
          // flat objects only ([^{}]): the `"queries":{` wrapper cannot
          // match, so it can't swallow the first real entry
          """"([A-Za-z0-9_]+)":(\{[^{}]*\})""".r.findAllMatchIn(txt)
            .map(m => m.group(1) -> m.group(2)).toSeq
      }
    val fresh = rows.map { case (n, a, b, r) =>
      n -> s"""{"sf01_sec":${num(a)},"sf${SfLabel}_sec":${num(b)},"ratio":${num(r)}}"""
    }
    val freshKeys = fresh.map(_._1).toSet
    val merged = existing.filterNot(e => freshKeys(e._1)) ++ fresh
    val json = merged.map { case (n, body) => s""""$n":$body""" }
      .mkString(s"""{"factor":$Factor,"queries":{""", ",", "}}")
    val w = new java.io.PrintWriter(artifact)
    try w.println(json) finally w.close()
    val worst = rows.maxBy(_._4)
    println(s"[scaleprobe] worst ratio: ${worst._1} at ${num(worst._4)}x (gate: <= $Factor x)")
    spark.stop()
    if (rows.exists(_._4 > Factor)) sys.exit(1)
  }
}
