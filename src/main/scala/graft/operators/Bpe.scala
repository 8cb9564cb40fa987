package graft.operators

import graft.GraftSession.table
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.5 #33k — distributed BPE (byte-pair-encoding) vocab
  * training (Sennrich'16), the subword-tokenizer construction step of
  * an LLM data pipeline.
  *
  * The classic algorithm, shaped for a cluster:
  *  1. one shuffle builds the (word, freq) table — afterwards corpus
  *     size only enters through integer freq weights;
  *  2. per merge round: count adjacent symbol pairs (map-side
  *     zip_with + one partial-agg shuffle over the word table), take
  *     the argmax pair (a TakeOrdered of ONE row to the driver —
  *     deterministic (count desc, left, right) tie-break), and apply
  *     the merge to every word with a codegen'd fold (greedy
  *     left-to-right non-overlapping, the standard BPE scan);
  *  3. the symbol table is re-cached each round and the previous
  *     round released, so lineage and memory stay O(1) per round
  *     instead of O(rounds) (at web scale you would checkpoint every
  *     few rounds — same idea, different knob).
  *
  * Only the merge list (numMerges rows) ever lives on the driver.
  * Iterative argmax is not expressible in one SQL statement → declared
  * rows-only + ScalaTest exact replay against a plain-Scala reference.
  */
object Bpe {

  /** greedy left-to-right merge of adjacent (left, right) into
    * `merged` over a symbol array — a lookbehind fold: appending `s`
    * merges with the accumulator tail exactly when the tail is `left`
    * and `s` is `right`, which reproduces BPE's non-overlapping scan
    * ("aaaa" + (a,a) → [aa, aa]).
    */
  private def applyMerge(syms: Column, left: String, right: String): Column = {
    val l = lit(left)
    val r = lit(right)
    val m = lit(left + right)
    aggregate(
      syms,
      array().cast(ArrayType(StringType)),
      (acc, s) =>
        when(size(acc) > 0 && element_at(acc, -1) === l && s === r,
          concat(slice(acc, lit(1), size(acc) - 1), array(m)))
          .otherwise(concat(acc, array(s))),
    )
  }

  /** adjacent symbol pairs of a word, weighted later by its freq. */
  private def pairsOf(syms: Column): Column =
    zip_with(
      slice(syms, lit(1), greatest(size(syms) - 1, lit(0))),
      slice(syms, lit(2), greatest(size(syms) - 1, lit(0))),
      (a, b) => struct(a.as("l"), b.as("r")),
    )

  /** Train `numMerges` BPE merges over a (word, freq) table. Returns
    * the merge table: (merge_idx, left, right, merged, pair_count).
    */
  def bpeTrain(wordFreq: DataFrame, numMerges: Int): DataFrame = {
    val spark = wordFreq.sparkSession
    import spark.implicits._
    // localCheckpoint (eager) per round, NOT cache: the merge fold
    // nests one HOF expression per round, so an uncut lineage makes
    // Catalyst re-analyze an O(rounds)-deep tree every round —
    // measured ~6 s/round of pure driver time at ANY data size.
    // Checkpointing truncates the plan to a flat scan; the superseded
    // round's storage is released by the context cleaner when its ref
    // drops. (On a real cluster use reliable checkpoint for fault
    // tolerance — same shape, different sink.)
    var syms = wordFreq
      .select(col("freq"), split(col("word"), "").as("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, String, Long)]()
    for (i <- 0 until numMerges) {
      val top = syms
        .select(col("freq"), explode(pairsOf(col("syms"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .as[(String, String, Long)]
        .collect()
      if (top.isEmpty) return mergesDf(spark, merges.toSeq) // corpus exhausted
      val (l, r, cnt) = top.head
      merges += ((i, l, r, l + r, cnt))
      syms = syms
        .select(col("freq"), applyMerge(col("syms"), l, r).as("syms"))
        .localCheckpoint()
    }
    mergesDf(spark, merges.toSeq)
  }

  private def mergesDf(spark: SparkSession, m: Seq[(Int, String, String, String, Long)]): DataFrame = {
    import spark.implicits._
    m.toDF("merge_idx", "left", "right", "merged", "pair_count")
      .select(
        col("merge_idx").cast(LongType).as("merge_idx"),
        col("left"), col("right"), col("merged"),
        col("pair_count"),
      )
  }

  /** named query: 16 merges over the documents corpus (lowercased
    * whitespace words).
    */
  def textBpe(spark: SparkSession, dir: String): DataFrame = {
    val wf = table(spark, dir, "documents")
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    bpeTrain(wf, 16).orderBy("merge_idx")
  }

  /** Plain-Scala reference encoder: apply merges IN TRAINING ORDER,
    * each a greedy left-to-right non-overlapping pass (the same scan
    * [[applyMerge]] folds, and what SentencePiece/GPT-2 BPE do at
    * apply time). Shared by the codegen expression and the spec.
    */
  private[graft] def encodeWord(word: String, lefts: Array[String], rights: Array[String]): Seq[String] = {
    var syms: List[String] = word.split("").toList
    var i = 0
    while (i < lefts.length) {
      val l = lefts(i); val r = rights(i); val m = l + r
      val out = scala.collection.mutable.ListBuffer[String]()
      var rest = syms
      while (rest.nonEmpty) {
        rest match {
          case a :: b :: tail if a == l && b == r => out += m; rest = tail
          case a :: tail => out += a; rest = tail
          case Nil => ()
        }
      }
      syms = out.toList
      i += 1
    }
    syms
  }

  /** §2.5 #33n — apply a trained merge list to the corpus (the encode
    * side of BPE): per-document subword token counts.
    *
    * Scale shape: the encoder runs once per DISTINCT word — cost is
    * proportional to the vocabulary, not the corpus — and the per-word
    * token counts join back onto the (doc_id, word) occurrence
    * relation with an ordinary shuffle join (small enough to broadcast
    * at these SFs; AQE makes that call). The merge list itself is a
    * driver-side constant baked into one expression
    * ([[graft.functions.BpeEncodeCount]]) so the distinct-word pass
    * stays inside whole-stage codegen.
    */
  def bpeEncode(spark: SparkSession, dir: String, numMerges: Int = 16): DataFrame = {
    import spark.implicits._
    val wf = table(spark, dir, "documents")
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val merges = bpeTrain(wf, numMerges)
      .orderBy("merge_idx")
      .select(col("left"), col("right"))
      .as[(String, String)]
      .collect()
    val lefts = merges.map(_._1)
    val rights = merges.map(_._2)
    val occurrences = table(spark, dir, "documents")
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val wordTokens = occurrences.select(col("word")).distinct()
      .withColumn("n_tok", graft.functions.ArrayExprs.bpeEncodeCount(col("word"), lefts, rights))
    occurrences.join(wordTokens, "word")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("n_tok")).as("n_bpe_tokens"),
      )
      .withColumn("tokens_per_word", col("n_bpe_tokens").cast(DoubleType) / col("n_words"))
      .orderBy("doc_id")
  }

  private def textBpeEncode(spark: SparkSession, dir: String): DataFrame =
    bpeEncode(spark, dir)

  /** §2.5 #33nb — tokenizer fertility audit per source: the
    * mixture-weighting diagnostic a training pipeline publishes
    * before setting sampling rates, because budgets are spent in
    * TOKENS, not docs or bytes — two sources with equal byte counts
    * can differ ×2 in token cost under the same tokenizer. Per
    * source: doc/word/BPE-token/byte totals, fertility_ppm
    * (BPE tokens per word — high = the vocabulary fits this source
    * poorly, its text is "expensive"), and bytes_per_token_ppm (the
    * budget-planning number: how many corpus bytes one training
    * token buys). Uses the same trained 16-merge BPE and the same
    * [[graft.functions.BpeEncodeCount]] codegen kernel as
    * [[bpeEncode]], so the audit measures the actual tokenizer, not
    * a proxy.
    *
    * Scale shape: training is vocabulary-bounded, the encoder runs
    * once per DISTINCT word, the occurrence join-back shuffles on the
    * word key, and the report is one map-side-combined per-source
    * rollup. Rows-only (iterative BPE trainer); ScalaTest replays the
    * whole audit with the shared plain-Scala [[encodeWord]].
    */
  def textFertility(spark: SparkSession, dir: String, numMerges: Int = 16): DataFrame = {
    import spark.implicits._
    val wf = table(spark, dir, "documents")
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
    val merges = bpeTrain(wf, numMerges)
      .orderBy("merge_idx")
      .select(col("left"), col("right"))
      .as[(String, String)]
      .collect()
    val occurrences = table(spark, dir, "documents")
      .select(col("source"), col("doc_id"), explode(split(lower(col("text")), " ")).as("word"))
      .filter(length(col("word")) > 0)
    val wordTokens = occurrences.select(col("word")).distinct()
      .withColumn("n_tok",
        graft.functions.ArrayExprs.bpeEncodeCount(col("word"), merges.map(_._1), merges.map(_._2)))
    val perSrc = occurrences.join(wordTokens, "word")
      .groupBy(col("source"))
      .agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_words"),
        sum(col("n_tok")).as("n_bpe_tokens"),
      )
    val bytes = table(spark, dir, "documents")
      .groupBy(col("source"))
      .agg(sum(octet_length(col("text")).cast(LongType)).as("n_bytes"))
    perSrc.join(bytes, "source")
      .select(
        col("source"), col("n_docs"), col("n_words"), col("n_bpe_tokens"), col("n_bytes"),
        expr("n_bpe_tokens * 1000000L div n_words").as("fertility_ppm"),
        expr("n_bytes * 1000000L div n_bpe_tokens").as("bytes_per_token_ppm"),
      )
      .orderBy("source")
  }

  private def textFertilityQuery(spark: SparkSession, dir: String): DataFrame =
    textFertility(spark, dir)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bpe" -> (textBpe _),
    "text_bpe_encode" -> (textBpeEncode _),
    "text_fertility" -> (textFertilityQuery _),
  )

  val oracles: Map[String, String] = Map.empty // declared rows-only + ScalaTest replay
}
