package graft.operators

import graft.GraftSession.table
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.5 — text analysis over `documents`, all pure
  * `functions._` higher-order expressions (codegen'd, no UDFs).
  *
  * The corpus is single-spaced lowercase ASCII, so `split(text, ' ')`
  * is an exact tokenizer on both engines; ratios are computed as
  * integer counts divided at the end (deterministic IEEE doubles, so
  * they hash-match DuckDB).
  */
object TextAnalysis {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")

  private val words: Column = split(col("text"), " ")

  /** Stopword lists for the language-ID heuristic. Deliberately small
    * function-word sets; overlap between romance languages is normal
    * and resolved by the fixed-priority argmax.
    */
  private val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht"),
    "es" -> Seq("el", "la", "de", "los", "y", "es", "un"),
    "fr" -> Seq("le", "les", "et", "de", "un", "est", "dans"),
    "zh" -> Seq("de", "shi", "le", "wo", "bu", "zhe", "ni"),
  )

  private def stopCount(lang: String): Column = {
    val list = stopwords.toMap.apply(lang).map(w => s"'$w'").mkString(", ")
    expr(s"CAST(size(filter(split(text, ' '), w -> w IN ($list))) AS BIGINT)")
  }

  private def stopCountSqlDuck(lang: String): String = {
    val list = stopwords.toMap.apply(lang).map(w => s"'$w'").mkString(", ")
    s"CAST(len(list_filter(string_split(text, ' '), w -> w IN ($list))) AS BIGINT)"
  }

  /** §2.5 #32 — token counting: whitespace tokens + a BPE-ish estimate
    * (each word contributes ceil(len/4) subword units — the standard
    * ~4-chars-per-token heuristic).
    */
  def textTokens(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        col("doc_id"),
        size(words).cast(LongType).as("n_tokens"),
        expr("aggregate(split(text, ' '), CAST(0 AS BIGINT), (acc, w) -> acc + (length(w) + 3) DIV 4)")
          .as("n_bpe_tokens"),
        octet_length(col("text")).cast(LongType).as("n_bytes"),
      )
      .orderBy("doc_id")

  val textTokensSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(list_sum(list_transform(string_split(text, ' '), w -> (len(w) + 3) // 4)) AS BIGINT) AS n_bpe_tokens,
      |  CAST(len(text) AS BIGINT) AS n_bytes
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** §2.5 #31 — quality scoring: lexical-diversity and stopword ratios
    * with a composite score. All ratios are exact-int divisions.
    */
  def textQuality(spark: SparkSession, dir: String): DataFrame = {
    val nTokens = size(words).cast(LongType)
    val nUniq = size(array_distinct(words)).cast(LongType)
    docs(spark, dir)
      .select(
        col("doc_id"),
        nTokens.as("n_tokens"),
        nUniq.as("n_uniq"),
        stopCount("en").as("n_stop"),
        (octet_length(col("text")).cast(DoubleType) / nTokens).as("avg_token_len"),
        (nUniq.cast(DoubleType) / nTokens).as("uniq_ratio"),
        (stopCount("en").cast(DoubleType) / nTokens).as("stop_ratio"),
        ((nUniq.cast(DoubleType) / nTokens) * least(lit(1.0), nTokens.cast(DoubleType) / 50.0))
          .as("quality_score"),
      )
      .orderBy("doc_id")
  }

  val textQualitySql: String = {
    val stop = stopCountSqlDuck("en")
    s"""SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
      |  $stop AS n_stop,
      |  CAST(len(text) AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_len,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')) AS uniq_ratio,
      |  CAST($stop AS DOUBLE) / len(string_split(text, ' ')) AS stop_ratio,
      |  (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')))
      |    * least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0) AS quality_score
      |FROM documents
      |ORDER BY doc_id""".stripMargin
  }

  /** §2.5 #30 — language ID: per-language stopword hit counts, argmax
    * with fixed priority order (en > de > es > fr > zh on ties).
    */
  def textLangid(spark: SparkSession, dir: String): DataFrame = {
    val scored = docs(spark, dir).select(
      col("doc_id") +: col("lang").as("label_lang") +:
        stopwords.map { case (l, _) => stopCount(l).as(s"score_$l") }: _*
    )
    val langs = stopwords.map(_._1)
    val pred = langs.zipWithIndex.foldRight(lit(langs.last)) { case ((l, i), elseCol) =>
      if (i == langs.size - 1) elseCol
      else {
        val geAll = langs.drop(i + 1).map(o => col(s"score_$l") >= col(s"score_$o")).reduce(_ && _)
        when(geAll, lit(l)).otherwise(elseCol)
      }
    }
    scored
      .withColumn("pred_lang", pred)
      .withColumn("label_match", col("pred_lang") === col("label_lang"))
      .orderBy("doc_id")
  }

  val textLangidSql: String = {
    val scores = stopwords.map { case (l, _) => s"${stopCountSqlDuck(l)} AS score_$l" }.mkString(",\n  ")
    """WITH scored AS (
      |SELECT doc_id, lang AS label_lang,
      |  SCORES
      |FROM documents
      |)
      |SELECT doc_id, label_lang, score_en, score_de, score_es, score_fr, score_zh,
      |  CASE
      |    WHEN score_en >= score_de AND score_en >= score_es AND score_en >= score_fr AND score_en >= score_zh THEN 'en'
      |    WHEN score_de >= score_es AND score_de >= score_fr AND score_de >= score_zh THEN 'de'
      |    WHEN score_es >= score_fr AND score_es >= score_zh THEN 'es'
      |    WHEN score_fr >= score_zh THEN 'fr'
      |    ELSE 'zh'
      |  END AS pred_lang,
      |  (CASE
      |    WHEN score_en >= score_de AND score_en >= score_es AND score_en >= score_fr AND score_en >= score_zh THEN 'en'
      |    WHEN score_de >= score_es AND score_de >= score_fr AND score_de >= score_zh THEN 'de'
      |    WHEN score_es >= score_fr AND score_es >= score_zh THEN 'es'
      |    WHEN score_fr >= score_zh THEN 'fr'
      |    ELSE 'zh'
      |  END) = label_lang AS label_match
      |FROM scored
      |ORDER BY doc_id""".stripMargin.replace("SCORES", scores)
  }

  /** §2.5 #33 — document fingerprint: md5 of whitespace-normalized
    * text (the canonical-form fingerprint; the winnowing rolling-hash
    * variant is in [[graft.functions.Winnowing]], ScalaTest-checked).
    */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        col("doc_id"),
        md5(regexp_replace(trim(col("text")), "\\s+", " ")).as("norm_md5"),
        octet_length(col("text")).cast(LongType).as("n_bytes"),
      )
      .orderBy("doc_id")

  val textFingerprintSql: String =
    """SELECT doc_id,
      |  md5(regexp_replace(trim(text), '\s+', ' ', 'g')) AS norm_md5,
      |  CAST(len(text) AS BIGINT) AS n_bytes
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** §2.5 #33b — winnowing near-dup pairs: explode fingerprint sets,
    * join on shared fingerprints, keep pairs sharing ≥ 5. The standard
    * plagiarism-detection shape: one shuffle on fingerprint values
    * (like MinHash bands), no all-pairs cross. xxhash64-based →
    * rows-only check + WinnowingSpec properties.
    */
  def textWinnowPairs(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .select(col("doc_id"), graft.functions.Winnowing.fingerprints(col("text")).as("fp"))
    val ex = d.select(col("doc_id"), explode(col("fp")).as("f"))
    // stop-fingerprint cap (MOSS-style): a fingerprint shared by many
    // documents carries no near-dup signal but contributes O(df²)
    // candidate pairs — the classic frequent-token join blowup. Cap
    // document frequency at 20.
    val rare = ex.groupBy(col("f")).agg(count(lit(1)).as("df")).filter(col("df") <= 20).select("f")
    val exRare = ex.join(rare, Seq("f")).cache()
    exRare.select(col("doc_id").as("doc_a"), col("f"))
      .join(exRare.select(col("doc_id").as("doc_b"), col("f")), Seq("f"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_fp"))
      .filter(col("shared_fp") >= 5)
      .orderBy("doc_a", "doc_b")
  }

  /** n-word grams of `words` as a (non-distinct) array; docs shorter
    * than n yield a single whole-text gram. Codegen kernel, see
    * [[graft.functions.WordNgrams]].
    */
  private def ngrams(n: Int): Column =
    graft.functions.ArrayExprs.wordNgrams(words, n)

  /** §2.5 #31c — repetition scoring: the repeated-n-gram ratio
    * (1 − distinct/total over 2- and 3-grams), the standard boilerplate
    * / degenerate-generation signal (Gopher/MassiveText-style repetition
    * filters). Pure map-side column math — no shuffle at any scale.
    */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    def stats(n: Int) = {
      val g = ngrams(n)
      val total = size(g).cast(LongType)
      val uniq = size(array_distinct(g)).cast(LongType)
      (total, uniq, when(total > 0, lit(1.0) - uniq.cast(DoubleType) / total).otherwise(lit(0.0)))
    }
    val (t2, u2, r2) = stats(2)
    val (t3, u3, r3) = stats(3)
    docs(spark, dir)
      .select(
        col("doc_id"),
        t2.as("n_2grams"), u2.as("uniq_2grams"), r2.as("rep2_ratio"),
        t3.as("n_3grams"), u3.as("uniq_3grams"), r3.as("rep3_ratio"),
        (r3 > 0.2).as("is_repetitive"),
      )
      .orderBy("doc_id")
  }

  val textRepetitionSql: String = {
    def g(n: Int) = {
      val terms = (0 until n).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
      s"CASE WHEN len(ws) >= $n THEN list_transform(range(1, len(ws) - ${n - 2}), i -> $terms) ELSE [text] END"
    }
    s"""WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
      |g AS (SELECT doc_id, ${g(2)} AS g2, ${g(3)} AS g3 FROM w)
      |SELECT doc_id,
      |  CAST(len(g2) AS BIGINT) AS n_2grams,
      |  CAST(len(list_distinct(g2)) AS BIGINT) AS uniq_2grams,
      |  CASE WHEN len(g2) > 0 THEN 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2) ELSE 0.0 END AS rep2_ratio,
      |  CAST(len(g3) AS BIGINT) AS n_3grams,
      |  CAST(len(list_distinct(g3)) AS BIGINT) AS uniq_3grams,
      |  CASE WHEN len(g3) > 0 THEN 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3) ELSE 0.0 END AS rep3_ratio,
      |  (CASE WHEN len(g3) > 0 THEN 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3) ELSE 0.0 END) > 0.2 AS is_repetitive
      |FROM g
      |ORDER BY doc_id""".stripMargin
  }

  /** §2.5 #31d — tf-idf keyword extraction: top-10 terms per source
    * scored by tf·(N/df) — the log-free tf-idf variant: transcendental
    * idf rounds differently across engines, while a ratio of exact
    * integer counts is bit-deterministic, and any monotone idf yields
    * the identical ranking.
    *
    * Scale shape: one map-side explode feeds two partially-aggregated
    * shuffles (per-(source,term) tf and per-term df over distinct doc
    * terms); N arrives as a broadcast 1-row cross join (never a
    * collect); the per-source top-k is a WindowGroupLimit, not a
    * global sort.
    */
  def textTfidf(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val nDocs = d.agg(count(lit(1)).as("n_docs"))
    val tokens = d.select(col("doc_id"), col("source"), explode(words).as("term"))
    val tf = tokens.groupBy(col("source"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tokens.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("source")).orderBy(col("score").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score", col("tf").cast(DoubleType) * col("n_docs") / col("df"))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= 10)
      .select(col("source"), col("rk"), col("term"), col("tf"), col("df"), col("score"))
      .orderBy("source", "rk")
  }

  val textTfidfSql: String =
    """WITH tok AS (SELECT doc_id, source, unnest(string_split(text, ' ')) AS term FROM documents),
      |tf AS (SELECT source, term, count(*) AS tf FROM tok GROUP BY source, term),
      |df AS (SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY term),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |s AS (
      |  SELECT source, term, tf, df,
      |    CAST(tf AS DOUBLE) * n_docs / df AS score,
      |    row_number() OVER (PARTITION BY source ORDER BY CAST(tf AS DOUBLE) * n_docs / df DESC, term) AS rk
      |  FROM tf JOIN df USING (term) CROSS JOIN n
      |)
      |SELECT source, CAST(rk AS BIGINT) AS rk, term, tf, df, score
      |FROM s WHERE rk <= 10
      |ORDER BY source, rk""".stripMargin

  /** §2.5 #31b — corpus report: per (source, label lang) doc counts,
    * token totals and mean quality — the dataset-card rollup a
    * training-data pipeline publishes per snapshot.
    */
  def textCorpusStats(spark: SparkSession, dir: String): DataFrame = {
    val nTokens = size(words).cast(LongType)
    val nUniq = size(array_distinct(words)).cast(LongType)
    val quality = (nUniq.cast(DoubleType) / nTokens) * least(lit(1.0), nTokens.cast(DoubleType) / 50.0)
    docs(spark, dir)
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(nTokens).as("total_tokens"),
        sum(octet_length(col("text")).cast(LongType)).as("total_bytes"),
        // per-doc quality quantized to 1e-6 before summing: integer sums
        // are order-independent, so the mean hash-matches across engines
        (sum(round(quality * 1000000).cast(LongType)).cast(DoubleType) / (count(lit(1)) * 1000000.0))
          .as("mean_quality"),
      )
      .orderBy("source", "lang")
  }

  val textCorpusStatsSql: String =
    """SELECT source, lang, count(*) AS n_docs,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
      |  CAST(sum(len(text)) AS BIGINT) AS total_bytes,
      |  CAST(sum(CAST(round(((CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')))
      |      * least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0)) * 1000000) AS BIGINT)) AS DOUBLE)
      |      / (count(*) * 1000000.0) AS mean_quality
      |FROM documents
      |GROUP BY source, lang
      |ORDER BY source, lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_corpus_stats" -> (textCorpusStats _),
    "text_tokens" -> (textTokens _),
    "text_quality" -> (textQuality _),
    "text_langid" -> (textLangid _),
    "text_fingerprint" -> (textFingerprint _),
    "text_winnow_pairs" -> (textWinnowPairs _),
    "text_repetition" -> (textRepetition _),
    "text_tfidf" -> (textTfidf _),
  )

  val oracles: Map[String, String] = Map(
    "text_corpus_stats" -> textCorpusStatsSql,
    "text_tokens" -> textTokensSql,
    "text_quality" -> textQualitySql,
    "text_langid" -> textLangidSql,
    "text_fingerprint" -> textFingerprintSql,
    "text_repetition" -> textRepetitionSql,
    "text_tfidf" -> textTfidfSql,
  )
}
