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

  /** Stopword hits via the codegen'd [[graft.functions.ArrayExprs
    * .refSetHitCount]] set-membership kernel. The interpreted HOF it
    * replaces (`size(filter(split(text,' '), w -> w IN (...)))`) is
    * the per-token-lambda shape §4 measured in the 100-400× class —
    * and langid runs on EVERY doc of a crawl, so it must stay inside
    * whole-stage codegen (pinned kernel ≡ HOF in ArrayExprsSpec).
    */
  private def stopCount(lang: String): Column =
    graft.functions.ArrayExprs
      .refSetHitCount(split(col("text"), " "), stopwords.toMap.apply(lang))
      .cast(LongType)

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
      |  CAST(strlen(text) AS BIGINT) AS n_bytes
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
      |  CAST(strlen(text) AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_len,
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

  /** 26-letter transliteration alphabets for the planted multi-script
    * corpus of [[textLangid2]]: a..z mapped 1:1 into a contiguous run
    * of each script's block, so the planted text is deterministic and
    * both engines recompute it with one `translate`.
    */
  private val LatinAz = ('a' to 'z').mkString
  private val Han26 = (0x4E00 until 0x4E00 + 26).map(_.toChar).mkString
  private val Cyr26 = (0x0430 until 0x0430 + 26).map(_.toChar).mkString
  private val Arab26 = (0x0627 until 0x0627 + 26).map(_.toChar).mkString

  /** §2.5 #30b — script-aware language ID v2. The v1 stopword vote
    * ([[textLangid]]) only works for space-delimited Latin-script
    * languages: CJK/Cyrillic/Arabic text contains no Latin stopwords,
    * scores 0 everywhere, and falls through to the priority-order
    * default — the day-one misclassification of a multilingual crawl.
    * v2 runs a unicode-script code-point histogram FIRST (map-side,
    * one regexp count per script block), routes non-Latin scripts
    * directly (Han→zh, Cyrillic→ru, Arabic→ar), and only lets the
    * stopword vote decide among the Latin-script candidates
    * (en/de/es/fr).
    *
    * The synthetic corpus is all-ASCII, so the multi-script input is
    * PLANTED the lake_fsck way: docs in three disjoint doc_id classes
    * are deterministically transliterated (a..z → a contiguous 26-run
    * of the Han / Cyrillic / Arabic block via one `translate`), which
    * both engines recompute identically — the oracle hash-match
    * covers the planting, the histogram, the script routing, and the
    * Latin stopword vote in one statement.
    *
    * Scale shape: fully map-side per-doc expressions (translate + 4
    * regexp counts + fixed-size CASE), no shuffle beyond the output
    * sort; at 100 TB this is a single codegen'd scan.
    */
  def textLangid2(spark: SparkSession, dir: String): DataFrame = {
    val planted = when(col("doc_id") % 11 === 0, translate(col("text"), LatinAz, Han26))
      .when(col("doc_id") % 11 === 1, translate(col("text"), LatinAz, Cyr26))
      .when(col("doc_id") % 11 === 2, translate(col("text"), LatinAz, Arab26))
      .otherwise(col("text"))
    def scriptCount(range: String): Column =
      length(regexp_replace(col("txt"), s"[^$range]", "")).cast(LongType)
    val latinLangs = Seq("en", "de", "es", "fr")
    val base = docs(spark, dir)
      .select(col("doc_id"), planted.as("txt"))
      .select(
        col("doc_id") +: col("txt") +:
          scriptCount("a-z").as("n_latin") +:
          scriptCount("一-鿿").as("n_han") +:
          scriptCount("Ѐ-ӿ").as("n_cyrillic") +:
          scriptCount("؀-ۿ").as("n_arabic") +:
          latinLangs.map { l =>
            // codegen set-membership kernel, not an interpreted HOF —
            // see stopCount; this vote runs ×4 on every doc
            graft.functions.ArrayExprs
              .refSetHitCount(split(col("txt"), " "), stopwords.toMap.apply(l))
              .cast(LongType).as(s"score_$l")
          }: _*
      )
    val latinVote = latinLangs.zipWithIndex.foldRight(lit(latinLangs.last)) { case ((l, i), elseCol) =>
      if (i == latinLangs.size - 1) elseCol
      else {
        val geAll = latinLangs.drop(i + 1).map(o => col(s"score_$l") >= col(s"score_$o")).reduce(_ && _)
        when(geAll, lit(l)).otherwise(elseCol)
      }
    }
    base
      .withColumn(
        "script",
        when(col("n_han") >= col("n_cyrillic") && col("n_han") >= col("n_arabic") && col("n_han") > col("n_latin"), "han")
          .when(col("n_cyrillic") >= col("n_arabic") && col("n_cyrillic") > col("n_latin"), "cyrillic")
          .when(col("n_arabic") > col("n_latin"), "arabic")
          .otherwise("latin"),
      )
      .withColumn(
        "pred_lang",
        when(col("script") === "han", "zh")
          .when(col("script") === "cyrillic", "ru")
          .when(col("script") === "arabic", "ar")
          .otherwise(latinVote),
      )
      .select("doc_id", "n_latin", "n_han", "n_cyrillic", "n_arabic", "script", "pred_lang")
      .orderBy("doc_id")
  }

  val textLangid2Sql: String = {
    val scores = Seq("en", "de", "es", "fr").map { l =>
      val list = stopwords.toMap.apply(l).map(w => s"'$w'").mkString(", ")
      s"CAST(len(list_filter(string_split(txt, ' '), w -> w IN ($list))) AS BIGINT) AS score_$l"
    }.mkString(",\n  ")
    val hanR = "一-鿿"; val cyrR = "Ѐ-ӿ"; val arabR = "؀-ۿ"
    s"""WITH planted AS (
      |  SELECT doc_id,
      |    CASE
      |      WHEN doc_id % 11 = 0 THEN translate(text, '$LatinAz', '$Han26')
      |      WHEN doc_id % 11 = 1 THEN translate(text, '$LatinAz', '$Cyr26')
      |      WHEN doc_id % 11 = 2 THEN translate(text, '$LatinAz', '$Arab26')
      |      ELSE text
      |    END AS txt
      |  FROM documents
      |), hist AS (
      |  SELECT doc_id, txt,
      |    CAST(length(regexp_replace(txt, '[^a-z]', '', 'g')) AS BIGINT) AS n_latin,
      |    CAST(length(regexp_replace(txt, '[^$hanR]', '', 'g')) AS BIGINT) AS n_han,
      |    CAST(length(regexp_replace(txt, '[^$cyrR]', '', 'g')) AS BIGINT) AS n_cyrillic,
      |    CAST(length(regexp_replace(txt, '[^$arabR]', '', 'g')) AS BIGINT) AS n_arabic,
      |    $scores
      |  FROM planted
      |), routed AS (
      |  SELECT *,
      |    CASE
      |      WHEN n_han >= n_cyrillic AND n_han >= n_arabic AND n_han > n_latin THEN 'han'
      |      WHEN n_cyrillic >= n_arabic AND n_cyrillic > n_latin THEN 'cyrillic'
      |      WHEN n_arabic > n_latin THEN 'arabic'
      |      ELSE 'latin'
      |    END AS script
      |  FROM hist
      |)
      |SELECT doc_id, n_latin, n_han, n_cyrillic, n_arabic, script,
      |  CASE
      |    WHEN script = 'han' THEN 'zh'
      |    WHEN script = 'cyrillic' THEN 'ru'
      |    WHEN script = 'arabic' THEN 'ar'
      |    WHEN score_en >= score_de AND score_en >= score_es AND score_en >= score_fr THEN 'en'
      |    WHEN score_de >= score_es AND score_de >= score_fr THEN 'de'
      |    WHEN score_es >= score_fr THEN 'es'
      |    ELSE 'fr'
      |  END AS pred_lang
      |FROM routed
      |ORDER BY doc_id""".stripMargin
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
      |  CAST(strlen(text) AS BIGINT) AS n_bytes
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
    val out = exRare.select(col("doc_id").as("doc_a"), col("f"))
      .join(exRare.select(col("doc_id").as("doc_b"), col("f")), Seq("f"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("shared_fp"))
      .filter(col("shared_fp") >= 5)
    graft.GraftSession.materialized(out, Seq("doc_a", "doc_b"), exRare)
  }

  /** n-word grams of `words` as a (non-distinct) array; docs shorter
    * than n yield a single whole-text gram. Codegen kernel, see
    * [[graft.functions.WordNgrams]].
    */
  private def ngrams(n: Int): Column =
    graft.functions.ArrayExprs.wordNgrams(words, n)

  /** §2.5 #31j — collocation mining: corpus-level top-100 adjacent
    * bigrams by PMI LIFT, the unsupervised multiword-expression
    * detector ("new york", "machine learning") a corpus pipeline runs
    * before tokenizer training so collocations become single units.
    * The score is the LOG-FREE rational PMI (the bm25-idf trick —
    * log is transcendental and rounds differently across engines,
    * while the lift ratio is monotone-equivalent):
    * lift = P(w1w2) / (P(w1)·P(w2)) = c12·N² / (Nb·c1·c2), evaluated
    * in IEEE double with one FIXED operation order (left-to-right
    * alternating ·N /c — keeps magnitudes near 1 so nothing overflows
    * at ANY corpus size, and identical expression text in both
    * engines makes the floor-ppm hash-stable), min support c12 ≥ 5,
    * total order (lift DESC, w1, w2).
    *
    * Scale shape: bigram assembly is the codegen [[graft.functions
    * .WordNgrams]] kernel (n=2) + map-side explode — no per-token
    * interpreted lambda on the every-doc path; bigram and unigram
    * counts shuffle on Zipf-bounded vocab keys with map-side partial
    * aggs; the two totals ride a 1-row broadcast; the top-100 is a
    * TakeOrdered under the total order, never a global sort.
    */
  def textCollocations(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val multi = d.filter(size(words) >= 2)
    val big = multi
      .select(explode(ngrams(2)).as("gram"))
      .select(
        substring_index(col("gram"), " ", 1).as("w1"),
        substring_index(col("gram"), " ", -1).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= 5)
    val uni = d.select(explode(words).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val totals = d.agg(
      sum(size(words)).cast(LongType).as("n_tokens"),
      sum(greatest(size(words) - 1, lit(0))).cast(LongType).as("n_bigrams"))
    big
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .join(broadcast(totals), lit(true))
      .withColumn("lift_ppm",
        expr("CAST(floor(CAST(c12 AS DOUBLE) * n_tokens / c1 * n_tokens / c2 / n_bigrams * 1000000.0 + 0.5) AS BIGINT)"))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"), col("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))
      .limit(100)
  }

  val textCollocationsSql: String =
    """WITH ws AS (
      |  SELECT string_split(text, ' ') AS w FROM documents
      |), big AS (
      |  SELECT w[i] AS w1, w[i + 1] AS w2, count(*) AS c12
      |  FROM (SELECT w, unnest(range(1, len(w))) AS i FROM ws WHERE len(w) >= 2)
      |  GROUP BY 1, 2 HAVING count(*) >= 5
      |), uni AS (
      |  SELECT unnest(w) AS word FROM ws
      |), uc AS (
      |  SELECT word, count(*) AS c FROM uni GROUP BY 1
      |), tot AS (
      |  SELECT CAST(sum(len(w)) AS BIGINT) AS n_tokens,
      |    CAST(sum(greatest(len(w) - 1, 0)) AS BIGINT) AS n_bigrams
      |  FROM ws
      |)
      |SELECT w1, w2, c12, u1.c AS c1, u2.c AS c2,
      |  CAST(floor(CAST(c12 AS DOUBLE) * n_tokens / u1.c * n_tokens / u2.c / n_bigrams * 1000000.0 + 0.5) AS BIGINT) AS lift_ppm
      |FROM big JOIN uc u1 ON big.w1 = u1.word JOIN uc u2 ON big.w2 = u2.word, tot
      |ORDER BY lift_ppm DESC, w1, w2
      |LIMIT 100""".stripMargin

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
      |  CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
      |  CAST(sum(CAST(round(((CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')))
      |      * least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0)) * 1000000) AS BIGINT)) AS DOUBLE)
      |      / (count(*) * 1000000.0) AS mean_quality
      |FROM documents
      |GROUP BY source, lang
      |ORDER BY source, lang""".stripMargin

  // ---------------------------------------------------------------- PII

  /** Portable PII patterns (identical semantics in Java regex and
    * DuckDB's RE2): email, NANP-style phone, dotted-quad IPv4. Kept to
    * `[0-9]`/explicit classes — no `\d`/lookaround, which differ across
    * engines.
    */
  private[graft] val PiiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PiiPhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  private[graft] val PiiIpv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** §2.5 #33g — PII scrub: per-row match counts for each pattern plus
    * the redacted text. Pure map-side regex (codegen'd `RegExpReplace`/
    * `RegExpCount`) — no shuffle at any scale; the order (email → ipv4
    * → phone) is fixed so replacement tokens can't create new matches.
    */
  def piiScrub(df: DataFrame, text: Column): DataFrame =
    df.withColumn("n_emails", regexp_count(text, lit(PiiEmailRe)).cast(LongType))
      .withColumn("n_ipv4", regexp_count(text, lit(PiiIpv4Re)).cast(LongType))
      .withColumn("n_phones", regexp_count(text, lit(PiiPhoneRe)).cast(LongType))
      .withColumn(
        "clean",
        regexp_replace(
          regexp_replace(
            regexp_replace(text, PiiEmailRe, "<EMAIL>"),
            PiiIpv4Re,
            "<IP>",
          ),
          PiiPhoneRe,
          "<PHONE>",
        ),
      )

  /** The synthetic corpus carries no natural PII, so the named query
    * appends a DETERMINISTIC PII suffix derived from doc_id (whether
    * each kind appears varies with doc_id, so counts aren't constant)
    * — the DuckDB oracle mirrors the same construction, making the
    * whole detect+redact path hash-checked end to end. The generic
    * entry point is [[piiScrub]]; PiiSpec exercises it on realistic
    * strings.
    */
  def textPii(spark: SparkSession, dir: String): DataFrame = {
    val piiText = concat(
      col("text"),
      when(
        pmod(col("doc_id"), lit(3)) < 2,
        concat(lit(" contact user"), col("doc_id").cast(StringType), lit("@mail.example.com")),
      ).otherwise(lit("")),
      when(
        pmod(col("doc_id"), lit(2)) === 0,
        concat(
          lit(" call 555-"),
          lpad(pmod(col("doc_id") * 7, lit(1000)).cast(StringType), 3, "0"),
          lit("-"),
          lpad(pmod(col("doc_id") * 13, lit(10000)).cast(StringType), 4, "0"),
        ),
      ).otherwise(lit("")),
      when(
        pmod(col("doc_id"), lit(5)) < 3,
        concat(
          lit(" from 10."),
          pmod(col("doc_id"), lit(256)).cast(StringType),
          lit("."),
          pmod(col("doc_id") * 3, lit(256)).cast(StringType),
          lit("."),
          pmod(col("doc_id") * 5, lit(256)).cast(StringType),
        ),
      ).otherwise(lit("")),
    )
    piiScrub(docs(spark, dir).select(col("doc_id"), piiText.as("pii_text")), col("pii_text"))
      .select(
        col("doc_id"),
        col("n_emails"),
        col("n_phones"),
        col("n_ipv4"),
        (col("n_emails") + col("n_phones") + col("n_ipv4") > 0).as("has_pii"),
        md5(col("clean")).as("clean_md5"),
      )
      .orderBy("doc_id")
  }

  val textPiiSql: String =
    """WITH p AS (
      |  SELECT doc_id,
      |    text
      |    || CASE WHEN doc_id % 3 < 2 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com' ELSE '' END
      |    || CASE WHEN doc_id % 2 = 0 THEN ' call 555-' || lpad(CAST(doc_id * 7 % 1000 AS VARCHAR), 3, '0') || '-' || lpad(CAST(doc_id * 13 % 10000 AS VARCHAR), 4, '0') ELSE '' END
      |    || CASE WHEN doc_id % 5 < 3 THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id * 3 % 256 AS VARCHAR) || '.' || CAST(doc_id * 5 % 256 AS VARCHAR) ELSE '' END
      |    AS pii_text
      |  FROM documents
      |)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(pii_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
      |  CAST(len(regexp_extract_all(pii_text, '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) AS BIGINT) AS n_phones,
      |  CAST(len(regexp_extract_all(pii_text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS BIGINT) AS n_ipv4,
      |  len(regexp_extract_all(pii_text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
      |    + len(regexp_extract_all(pii_text, '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b'))
      |    + len(regexp_extract_all(pii_text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) > 0 AS has_pii,
      |  md5(regexp_replace(regexp_replace(regexp_replace(pii_text,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
      |    '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g')) AS clean_md5
      |FROM p
      |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- vocab

  /** §2.5 #31e — corpus vocabulary report: top-100 terms by total
    * occurrences (term asc tiebreak) with document frequency — the
    * tokenizer-training / vocab-audit rollup.
    *
    * Scale shape: explode feeds a partially-aggregated groupBy(term)
    * (map-side combine) and a two-phase distinct count; the top-100 is
    * TakeOrderedAndProject (no global sort materialization), and the
    * rank window runs on ≤100 rows after the limit — a deliberate
    * limit-then-rank so the single-partition window is bounded at any
    * corpus size.
    */
  def textVocab(spark: SparkSession, dir: String): DataFrame = {
    val tokens = docs(spark, dir).select(col("doc_id"), explode(words).as("term"))
    val agg = tokens
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
    val top = agg.orderBy(col("tf").desc, col("term")).limit(100)
    top
      .withColumn("rk", row_number().over(Window.orderBy(col("tf").desc, col("term"))).cast(LongType))
      .select(col("rk"), col("term"), col("tf"), col("df"))
      .orderBy("rk")
  }

  val textVocabSql: String =
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |v AS (
      |  SELECT term, count(*) AS tf, count(DISTINCT doc_id) AS df FROM tok GROUP BY term
      |)
      |SELECT CAST(row_number() OVER (ORDER BY tf DESC, term) AS BIGINT) AS rk, term, tf, df
      |FROM v
      |ORDER BY tf DESC, term
      |LIMIT 100""".stripMargin

  /** Documents per growth-curve checkpoint in [[textVocabGrowth]]. */
  val VocabGrowthBucket = 100L

  /** §2.5 #33w — vocabulary growth curve (the Heaps'-law audit): how
    * the distinct-term count grows as the corpus grows, sampled at
    * every [[VocabGrowthBucket]] documents in doc_id order. The curve
    * is what you read before sizing a tokenizer vocabulary or
    * estimating how much MORE data buys new types: sublinear growth =
    * healthy natural text; near-linear growth = ids/noise/boilerplate
    * leaking through the filters (each checkpoint also carries
    * new_terms, the marginal vocabulary the bucket contributed).
    *
    * Scale shape: a term's contribution to the curve is fully
    * determined by its FIRST document (min(doc_id) — one map-side
    * combined groupBy on term), so the quadratic-looking "vocab at
    * every prefix" needs no per-prefix rescan: bucket the first-docs,
    * then one running sum over the ≤ n_docs/bucket checkpoint rows —
    * a window over the tiny rollup, never the corpus.
    */
  def textVocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    val tok = docs(spark, dir).select(col("doc_id"), explode(words).as("term"))
    val cp = (expr(s"doc_id DIV $VocabGrowthBucket") + 1) * VocabGrowthBucket
    val newTerms = tok.groupBy(col("term")).agg(min(col("doc_id")).as("fd"))
      .groupBy(((expr(s"fd DIV $VocabGrowthBucket")) + 1) * VocabGrowthBucket)
      .agg(count(lit(1)).as("new_terms"))
      .toDF("checkpoint", "new_terms")
    val tokens = tok.groupBy(cp.as("checkpoint")).agg(count(lit(1)).as("bucket_tokens"))
    val w = Window.orderBy(col("checkpoint"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tokens.join(newTerms, Seq("checkpoint"), "left")
      .select(col("checkpoint"),
        sum(coalesce(col("new_terms"), lit(0L))).over(w).as("vocab_size"),
        coalesce(col("new_terms"), lit(0L)).as("new_terms"),
        sum(col("bucket_tokens")).over(w).as("n_tokens"))
      .orderBy("checkpoint")
  }

  val textVocabGrowthSql: String =
    s"""WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
      |), fd AS (
      |  SELECT term, min(doc_id) AS fd FROM tok GROUP BY term
      |), nt AS (
      |  SELECT (fd // $VocabGrowthBucket + 1) * $VocabGrowthBucket AS checkpoint,
      |    count(*) AS new_terms
      |  FROM fd GROUP BY 1
      |), bt AS (
      |  SELECT (doc_id // $VocabGrowthBucket + 1) * $VocabGrowthBucket AS checkpoint,
      |    count(*) AS bucket_tokens
      |  FROM tok GROUP BY 1
      |)
      |SELECT bt.checkpoint,
      |  CAST(sum(coalesce(nt.new_terms, 0)) OVER (ORDER BY bt.checkpoint) AS BIGINT) AS vocab_size,
      |  CAST(coalesce(nt.new_terms, 0) AS BIGINT) AS new_terms,
      |  CAST(sum(bt.bucket_tokens) OVER (ORDER BY bt.checkpoint) AS BIGINT) AS n_tokens
      |FROM bt LEFT JOIN nt ON nt.checkpoint = bt.checkpoint
      |ORDER BY bt.checkpoint""".stripMargin

  // ---------------------------------------------------------------- BM25

  private val Bm25K1 = 1.2
  private val Bm25B = 0.75

  /** §2.5 #31f — BM25 retrieval for a literal query over the corpus.
    *
    * The idf is the LOG-FREE rational form (N − df + 0.5)/(df + 0.5):
    * log() is transcendental and rounds differently across engines
    * (SURVEY §6), while this ratio of exact integers is
    * bit-deterministic — and since log is monotone, the ranking is the
    * classic BM25 ranking.
    *
    * Scale shape: query terms are literals, so per-doc term frequencies
    * are MAP-SIDE `size(filter(words, = term))` — no explode, no
    * per-token shuffle; df/N/avgdl come from one single-row aggregate
    * broadcast back; scoring is map-side and the top-k is
    * TakeOrderedAndProject. A full-corpus BM25 pass with zero wide
    * shuffles.
    */
  def bm25(d: DataFrame, textCol: Column, terms: Seq[String], k: Int): DataFrame = {
    val ws = split(textCol, " ")
    // per-term occurrence count through the codegen set-membership
    // kernel (singleton set) — same count as the interpreted
    // size(filter(ws, = term)) HOF it replaces, pinned in ArrayExprsSpec
    def tfCol(t: String): Column =
      graft.functions.ArrayExprs.refSetHitCount(ws, Seq(t)).cast(LongType)
    val base = d
      .select(
        col("doc_id") +: size(ws).cast(LongType).as("dl") +:
          terms.map(t => tfCol(t).as(s"tf_$t")): _*
      )
    val aggCols = count(lit(1)).as("n_docs") +: sum(col("dl")).as("sum_dl") +:
      terms.map(t => sum((col(s"tf_$t") > 0).cast(LongType)).as(s"df_$t"))
    val stats = base.agg(aggCols.head, aggCols.tail: _*)
    val avgdl = col("sum_dl").cast(DoubleType) / col("n_docs")
    def contrib(t: String): Column = {
      val tf = col(s"tf_$t").cast(DoubleType)
      val idf = (col("n_docs").cast(DoubleType) - col(s"df_$t") + 0.5) / (col(s"df_$t") + 0.5)
      // k1+1 appears as the literal 2.2 (not Bm25K1 + 1.0 computed in
      // Scala): a compile-time double add can land 1 ulp off the parsed
      // SQL literal, and the oracle comparison is bit-exact
      idf * (tf * lit(2.2)) / (tf + lit(Bm25K1) * (lit(1.0) - Bm25B + lit(Bm25B) * (col("dl").cast(DoubleType) / avgdl)))
    }
    base
      .crossJoin(broadcast(stats))
      .withColumn("score", terms.map(contrib).reduce(_ + _))
      .filter(terms.map(t => col(s"tf_$t")).reduce(_ + _) > 0)
      .select(col("doc_id") +: terms.map(t => col(s"tf_$t")) :+ col("score"): _*)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** named query: BM25 top-20 for "spark stream join". */
  def textBm25(spark: SparkSession, dir: String): DataFrame =
    bm25(docs(spark, dir), col("text"), Seq("spark", "stream", "join"), 20)

  val textBm25Sql: String = {
    val terms = Seq("spark", "stream", "join")
    val tfs = terms
      .map(t => s"CAST(len(list_filter(string_split(text, ' '), w -> w = '$t')) AS BIGINT) AS tf_$t")
      .mkString(",\n  ")
    val dfs = terms.map(t => s"sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t").mkString(", ")
    val contribs = terms.map { t =>
      s"""((CAST(n_docs AS DOUBLE) - df_$t + 0.5) / (df_$t + 0.5))
         |    * (CAST(tf_$t AS DOUBLE) * 2.2)
         |    / (CAST(tf_$t AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs))))""".stripMargin
    }.mkString("\n  + ")
    s"""WITH base AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
      |  $tfs
      |  FROM documents
      |), stats AS (
      |  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl, $dfs FROM base
      |)
      |SELECT doc_id, tf_spark, tf_stream, tf_join,
      |  $contribs AS score
      |FROM base CROSS JOIN stats
      |WHERE tf_spark + tf_stream + tf_join > 0
      |ORDER BY score DESC, doc_id
      |LIMIT 20""".stripMargin
  }

  // ---------------------------------------------------------------- rrf

  /** §2.5 #33v — hybrid retrieval by reciprocal-rank fusion
    * (Cormack'09): the BM25 lexical ranking and an exact-cosine
    * embedding ranking of the same corpus, fused as
    * Σ ⌊10⁹/(60+rank)⌋ over the rankings a doc appears in (rank
    * cutoff 100 each, missing rank contributes 0) — the standard
    * retrieval pattern for curating supervised/eval data where
    * neither lexical nor semantic recall alone suffices. The fusion
    * score is integer micro-units of the canonical 1/(60+r), so the
    * fused order is bit-exact cross-engine; ties break on doc_id.
    *
    * Scale: both input rankings are top-k outputs of operators that
    * already scale (bm25: map-side score + bounded top-k; cosine:
    * broadcast query + map-side dot). The fusion itself touches
    * ≤2·cutoff rows — the global windows here run on that bounded
    * set, never on the corpus.
    */
  def textRrf(spark: SparkSession, dir: String): DataFrame = {
    val kCut = 100
    val text = bm25(docs(spark, dir), col("text"), Seq("spark", "stream", "join"), kCut)
      .select(col("doc_id"), col("score"))
      .withColumn("r_text", row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).cast(LongType))
      .drop("score")
    val e = table(spark, dir, "embeddings").select(col("vec_id").as("id"), col("embedding"))
    val vec = VectorOps.annBruteforce(e, e.filter(col("id") === 0), kCut)
      .select(col("neighbor_id").as("doc_id"), col("rank").as("r_vec"))
    text
      .join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("r_text"), col("r_vec"),
        (coalesce(expr("1000000000L div (60 + r_text)"), lit(0L)) +
          coalesce(expr("1000000000L div (60 + r_vec)"), lit(0L))).as("rrf"))
      .withColumn("rk", row_number().over(Window.orderBy(col("rrf").desc, col("doc_id"))).cast(LongType))
      .filter(col("rk") <= 20)
      .orderBy("rk")
  }

  val textRrfSql: String = {
    val terms = Seq("spark", "stream", "join")
    val tfs = terms
      .map(t => s"CAST(len(list_filter(string_split(text, ' '), w -> w = '$t')) AS BIGINT) AS tf_$t")
      .mkString(",\n  ")
    val dfs = terms.map(t => s"sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS df_$t").mkString(", ")
    val contribs = terms.map { t =>
      s"""((CAST(n_docs AS DOUBLE) - df_$t + 0.5) / (df_$t + 0.5))
         |    * (CAST(tf_$t AS DOUBLE) * 2.2)
         |    / (CAST(tf_$t AS DOUBLE) + 1.2 * (1.0 - 0.75 + 0.75 * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs))))""".stripMargin
    }.mkString("\n  + ")
    s"""WITH base AS (
      |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
      |  $tfs
      |  FROM documents
      |), stats AS (
      |  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl, $dfs FROM base
      |), t AS (
      |  SELECT doc_id, r_text FROM (
      |    SELECT doc_id,
      |      row_number() OVER (ORDER BY $contribs DESC, doc_id) AS r_text
      |    FROM base CROSS JOIN stats
      |    WHERE tf_spark + tf_stream + tf_join > 0
      |  ) WHERE r_text <= 100
      |), q AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS qv
      |  FROM embeddings
      |), v AS (
      |  SELECT doc_id, r_vec FROM (
      |    SELECT b.vec_id AS doc_id,
      |      row_number() OVER (ORDER BY
      |        CAST(list_sum(list_transform(range(1, 65), i -> a.qv[i] * b.qv[i])) AS DOUBLE)
      |          / (sqrt(CAST(list_sum(list_transform(range(1, 65), i -> a.qv[i] * a.qv[i])) AS DOUBLE))
      |             * sqrt(CAST(list_sum(list_transform(range(1, 65), i -> b.qv[i] * b.qv[i])) AS DOUBLE))) DESC,
      |        b.vec_id) AS r_vec
      |    FROM q a JOIN q b ON a.vec_id = 0 AND b.vec_id <> 0
      |  ) WHERE r_vec <= 100
      |), f AS (
      |  SELECT coalesce(t.doc_id, v.doc_id) AS doc_id,
      |    CAST(t.r_text AS BIGINT) AS r_text, CAST(v.r_vec AS BIGINT) AS r_vec,
      |    CAST(coalesce(1000000000 // (60 + t.r_text), 0)
      |       + coalesce(1000000000 // (60 + v.r_vec), 0) AS BIGINT) AS rrf
      |  FROM t FULL JOIN v ON t.doc_id = v.doc_id
      |)
      |SELECT doc_id, r_text, r_vec, rrf, rk FROM (
      |  SELECT *, CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS rk FROM f
      |) WHERE rk <= 20
      |ORDER BY rk""".stripMargin
  }

  // ---------------------------------------------------------------- compression

  /** §2.5 #31g — compression-ratio quality signal: deflate size over
    * raw size. Low ratio = repetitive/boilerplate text, ratio near the
    * corpus ceiling = high-entropy content; both tails are the classic
    * drop candidates in large-corpus quality filtering. Map-side only
    * (a codegen'd [[graft.functions.DeflateLen]] expression, zlib state
    * reused per task thread) — no shuffle at any scale. No deflate in
    * DuckDB → rows-only + ScalaTest determinism/monotonicity.
    */
  def textCompress(spark: SparkSession, dir: String): DataFrame = {
    val raw = octet_length(col("text")).cast(LongType)
    docs(spark, dir)
      .select(
        col("doc_id"),
        raw.as("n_bytes"),
        graft.functions.Compress.deflateLen(col("text").cast(BinaryType)).cast(LongType).as("deflate_bytes"),
      )
      .withColumn("ratio", col("deflate_bytes").cast(DoubleType) / col("n_bytes"))
      .withColumn("is_repetitive", col("ratio") < 0.3)
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- normalize

  /** cleaning battery over any string column: unicode NFC (codegen
    * [[graft.functions.NfcNormalize]] — composed-vs-decomposed
    * representations hash differently and silently defeat exact dedup,
    * so canonicalize BEFORE any content hash), control/format-char
    * strip, whitespace collapse, trim. Pure map-side at any scale.
    */
  def normalizeText(t: Column): Column =
    trim(regexp_replace(
      regexp_replace(graft.functions.TextNorm.nfcNormalize(t), "[\\p{Cc}\\p{Cf}]", " "),
      "\\s+", " "))

  /** §2.5 #33l — named query: canonical clean form of every doc with a
    * changed flag and byte sizes (the C4/CCNet pre-hash cleaning step).
    */
  def textNormalize(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        col("doc_id"),
        normalizeText(col("text")).as("clean"),
        (normalizeText(col("text")) =!= col("text")).as("changed"),
        octet_length(col("text")).cast(LongType).as("n_bytes_raw"),
        octet_length(normalizeText(col("text"))).cast(LongType).as("n_bytes_clean"),
      )
      .orderBy("doc_id")

  val textNormalizeSql: String =
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(nfc_normalize(text), '[\p{Cc}\p{Cf}]', ' ', 'g'), '\s+', ' ', 'g')) AS clean,
      |  trim(regexp_replace(regexp_replace(nfc_normalize(text), '[\p{Cc}\p{Cf}]', ' ', 'g'), '\s+', ' ', 'g')) != text AS changed,
      |  CAST(strlen(text) AS BIGINT) AS n_bytes_raw,
      |  CAST(strlen(trim(regexp_replace(regexp_replace(nfc_normalize(text), '[\p{Cc}\p{Cf}]', ' ', 'g'), '\s+', ' ', 'g'))) AS BIGINT) AS n_bytes_clean
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** §2.5 #33m — sliding-window document chunking: fixed token windows
    * (64 tokens, stride 48 → 16-token overlap), the context-length
    * split a training pipeline runs before packing. Pure map-side
    * (sequence + explode + slice — no shuffle, no UDF): a 100 TB
    * corpus chunks at scan throughput, and the ~1.33× row growth is
    * the output's intrinsic size, not an intermediate blow-up.
    */
  def textChunks(spark: SparkSession, dir: String): DataFrame = {
    val windowTokens = 64
    val stride = 48
    docs(spark, dir)
      .select(col("doc_id"), words.as("ws"))
      .select(
        col("doc_id"),
        col("ws"),
        posexplode(sequence(lit(0), greatest(size(col("ws")) - 1, lit(0)), lit(stride))).as(Seq("chunk_idx", "start")),
      )
      .select(
        col("doc_id"),
        col("chunk_idx").cast(LongType).as("chunk_idx"),
        size(slice(col("ws"), col("start") + 1, lit(windowTokens))).cast(LongType).as("n_tokens"),
        concat_ws(" ", slice(col("ws"), col("start") + 1, lit(windowTokens))).as("chunk_text"),
      )
      .orderBy("doc_id", "chunk_idx")
  }

  val textChunksSql: String =
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |), starts AS (
      |  SELECT doc_id, ws, unnest(range(0, greatest(len(ws) - 1, 0) + 1, 48)) AS start
      |  FROM w
      |)
      |SELECT doc_id,
      |  CAST(start // 48 AS BIGINT) AS chunk_idx,
      |  CAST(len(list_slice(ws, start + 1, start + 64)) AS BIGINT) AS n_tokens,
      |  array_to_string(list_slice(ws, start + 1, start + 64), ' ') AS chunk_text
      |FROM starts
      |ORDER BY doc_id, chunk_idx""".stripMargin

  /** §2.5 #33o — unigram-LM surprisal scoring: mean per-token
    * −ln p(term) under the corpus's own unigram MLE — the classic
    * cheap fluency/rarity signal (high mean = rare vocabulary,
    * low = stopword soup), and the degenerate (n=1) case of the
    * perplexity filters LLM pipelines run with real LMs.
    *
    * Cross-engine exactness: a per-doc SUM of raw double logs would
    * depend on shuffle order. Instead each TERM's surprisal is
    * quantized once to integer micro-nats (floor(−ln p · 10⁶) — one
    * ln per distinct term, p a ratio of exact counts), docs sum those
    * int64s (order-free), and the mean divides two exact integers at
    * the end. Scale shape: tf is one map-side-combined shuffle, the
    * 1-row corpus total is a bounded broadcast (the text_tfidf
    * precedent), and the per-term table joins back to the token
    * relation on the shuffle key.
    */
  def textSurprisal(spark: SparkSession, dir: String): DataFrame = {
    val tok = docs(spark, dir).select(col("doc_id"), explode(words).as("term"))
    val tf = tok.groupBy(col("term")).agg(count(lit(1)).as("tf"))
    val total = tf.agg(sum(col("tf")).as("total"))
    val srp = tf.join(broadcast(total), lit(true))
      .select(
        col("term"),
        floor(-log(col("tf").cast(DoubleType) / col("total").cast(DoubleType)) * 1000000.0)
          .cast(LongType).as("srp_micro"),
      )
    tok.join(srp, "term")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("srp_micro")).as("srp_micro_sum"),
      )
      .withColumn(
        "mean_surprisal",
        col("srp_micro_sum").cast(DoubleType) / col("n_tokens").cast(DoubleType) / 1000000.0,
      )
      .orderBy("doc_id")
  }

  val textSurprisalSql: String =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
      |), tf AS (
      |  SELECT term, count(*) AS tf FROM tok GROUP BY term
      |), tot AS (
      |  SELECT CAST(sum(tf) AS BIGINT) AS total FROM tf
      |), s AS (
      |  SELECT term,
      |    CAST(floor(-ln(CAST(tf AS DOUBLE) / CAST(total AS DOUBLE)) * 1000000.0) AS BIGINT) AS srp_micro
      |  FROM tf, tot
      |)
      |SELECT doc_id, count(*) AS n_tokens,
      |  CAST(sum(srp_micro) AS BIGINT) AS srp_micro_sum,
      |  CAST(sum(srp_micro) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0 AS mean_surprisal
      |FROM tok JOIN s USING (term)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** §2.5 #33p — bigram-LM surprisal: mean −ln p(w_i | w_{i−1}) over
    * each document's observed bigrams (MLE conditional — every scored
    * bigram was observed, so no smoothing mass is needed). Bigrams are
    * built MAP-SIDE by zipping the token array with its own tail
    * (`arrays_zip(slice, slice)`) — no positional self-join, no
    * per-doc shuffle; the only wide ops are the Zipf-bounded bigram
    * count (its context count is a second partial agg of the same
    * relation) and the score join-back keyed on the bigram pair.
    * Per-bigram scores are quantized to integer micro-nats (the
    * [[textSurprisal]] trick) so doc sums are order-free and
    * hash-exact cross-engine.
    */
  def textBigramSurprisal(spark: SparkSession, dir: String): DataFrame = {
    val ws = split(col("text"), " ")
    val n = size(ws)
    val big = docs(spark, dir)
      .select(col("doc_id"),
        explode(arrays_zip(slice(ws, lit(1), n - 1).as("w1"), slice(ws, lit(2), n - 1).as("w2"))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c2 = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val c1 = big.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    val srp = c2.join(c1, "w1")
      .select(
        col("w1"), col("w2"),
        floor(-log(col("c2").cast(DoubleType) / col("c1").cast(DoubleType)) * 1000000.0)
          .cast(LongType).as("srp_micro"),
      )
    big.join(srp, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("srp_micro")).as("srp_micro_sum"),
      )
      .withColumn(
        "mean_surprisal",
        col("srp_micro_sum").cast(DoubleType) / col("n_bigrams").cast(DoubleType) / 1000000.0,
      )
      .orderBy("doc_id")
  }

  val textBigramSurprisalSql: String =
    """WITH ws AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |), big AS (
      |  SELECT doc_id,
      |    unnest(w[1:len(w)-1]) AS w1,
      |    unnest(w[2:len(w)]) AS w2
      |  FROM ws
      |), c2 AS (
      |  SELECT w1, w2, count(*) AS c2 FROM big GROUP BY w1, w2
      |), c1 AS (
      |  SELECT w1, count(*) AS c1 FROM big GROUP BY w1
      |), s AS (
      |  SELECT w1, w2,
      |    CAST(floor(-ln(CAST(c2 AS DOUBLE) / CAST(c1 AS DOUBLE)) * 1000000.0) AS BIGINT) AS srp_micro
      |  FROM c2 JOIN c1 USING (w1)
      |)
      |SELECT doc_id, count(*) AS n_bigrams,
      |  CAST(sum(srp_micro) AS BIGINT) AS srp_micro_sum,
      |  CAST(sum(srp_micro) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0 AS mean_surprisal
      |FROM big JOIN s USING (w1, w2)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** §2.5 #33q — PMI collocation extraction: the top-50 bigram
    * collocations by pointwise mutual information, PMI =
    * ln(c_xy·N / (c_x·c_y)) over corpus bigram counts with min
    * support 5. All four counts are exact int64 (products stay far
    * under 2⁶³ and convert to double losslessly), so the PMI is ONE
    * division + ONE ln, quantized to integer micro-nats exactly like
    * [[textSurprisal]] — the cross-engine-exact log idiom. The
    * bigram build is the map-side zip-with-tail from
    * [[textBigramSurprisal]]; the corpus total is a 1-row broadcast.
    * Top-50 is a TakeOrdered, not a full sort.
    */
  def textPmi(spark: SparkSession, dir: String): DataFrame = {
    val ws = split(col("text"), " ")
    val n = size(ws)
    val big = docs(spark, dir)
      .select(explode(arrays_zip(slice(ws, lit(1), n - 1).as("w1"), slice(ws, lit(2), n - 1).as("w2"))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val c2 = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val cl = big.groupBy(col("w1")).agg(count(lit(1)).as("cl"))
    val cr = big.groupBy(col("w2")).agg(count(lit(1)).as("cr"))
    val nRow = big.agg(count(lit(1)).as("n_total"))
    c2.filter(col("c2") >= 5)
      .join(cl, "w1")
      .join(cr, "w2")
      .join(broadcast(nRow), lit(true))
      .select(
        col("w1"), col("w2"), col("c2"),
        floor(log((col("c2") * col("n_total")).cast(DoubleType) / (col("cl") * col("cr")).cast(DoubleType)) * 1000000.0)
          .cast(LongType).as("pmi_micro"),
      )
      .orderBy(col("pmi_micro").desc, col("w1"), col("w2"))
      .limit(50)
  }

  val textPmiSql: String =
    """WITH ws AS (
      |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
      |), big AS (
      |  SELECT unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2 FROM ws
      |), c2 AS (
      |  SELECT w1, w2, count(*) AS c2 FROM big GROUP BY w1, w2
      |), cl AS (
      |  SELECT w1, count(*) AS cl FROM big GROUP BY w1
      |), cr AS (
      |  SELECT w2, count(*) AS cr FROM big GROUP BY w2
      |), nn AS (
      |  SELECT count(*) AS n_total FROM big
      |)
      |SELECT w1, w2, c2,
      |  CAST(floor(ln(CAST(c2 * n_total AS DOUBLE) / CAST(cl * cr AS DOUBLE)) * 1000000.0) AS BIGINT) AS pmi_micro
      |FROM c2 JOIN cl USING (w1) JOIN cr USING (w2) CROSS JOIN nn
      |WHERE c2 >= 5
      |ORDER BY pmi_micro DESC, w1, w2
      |LIMIT 50""".stripMargin

  /** §2.5 #33r — per-document word-distribution Shannon entropy, the
    * lexical-diversity quality signal (low entropy = repetitive /
    * boilerplate text). H = (1/n)·Σ c_i·ln(n/c_i) over the doc's term
    * counts. Each term's ln(n/c) is quantized to integer micro-nats
    * BEFORE the per-doc sum, so the sum is int64 and order-free (the
    * [[textSurprisal]] idiom); the final floor(sum/n) is one exact
    * IEEE division (sum ≤ n·ln(n)·10⁶ ≪ 2⁵³). Two shuffles, both
    * doc-keyed: (doc,term) counts, then the per-doc rollup — term
    * counting combines map-side, so the shuffle is distinct terms per
    * doc, not tokens.
    */
  def textEntropy(spark: SparkSession, dir: String): DataFrame = {
    val toks = docs(spark, dir)
      .select(col("doc_id"), explode(words).as("w"))
    val counts = toks.groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
    // per-doc total via a doc-partitioned window (not a separate agg +
    // self-join): the window's doc_id exchange is the SAME partitioning
    // the final groupBy needs, so it plans one exchange instead of
    // three (measured in the plan audit)
    val wDoc = Window.partitionBy(col("doc_id"))
    counts
      .withColumn("n", sum(col("c")).over(wDoc))
      .groupBy(col("doc_id"))
      .agg(
        first(col("n")).as("n_words"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") * floor(log(col("n").cast(DoubleType) / col("c").cast(DoubleType)) * 1000000.0).cast(LongType))
          .as("sum_micro"),
      )
      .select(
        col("doc_id"), col("n_words"), col("n_distinct"),
        floor(col("sum_micro").cast(DoubleType) / col("n_words").cast(DoubleType)).cast(LongType)
          .as("entropy_micro"),
      )
      .orderBy("doc_id")
  }

  val textEntropySql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
      |), counts AS (
      |  SELECT doc_id, w, count(*) AS c FROM toks GROUP BY doc_id, w
      |), totals AS (
      |  SELECT doc_id, sum(c) AS n, count(*) AS n_distinct FROM counts GROUP BY doc_id
      |), summed AS (
      |  SELECT counts.doc_id,
      |    CAST(max(n) AS BIGINT) AS n_words,
      |    CAST(max(n_distinct) AS BIGINT) AS n_distinct,
      |    sum(c * CAST(floor(ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE)) * 1000000.0) AS BIGINT)) AS sum_micro
      |  FROM counts JOIN totals ON counts.doc_id = totals.doc_id
      |  GROUP BY counts.doc_id
      |)
      |SELECT doc_id, n_words, n_distinct,
      |  CAST(floor(CAST(sum_micro AS DOUBLE) / CAST(n_words AS DOUBLE)) AS BIGINT) AS entropy_micro
      |FROM summed
      |ORDER BY doc_id""".stripMargin

  /** Misra-Gries counter budget for [[textHeavyHitters]]. A term with
    * partition frequency > n_p/(k+1) always survives that partition's
    * summary, so (pigeonhole over partitions) any term with GLOBAL
    * frequency > N/(k+1) survives in at least one partition — the
    * candidate union is a guaranteed superset of every term at the
    * query's threshold max(5, N/1000) since both branches exceed
    * N/2001 for all N.
    */
  val HeavyHitterCounters = 2000

  /** One partition's Misra-Gries pass: ≤ k counters; a non-resident
    * arrival with a full table decrements every counter (the arrival
    * itself also discarded — each decrement round removes k+1 mass, so
    * rounds ≤ n_p/(k+1), which is both the undercount bound and the
    * amortized-O(n) argument).
    */
  def misraGries(it: Iterator[String], k: Int): Iterator[(String, Long)] = {
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { w =>
      if (counts.contains(w)) counts(w) += 1
      else if (counts.size < k) counts(w) = 1
      else {
        // snapshot the keys: value writes during live iteration over a
        // mutable map are not contract-safe
        counts.keys.toArray.foreach { key =>
          val c = counts(key) - 1
          if (c == 0) counts.remove(key) else counts(key) = c
        }
      }
    }
    counts.iterator
  }

  /** §2.5 #33s — frequent-term extraction at threshold max(5, N/1000)
    * by sketch-then-verify: pass 1 is a ZERO-SHUFFLE per-partition
    * Misra-Gries summary (≤ P·k rows, bounded independent of corpus
    * size) whose union is a guaranteed candidate superset; pass 2
    * recounts ONLY candidate occurrences via a broadcast LEFT SEMI
    * join on the candidate relation — NOT an `isin` literal list,
    * which would compile counters×partitions string literals into the
    * plan (Janino pressure + plan-size blowup at 100× partition
    * counts) — so the exact pass shuffles |candidate tokens| ≪ N. At
    * 100 TB the full-vocabulary shuffle never happens — that is the
    * entire point vs the naive plan the oracle runs. Output is exact
    * (recount + threshold), so the partition-dependent candidate set
    * never shows.
    */
  def textHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = docs(spark, dir).select(explode(words).as("w"))
    val candidates = toks.as[String]
      .mapPartitions(it => misraGries(it, HeavyHitterCounters))
      .map(_._1).distinct().toDF("cand_w")
    val nRow = toks.agg(count(lit(1)).as("n_total"))
    toks
      .join(broadcast(candidates), col("w") === col("cand_w"), "left_semi")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .join(broadcast(nRow), lit(true))
      .filter(col("c") >= greatest(lit(5L), floor(col("n_total").cast(DoubleType) / 1000.0).cast(LongType)))
      .select(col("w"), col("c"))
      .orderBy(col("c").desc, col("w"))
  }

  val textHeavyHittersSql: String =
    """WITH toks AS (
      |  SELECT unnest(string_split(text, ' ')) AS w FROM documents
      |), nn AS (
      |  SELECT count(*) AS n_total FROM toks
      |), c AS (
      |  SELECT w, count(*) AS c FROM toks GROUP BY w
      |)
      |SELECT w, c FROM c CROSS JOIN nn
      |WHERE c >= greatest(5, CAST(floor(CAST(n_total AS DOUBLE) / 1000.0) AS BIGINT))
      |ORDER BY c DESC, w""".stripMargin

  /** §2.5 #33t — per-source percentile calibration of the quality
    * score: raw scores are not comparable across sources (a "0.7" from
    * a clean corpus and a noisy one mean different things), so the
    * production keep-threshold applies to the WITHIN-SOURCE percentile
    * rank. percent_rank over a (score, doc_id) total order — tie-free,
    * so it equals (row_number−1)/(n−1), one exact IEEE division both
    * engines compute identically; micro-quantized output. One window
    * pass partitioned by source — partition-parallel at any scale (a
    * global percentile would single-partition; per-source is the
    * point).
    */
  def textQualityCalibrated(spark: SparkSession, dir: String): DataFrame = {
    val nTokens = size(words).cast(LongType)
    val nUniq = size(array_distinct(words)).cast(LongType)
    val score = (nUniq.cast(DoubleType) / nTokens) * least(lit(1.0), nTokens.cast(DoubleType) / 50.0)
    val w = Window.partitionBy(col("source")).orderBy(col("quality_score"), col("doc_id"))
    docs(spark, dir)
      .select(col("doc_id"), col("source"), score.as("quality_score"))
      .withColumn("pct_micro",
        floor(percent_rank().over(w) * 1000000.0 + 0.5).cast(LongType))
      .orderBy("doc_id")
  }

  val textQualityCalibratedSql: String =
    """WITH scored AS (
      |  SELECT doc_id, source,
      |    (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / len(string_split(text, ' ')))
      |      * least(1.0, CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0) AS quality_score
      |  FROM documents
      |)
      |SELECT doc_id, source, quality_score,
      |  CAST(floor(percent_rank() OVER (PARTITION BY source ORDER BY quality_score, doc_id) * 1000000.0 + 0.5) AS BIGINT) AS pct_micro
      |FROM scored
      |ORDER BY doc_id""".stripMargin

  /** §2.5 #33x — adaptive per-source quality GATE: within every
    * source, drop the bottom quartile of the quality distribution and
    * report the per-source threshold + keep receipts. This is the
    * SCALE twin of [[textQualityCalibrated]]: where the calibrated
    * score ranks every document with a window over the fact table,
    * the gate derives each source's cutoff from a compressed
    * (source, score_ppm) HISTOGRAM — ≤ |sources| × 1e6 rows however
    * large the corpus — then applies it as a broadcast-join map-side
    * filter. No fact-table sort anywhere; at 100 TB the only wide
    * stages are one map-side-combined histogram rollup and one
    * per-source receipt rollup.
    *
    * The score is pure int64 ppm so both engines agree bit-for-bit:
    * uniq_ratio · min(1, n_tokens/50) · 1e6 =
    * n_uniq·1e6 div n_tokens when n_tokens ≥ 50, else n_uniq·20000
    * (the n_tokens cancels — no division at all on the short branch).
    * Threshold = smallest score_ppm whose cumulative count covers
    * ceil(n/4) (4·cum ≥ n in int math); keep score_ppm ≥ threshold,
    * so ties at the cut survive (kept share ≥ 75% by construction).
    */
  /** The adaptive gate's pure-int64 ppm quality score (see
    * [[textAdaptiveFilter]]'s doc for the algebra) — shared by the
    * batch gate and its stateless streaming twin [[adaptiveFilterOn]].
    */
  private def adaptiveScorePpm: Column = {
    val nTokens = size(words).cast(LongType)
    val nUniq = size(array_distinct(words)).cast(LongType)
    when(nTokens >= 50, expr(
        "CAST(size(array_distinct(split(text, ' '))) AS BIGINT) * 1000000 div size(split(text, ' '))"))
      .otherwise(nUniq * lit(20000L))
  }

  /** Per-source bottom-quartile cutoff from the compressed
    * (source, score_ppm) histogram — ≤ |sources| × 1e6 rows at any
    * corpus size. Output: (source, threshold_ppm, n_total).
    */
  private def adaptiveThresholdTable(scored: DataFrame): DataFrame = {
    val hist = scored.groupBy(col("source"), col("score_ppm")).agg(count(lit(1)).as("c"))
    val wcum = Window.partitionBy(col("source")).orderBy(col("score_ppm"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum(col("c")).over(wcum))
      .withColumn("n_total", sum(col("c")).over(Window.partitionBy(col("source"))))
      .where(col("cum") * 4 >= col("n_total"))
      .groupBy(col("source"))
      .agg(min(col("score_ppm")).as("threshold_ppm"), min(col("n_total")).as("n_total"))
  }

  /** The standing per-source gate thresholds frozen to a driver-side
    * map — |sources| entries by construction (the dsirModel
    * bounded-collect idiom), broadcast into [[adaptiveFilterOn]]'s
    * row-local predicate.
    */
  def adaptiveThresholds(spark: SparkSession, dir: String): Map[String, Long] = {
    val scored = docs(spark, dir)
      .select(col("doc_id"), col("source"), adaptiveScorePpm.as("score_ppm"))
    adaptiveThresholdTable(scored).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("threshold_ppm")).toMap
  }

  /** §2.7 — stateless streaming twin of [[textAdaptiveFilter]]: each
    * arriving document is scored with the SAME int64 ppm formula and
    * gated against the FROZEN standing thresholds — the production
    * shape (cutoffs derived from the standing corpus histogram,
    * applied to the stream; re-deriving them is a batch concern, like
    * [[graft.operators.Pipeline.dsirScoreOn]]'s frozen model). Pure
    * row-local transform over a |sources|-entry literal map: no
    * state, no shuffle, append-mode safe at any rate. A source absent
    * from the standing map gates at threshold 0 (keep) — new sources
    * pass until the next batch re-derivation covers them.
    */
  def adaptiveFilterOn(df: DataFrame, thresholds: Map[String, Long]): DataFrame = {
    val thrMap = typedLit(thresholds)
    df.select(col("doc_id"), col("source"), adaptiveScorePpm.as("score_ppm"))
      .withColumn("threshold_ppm", coalesce(element_at(thrMap, col("source")), lit(0L)))
      .withColumn("kept", col("score_ppm") >= col("threshold_ppm"))
  }

  def textAdaptiveFilter(spark: SparkSession, dir: String): DataFrame = {
    val scored = docs(spark, dir)
      .select(col("doc_id"), col("source"), adaptiveScorePpm.as("score_ppm"))
    val thr = adaptiveThresholdTable(scored)
    scored.join(broadcast(thr), Seq("source"))
      .where(col("score_ppm") >= col("threshold_ppm"))
      .groupBy(col("source"))
      .agg(
        min(col("threshold_ppm")).as("threshold_ppm"),
        min(col("n_total")).as("n_total"),
        count(lit(1)).as("n_kept"),
        sum(col("doc_id")).as("kept_id_sum"),
      )
      .withColumn("kept_share_ppm", expr(
        "((n_kept * 1000) div n_total) * 1000 + ((n_kept * 1000 % n_total) * 1000) div n_total"))
      .select(col("source"), col("threshold_ppm"), col("n_total"), col("n_kept"),
        col("kept_share_ppm"), col("kept_id_sum"))
      .orderBy("source")
  }

  val textAdaptiveFilterSql: String =
    """WITH scored AS (
      |  SELECT doc_id, source,
      |    CASE WHEN len(string_split(text, ' ')) >= 50
      |      THEN CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) * 1000000 // len(string_split(text, ' '))
      |      ELSE CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) * 20000 END AS score_ppm
      |  FROM documents
      |), hist AS (
      |  SELECT source, score_ppm, count(*) AS c FROM scored GROUP BY source, score_ppm
      |), cum AS (
      |  SELECT source, score_ppm, c,
      |    CAST(sum(c) OVER (PARTITION BY source ORDER BY score_ppm
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(sum(c) OVER (PARTITION BY source) AS BIGINT) AS n_total
      |  FROM hist
      |), thr AS (
      |  SELECT source, min(score_ppm) AS threshold_ppm, min(n_total) AS n_total
      |  FROM cum WHERE cum * 4 >= n_total GROUP BY source
      |)
      |SELECT s.source, t.threshold_ppm, t.n_total,
      |  count(*) AS n_kept,
      |  CAST(((count(*) * 1000) // min(t.n_total)) * 1000
      |    + ((count(*) * 1000 % min(t.n_total)) * 1000) // min(t.n_total) AS BIGINT) AS kept_share_ppm,
      |  CAST(sum(s.doc_id) AS BIGINT) AS kept_id_sum
      |FROM scored s JOIN thr t USING (source)
      |WHERE s.score_ppm >= t.threshold_ppm
      |GROUP BY s.source, t.threshold_ppm, t.n_total
      |ORDER BY s.source""".stripMargin

  /** §2.5 #33u — inverted-index build: one row per vocabulary word
    * with document frequency, total term frequency, and the full
    * sorted posting list (verified through its md5 so the checked
    * output stays narrow while still pinning every posting byte; the
    * list itself ships in `posting_len`-char form to the sink in a
    * real deployment). The search-engine / retrieval-index primitive
    * BM25 consumes.
    *
    * Scale shape: tokenize map-side, ONE shuffle on word for the
    * combined (df, tf, postings) aggregation — `collect_set` is a
    * partial-aggregating hash set, so per-word lists merge map-side
    * and only distinct doc ids travel. Posting lists are the output,
    * so their size is irreducible; at 100 TB the df ≥ 20 floor is the
    * knob that drops the singleton long-tail (most of the vocabulary,
    * negligible index value). Sorting happens per-word AFTER the
    * aggregate (bounded by the posting length, not the corpus).
    */
  def textInverted(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id"), explode(words).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(
        countDistinct(col("doc_id")).as("df"),
        count(lit(1)).as("tf_total"),
        sort_array(collect_set(col("doc_id"))).as("posting"),
      )
      .filter(col("df") >= 20)
      .select(
        col("word"), col("df"), col("tf_total"),
        md5(concat_ws(",", transform(col("posting"), _.cast(StringType)))).as("posting_md5"),
        size(col("posting")).cast(LongType).as("posting_len"),
      )
      .orderBy("word")

  val textInvertedSql: String =
    """WITH w AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
      |), f AS (SELECT word, doc_id FROM w WHERE len(word) > 0)
      |SELECT word,
      |  CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
      |  CAST(count(*) AS BIGINT) AS tf_total,
      |  md5(list_aggregate(list_sort(list(DISTINCT doc_id)), 'string_agg', ',')) AS posting_md5,
      |  CAST(count(DISTINCT doc_id) AS BIGINT) AS posting_len
      |FROM f GROUP BY word HAVING count(DISTINCT doc_id) >= 20
      |ORDER BY word""".stripMargin

  // ------------------------------------------------------ RAKE keyphrases

  /** §2.5 #33x — RAKE keyphrase extraction (Rose et al. 2010,
    * "Automatic Keyword Extraction from Individual Documents"):
    * candidate phrases are maximal stopword-free token runs; a word
    * scores deg/freq (deg = summed length of phrases it appears in —
    * co-occurrence degree including self; freq = occurrence count);
    * a phrase scores the sum of its member words' scores. The
    * corpus-level top-100 multiword phrases by score — the
    * unsupervised index-term/topic-label extractor that needs no
    * training data, one step up from [[textTfidf]]'s single terms.
    *
    * Scale shape: token explode is map-side; phrase segmentation is a
    * per-doc running-sum window on the (doc, pos) order (bounded —
    * document streams, never corpus-wide); word stats and
    * phrase-type stats shuffle on Zipf-bounded vocab / phrase-type
    * keys; the final top-100 is a TakeOrdered under the total
    * (score, phrase) order, never a global sort. Scores are
    * floor-quantized ppm int64 — no float.
    */
  def textRake(spark: SparkSession, dir: String): DataFrame = {
    val stops = stopwords.toMap.apply("en")
    val wStop = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val member = docs(spark, dir)
      .select(col("doc_id"), posexplode(words).as(Seq("pos", "w")))
      .withColumn("is_stop",
        when(col("w").isin(stops: _*) || col("w") === "", 1L).otherwise(0L))
      .withColumn("phrase_id", sum(col("is_stop")).over(wStop))
      .filter(col("is_stop") === 0)
    val phrases = member
      .groupBy(col("doc_id"), col("phrase_id"))
      .agg(collect_list(struct(col("pos"), col("w"))).as("ws"))
      .select(
        expr("array_join(transform(array_sort(ws), x -> x.w), ' ')").as("phrase"),
        size(col("ws")).cast(LongType).as("plen"))
    val wscore = phrases
      .select(explode(split(col("phrase"), " ")).as("w"), col("plen"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
      .select(col("w"), expr("(deg * 1000000L) div freq").as("wscore_ppm"))
    phrases
      .groupBy(col("phrase")).agg(count(lit(1)).as("n_occ"))
      .select(col("phrase"), col("n_occ"), explode(split(col("phrase"), " ")).as("w"))
      .join(wscore, "w")
      .groupBy(col("phrase"), col("n_occ"))
      .agg(count(lit(1)).as("plen"), sum(col("wscore_ppm")).as("score_ppm"))
      .filter(col("plen") >= 2)
      .select(col("phrase"), col("n_occ"), col("plen"), col("score_ppm"))
      .orderBy(col("score_ppm").desc, col("phrase"))
      .limit(100)
  }

  val textRakeSql: String =
    """WITH ws AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
      |), tok AS (
      |  SELECT doc_id, unnest(toks) AS w,
      |    unnest(range(1, len(toks) + 1)) AS pos
      |  FROM ws
      |), marked AS (
      |  SELECT doc_id, w, pos,
      |    CASE WHEN w IN ('the', 'a', 'and', 'of', 'to', 'in', 'is')
      |      OR w = '' THEN 1 ELSE 0 END AS is_stop
      |  FROM tok
      |), ph AS (
      |  SELECT doc_id, w, pos, is_stop,
      |    sum(is_stop) OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id
      |  FROM marked
      |), phrases AS (
      |  SELECT doc_id, phrase_id,
      |    string_agg(w, ' ' ORDER BY pos) AS phrase,
      |    CAST(count(*) AS BIGINT) AS plen
      |  FROM ph WHERE is_stop = 0 GROUP BY 1, 2
      |), occ AS (
      |  SELECT unnest(string_split(phrase, ' ')) AS w, plen FROM phrases
      |), wscore AS (
      |  SELECT w, CAST(sum(plen) * 1000000 // count(*) AS BIGINT) AS wscore_ppm
      |  FROM occ GROUP BY w
      |), ptype AS (
      |  SELECT phrase, count(*) AS n_occ FROM phrases GROUP BY 1
      |), pw AS (
      |  SELECT phrase, n_occ, unnest(string_split(phrase, ' ')) AS w FROM ptype
      |)
      |SELECT p.phrase, CAST(p.n_occ AS BIGINT) AS n_occ,
      |  CAST(count(*) AS BIGINT) AS plen,
      |  CAST(sum(s.wscore_ppm) AS BIGINT) AS score_ppm
      |FROM pw p JOIN wscore s USING (w)
      |GROUP BY p.phrase, p.n_occ
      |HAVING count(*) >= 2
      |ORDER BY score_ppm DESC, phrase
      |LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- zipf

  /** Top-K vocabulary ranks entering the [[textZipf]] fit. */
  val ZipfTopK = 100

  /** §2.5 — per-source Zipf rank-frequency audit: fit
    * ln(tf) ≈ a − s·ln(rank) over the top-[[ZipfTopK]] terms and report
    * the slope magnitude `s` in exact ppm — the corpus-health number
    * every curation run should publish. Natural language sits near
    * s ≈ 1 (Zipf's law); s ≫ 1 means a few terms dominate
    * (boilerplate/template leakage), s ≪ 1 means a suspiciously flat
    * head (id/noise floods). The top-1 token share is the companion
    * single-number version of the same diagnosis.
    *
    * Exactness: ln(rank)/ln(tf) are quantized to MILLI-nats
    * (floor(ln·1e3) — the coarse cousin of the micro-nat convention,
    * chosen so every moment stays int64: with x ≤ ln(100)·10³ and
    * y ≤ ln(tf)·10³ the OLS numerator (Σx·Σy − n·Σxy)·10⁶ is
    * ≤ ~1.3e18 even at tf = 10⁹). Ranks order by tf desc then term
    * asc, so y is non-increasing in x and the negated numerator is
    * provably ≥ 0 — the division never sees a negative operand, which
    * keeps Spark's `div` and DuckDB's `//` semantics identical.
    *
    * Scale shape: ONE corpus explode feeds a map-side-combined
    * (source, term) count; source totals roll up from that vocab
    * relation (no second corpus scan); the rank window partitions by
    * source over the Zipf-bounded vocab — the corpus itself never
    * shuffles and nothing global-sorts.
    */
  def textZipf(spark: SparkSession, dir: String): DataFrame = {
    val tf = docs(spark, dir)
      .select(col("source"), explode(words).as("term"))
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val tot = tf.groupBy(col("source"))
      .agg(sum(col("tf")).as("total_tf"))
    val w = Window.partitionBy(col("source")).orderBy(col("tf").desc, col("term"))
    val top = tf
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= ZipfTopK)
      .withColumn("x", expr("CAST(floor(ln(CAST(rk AS DOUBLE)) * 1000) AS BIGINT)"))
      .withColumn("y", expr("CAST(floor(ln(CAST(tf AS DOUBLE)) * 1000) AS BIGINT)"))
    top
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_terms"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        max(when(col("rk") === 1L, col("tf"))).as("top1_tf"),
      )
      .join(broadcast(tot), Seq("source"))
      .filter(col("n_terms") >= 2L)
      .select(
        col("source"),
        col("n_terms"),
        col("total_tf"),
        expr("(top1_tf * 1000000) div total_tf").as("top1_share_ppm"),
        expr("((sx * sy - n_terms * sxy) * 1000000) div (n_terms * sxx - sx * sx)")
          .as("zipf_slope_ppm"),
      )
      .orderBy("source")
  }

  val textZipfSql: String =
    s"""WITH tf AS (
      |  SELECT source, term, count(*) AS tf FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
      |  ) GROUP BY source, term
      |), tot AS (
      |  SELECT source, sum(tf) AS total_tf FROM tf GROUP BY source
      |), top AS (
      |  SELECT source, tf,
      |    CAST(row_number() OVER (PARTITION BY source ORDER BY tf DESC, term) AS BIGINT) AS rk
      |  FROM tf
      |  QUALIFY rk <= $ZipfTopK
      |), pts AS (
      |  SELECT source, rk, tf,
      |    CAST(floor(ln(CAST(rk AS DOUBLE)) * 1000) AS BIGINT) AS x,
      |    CAST(floor(ln(CAST(tf AS DOUBLE)) * 1000) AS BIGINT) AS y
      |  FROM top
      |), fit AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
      |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy, sum(x * x) AS sxx,
      |    max(CASE WHEN rk = 1 THEN tf END) AS top1_tf
      |  FROM pts GROUP BY source
      |)
      |SELECT f.source, f.n_terms, CAST(t.total_tf AS BIGINT) AS total_tf,
      |  CAST((f.top1_tf * 1000000) // t.total_tf AS BIGINT) AS top1_share_ppm,
      |  CAST(((f.sx * f.sy - f.n_terms * f.sxy) * 1000000) // (f.n_terms * f.sxx - f.sx * f.sx) AS BIGINT)
      |    AS zipf_slope_ppm
      |FROM fit f JOIN tot t USING (source)
      |WHERE f.n_terms >= 2
      |ORDER BY f.source""".stripMargin

  /** §2.5 #33ab — pairwise source corpus-overlap matrix: exact 3-gram
    * shingle Jaccard (and both containments) between every source
    * pair. This is the corpus-level companion of the per-document
    * near-dup ops — the number a mixture designer reads before
    * weighting two crawls (near-identical sources double-count their
    * tokens under any per-source mixing scheme) and the honest
    * denominator for the incremental-dedup decision ("is the new
    * source actually new?").
    *
    * Shape: per source the distinct shingle set collapses map-side
    * (groupBy (source, gram) — the fact-sized step, one shuffle);
    * pair counts come from ONE more gram-keyed aggregation that
    * collect_sets each gram's ≤|sources| owners and explodes the
    * sorted pairs map-side AFTER the agg — no self-join, so the
    * deduped gram relation shuffles once, not twice, and a gram's
    * fan-out is bounded by the SOURCE count (s(s-1)/2; 20 sources cap
    * it at 190), never the corpus. Set sizes (20 rows) broadcast-cross
    * onto the 190-row pair grid so zero-overlap pairs report 0 rather
    * than vanish. All counts int64; the Jaccard/containment ppm are
    * single integral divides — exact cross-engine.
    */
  def textOverlap(spark: SparkSession, dir: String): DataFrame = {
    val g = docs(spark, dir)
      .select(col("source"),
        explode(graft.functions.ArrayExprs.wordNgrams(words, 3)).as("gram"))
      .distinct()
      .cache()
    val sizes = g.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val pairs = sizes.select(col("source").as("src_a"), col("n").as("n_a"))
      .crossJoin(broadcast(sizes.select(col("source").as("src_b"), col("n").as("n_b"))))
      .filter(col("src_a") < col("src_b"))
    val inter = g.groupBy(col("gram"))
      .agg(sort_array(collect_set(col("source"))).as("srcs"))
      .filter(size(col("srcs")) >= 2)
      .select(posexplode(col("srcs")).as(Seq("i", "src_a")), col("srcs"))
      .select(col("src_a"),
        explode(slice(col("srcs"), col("i") + lit(2), size(col("srcs")))).as("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_inter"))
    val out = pairs.join(inter, Seq("src_a", "src_b"), "left")
      .select(
        col("src_a"), col("src_b"), col("n_a"), col("n_b"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"),
        // Zero-denominator guards are defense-in-depth: every source in
        // `pairs` comes from `sizes` (count ≥ 1 by construction — even a
        // one-word doc yields its whole-text gram via WordNgrams'
        // short-doc fallback), so n_a, n_b and the union size are all
        // ≥ 1 on any reachable input. Guarded anyway so a future
        // shingle definition without the fallback can't turn a
        // degenerate corpus into an ANSI DIVIDE_BY_ZERO; identical
        // CASE in the oracle keeps the engines aligned.
        expr("IF(n_a + n_b - coalesce(n_inter, 0L) = 0, 0L, " +
          "coalesce(n_inter, 0L) * 1000000L div (n_a + n_b - coalesce(n_inter, 0L)))")
          .as("jaccard_ppm"),
        expr("IF(n_a = 0, 0L, coalesce(n_inter, 0L) * 1000000L div n_a)").as("contain_a_ppm"),
        expr("IF(n_b = 0, 0L, coalesce(n_inter, 0L) * 1000000L div n_b)").as("contain_b_ppm"),
      )
    graft.GraftSession.materialized(out, Seq("src_a", "src_b"), g)
  }

  val textOverlapSql: String = {
    val terms = (0 until 3).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
    s"""WITH w AS (SELECT source, text, string_split(text, ' ') AS ws FROM documents),
      |g AS (
      |  SELECT DISTINCT source, gram FROM (
      |    SELECT source, unnest(
      |      CASE WHEN len(ws) >= 3
      |        THEN list_transform(range(1, len(ws) - 1), i -> $terms)
      |        ELSE [text] END) AS gram
      |    FROM w
      |  )
      |), sizes AS (SELECT source, count(*) AS n FROM g GROUP BY source),
      |pairs AS (
      |  SELECT a.source AS src_a, b.source AS src_b, a.n AS n_a, b.n AS n_b
      |  FROM sizes a CROSS JOIN sizes b WHERE a.source < b.source
      |), inter AS (
      |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_inter
      |  FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
      |  GROUP BY 1, 2
      |)
      |SELECT p.src_a, p.src_b, CAST(p.n_a AS BIGINT) AS n_a, CAST(p.n_b AS BIGINT) AS n_b,
      |  CAST(coalesce(i.n_inter, 0) AS BIGINT) AS n_inter,
      |  CAST(CASE WHEN p.n_a + p.n_b - coalesce(i.n_inter, 0) = 0 THEN 0
      |    ELSE coalesce(i.n_inter, 0) * 1000000 // (p.n_a + p.n_b - coalesce(i.n_inter, 0)) END AS BIGINT) AS jaccard_ppm,
      |  CAST(CASE WHEN p.n_a = 0 THEN 0 ELSE coalesce(i.n_inter, 0) * 1000000 // p.n_a END AS BIGINT) AS contain_a_ppm,
      |  CAST(CASE WHEN p.n_b = 0 THEN 0 ELSE coalesce(i.n_inter, 0) * 1000000 // p.n_b END AS BIGINT) AS contain_b_ppm
      |FROM pairs p LEFT JOIN inter i ON p.src_a = i.src_a AND p.src_b = i.src_b
      |ORDER BY p.src_a, p.src_b""".stripMargin
  }

  /** §2.5 #33ad — pairwise source Jensen-Shannon divergence over
    * unigram distributions: the DISTRIBUTIONAL companion of
    * [[textOverlap]]'s syntactic shingle Jaccard (two crawls can share
    * few exact 3-grams yet be near-identical distributions, and vice
    * versa — a mixture designer wants both numbers). JS is symmetric,
    * bounded [0, ln 2], and zero iff identical — the standard corpus
    * drift/similarity metric.
    *
    * Decomposition that makes it one-shuffle scalable: terms PRIVATE
    * to either source contribute in closed form — Σ_{A only} ½p·ln2 =
    * ½ln2·(1 − Sp) with Sp = Σ_{shared} p — so only SHARED terms need
    * pairwise work. Those ride the textOverlap idiom: one term-keyed
    * collect_list of (source, tf) owners, sorted pairs exploded
    * map-side AFTER the agg (fan-out ≤ s(s−1)/2 per term, never the
    * corpus), per-source totals broadcast twice. Per shared term the
    * contribution p·ln(2p/(p+q)) + q·ln(2q/(p+q)) quantizes to
    * PICO-nats per term (floor·10¹², the textSurprisal micro-nat trick
    * one scale down — contributions are tiny) so the pair aggregation
    * is an order-free int64 sum; shared-mass numerators Σtf stay
    * integer. The final js_nats combines one int sum + two exact
    * integer ratios + ln 2. Caveat: unlike the pure-integer ops, the
    * per-term quantization here goes through ln(), which is NOT
    * correctly rounded in either engine's libm — floor(·1e12) can in
    * principle flip by one ulp-boundary count on a different
    * platform/corpus. On this box the engines agree exactly (the gate
    * passes); treat the cross-engine equality as empirical, not
    * proven, and allow a |Δc| ≤ n_shared per-pair slack if a future
    * platform diverges.
    * Zero-overlap pairs correctly report the JS maximum ln 2 via the
    * broadcast-crossed 190-row pair grid.
    */
  def textJs(spark: SparkSession, dir: String): DataFrame = {
    val tf = docs(spark, dir)
      .select(col("source"), explode(words).as("term"))
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .cache()
    val tot = tf.groupBy(col("source")).agg(sum(col("tf")).as("tot"))
    val shared = tf
      .groupBy(col("term"))
      .agg(sort_array(collect_list(struct(col("source").as("s"), col("tf").as("t")))).as("st"))
      .filter(size(col("st")) >= 2)
      .select(posexplode(col("st")).as(Seq("i", "a")), col("st"))
      .select(col("a"), explode(slice(col("st"), col("i") + lit(2), size(col("st")))).as("b"))
      .select(
        col("a.s").as("src_a"), col("a.t").as("tf_a"),
        col("b.s").as("src_b"), col("b.t").as("tf_b"))
      .join(broadcast(tot.select(col("source").as("src_a"), col("tot").as("tot_a"))), Seq("src_a"))
      .join(broadcast(tot.select(col("source").as("src_b"), col("tot").as("tot_b"))), Seq("src_b"))
      .withColumn("pa", expr("CAST(tf_a AS DOUBLE) / CAST(tot_a AS DOUBLE)"))
      .withColumn("pb", expr("CAST(tf_b AS DOUBLE) / CAST(tot_b AS DOUBLE)"))
      .withColumn("c", expr(
        "CAST(floor((pa * ln(2.0D * pa / (pa + pb)) + pb * ln(2.0D * pb / (pa + pb))) * 1e12) AS BIGINT)"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(
        count(lit(1)).as("n_shared"),
        sum(col("tf_a")).as("stf_a"),
        sum(col("tf_b")).as("stf_b"),
        sum(col("c")).as("c"))
    val grid = tot.select(col("source").as("src_a"), col("tot").as("tot_a"))
      .crossJoin(broadcast(tot.select(col("source").as("src_b"), col("tot").as("tot_b"))))
      .filter(col("src_a") < col("src_b"))
    val out = grid.join(shared, Seq("src_a", "src_b"), "left")
      .select(
        col("src_a"), col("src_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        expr("0.5D * coalesce(c, 0L) / 1e12" +
          " + 0.5D * ln(2.0D) * (1.0D - CAST(coalesce(stf_a, 0L) AS DOUBLE) / CAST(tot_a AS DOUBLE))" +
          " + 0.5D * ln(2.0D) * (1.0D - CAST(coalesce(stf_b, 0L) AS DOUBLE) / CAST(tot_b AS DOUBLE))")
          .as("js_nats"))
      .withColumn("js_norm_ppm",
        expr("CAST(floor(js_nats / ln(2.0D) * 1e6) AS BIGINT)"))
    graft.GraftSession.materialized(out, Seq("src_a", "src_b"), tf)
  }

  /** Permutation count for [[textOverlapSketch]] — 128 gives a
    * Jaccard-estimate standard error ≤ √(J(1−J)/128) ≈ 0.044.
    */
  private[graft] val SketchK = 128
  private[graft] val SketchP = 4294967311L
  private[graft] val SketchAs: Array[Long] = Array.tabulate(SketchK)(j => (2 * j + 1).toLong)
  private[graft] val SketchBs: Array[Long] = Array.tabulate(SketchK)(j => j.toLong)

  /** Per-doc fused signature column (array<long>, K slots) — the
    * [[graft.functions.MinHashGramSig]] kernel over the doc's 3-gram
    * array, shared by the batch sketch and the streaming twin.
    */
  private[graft] def sketchSigCol(wordsCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.ArrayExprs.minhashGramSig(
      graft.functions.ArrayExprs.wordNgrams(wordsCol, 3), SketchAs, SketchBs, SketchP)

  /** §2.5 #33ae — corpus-overlap matrix by MinHash SKETCH: the 100 TB
    * scale path for [[textOverlap]]. The exact matrix must shuffle the
    * full distinct-gram relation; this one collapses each source to a
    * K=128-slot MinHash signature in ONE pass — per source, the k-th
    * slot is min over grams of the k-th affine permutation of the
    * gram hash (Broder '97), and P(slot_a = slot_b) = Jaccard(A, B),
    * so matches/K estimates the whole matrix from 20 signature rows.
    *
    * The 128 permutations ride PACKED as 128 min-aggregate columns in
    * ONE map-side-combinable HashAggregate (the q_neighborhood_k
    * layout lesson: exploding to (gram, k) rows would multiply the
    * fact shuffle ×128), computed per DOC by the fused
    * [[graft.functions.MinHashGramSig]] kernel — md5 + all 128
    * (a·h + b) mod 4294967311 permutations in one two-level JIT loop,
    * straight off the digest bytes (no hex-string materialization, no
    * conv parse, no gram explode: min-of-per-doc-mins ≡ the global
    * min, and repeated grams are absorbed at both levels). The agg
    * input is |docs| rows, not |gram occurrences| rows. The pair
    * stage is a 20×20 bounded broadcast cross of signature rows with
    * a 128-term match-count fold. Everything is integer — the kernel
    * hash is bit-identical to the oracle's md5-hex-prefix parse, so
    * the estimate hash-matches DuckDB exactly, estimator randomness
    * and all. Round15OpsSpec pins the estimate against the exact
    * matrix within the binomial error bound.
    */
  def textOverlapSketch(spark: SparkSession, dir: String): DataFrame = {
    val js = 0 until SketchK
    val perDoc = docs(spark, dir).select(col("source"), sketchSigCol(words).as("s"))
    val sig = perDoc.groupBy(col("source"))
      .agg(
        min(element_at(col("s"), 1)).as("m0"),
        js.tail.map(j => min(element_at(col("s"), j + 1)).as(s"m$j")): _*)
      .cache()
    graft.GraftSession.materialized(overlapFromSignatures(sig), Seq("src_a", "src_b"), sig)
  }

  /** The bounded pair stage of [[textOverlapSketch]], factored out so
    * the streaming monitor (EventsStream.overlapMatrixMonitor) can
    * re-estimate the matrix from the standing signature rows with the
    * SAME code path the batch op uses — the stream≡batch pin is then
    * an equality of outputs, not of two reimplementations. Input:
    * (source, m0..m{K-1}); output ≤|sources|² rows.
    */
  private[graft] def overlapFromSignatures(sig: DataFrame): DataFrame = {
    val js = 0 until SketchK
    val a = sig.select(col("source").as("src_a") +: js.map(j => col(s"m$j").as(s"a$j")): _*)
    val b = sig.select(col("source").as("src_b") +: js.map(j => col(s"m$j").as(s"b$j")): _*)
    val matches = js.map(j => expr(s"IF(a$j = b$j, 1L, 0L)")).reduce(_ + _)
    a.crossJoin(broadcast(b))
      .filter(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"), matches.as("n_matches"))
      .withColumn("est_jaccard_ppm", expr(s"n_matches * 1000000L div ${SketchK}L"))
  }

  val textOverlapSketchSql: String = {
    val terms = (0 until 3).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
    val js = 0 until SketchK
    val mins = js.map(j =>
      s"CAST((${2 * j + 1} * h + $j) % 4294967311 AS BIGINT) AS p$j").mkString(",\n      |    ")
    val aggs = js.map(j => s"min(p$j) AS m$j").mkString(", ")
    // balanced chunks of 16: DuckDB's binder recurses per `+` node and
    // caps at depth 128, so a left-deep 128-term chain fails to bind
    val eqs = js.map(j => s"CASE WHEN a.m$j = b.m$j THEN 1 ELSE 0 END")
      .grouped(16).map(_.mkString("(", " + ", ")")).mkString(" + ")
    s"""WITH w AS (SELECT source, text, string_split(text, ' ') AS ws FROM documents),
      |g AS (
      |  SELECT DISTINCT source, gram FROM (
      |    SELECT source, unnest(
      |      CASE WHEN len(ws) >= 3
      |        THEN list_transform(range(1, len(ws) - 1), i -> $terms)
      |        ELSE [text] END) AS gram
      |    FROM w
      |  )
      |), hh AS (
      |  SELECT source, ('0x' || substr(md5(gram), 1, 8))::BIGINT AS h FROM g
      |), perms AS (
      |  SELECT source,
      |    $mins
      |  FROM hh
      |), sig AS (
      |  SELECT source, $aggs FROM perms GROUP BY source
      |)
      |SELECT a.source AS src_a, b.source AS src_b,
      |  CAST($eqs AS BIGINT) AS n_matches,
      |  CAST(($eqs) * 1000000 // ${SketchK} AS BIGINT) AS est_jaccard_ppm
      |FROM sig a JOIN sig b ON a.source < b.source
      |ORDER BY src_a, src_b""".stripMargin
  }

  val textJsSql: String =
    """WITH tok AS (
      |  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
      |), tf AS (
      |  SELECT source, term, count(*) AS tf FROM tok GROUP BY 1, 2
      |), tot AS (
      |  SELECT source, CAST(sum(tf) AS BIGINT) AS tot FROM tf GROUP BY source
      |), shared AS (
      |  SELECT src_a, src_b, count(*) AS n_shared,
      |    CAST(sum(tf_a) AS BIGINT) AS stf_a, CAST(sum(tf_b) AS BIGINT) AS stf_b,
      |    CAST(sum(CAST(floor((pa * ln(2.0 * pa / (pa + pb)) + pb * ln(2.0 * pb / (pa + pb))) * 1e12) AS BIGINT)) AS BIGINT) AS c
      |  FROM (
      |    SELECT a.source AS src_a, b.source AS src_b, a.tf AS tf_a, b.tf AS tf_b,
      |      CAST(a.tf AS DOUBLE) / CAST(ta.tot AS DOUBLE) AS pa,
      |      CAST(b.tf AS DOUBLE) / CAST(tb.tot AS DOUBLE) AS pb
      |    FROM tf a
      |    JOIN tf b ON a.term = b.term AND a.source < b.source
      |    JOIN tot ta ON ta.source = a.source
      |    JOIN tot tb ON tb.source = b.source
      |  )
      |  GROUP BY 1, 2
      |), grid AS (
      |  SELECT a.source AS src_a, a.tot AS tot_a, b.source AS src_b, b.tot AS tot_b
      |  FROM tot a CROSS JOIN tot b WHERE a.source < b.source
      |), j AS (
      |  SELECT g.src_a, g.src_b,
      |    CAST(coalesce(s.n_shared, 0) AS BIGINT) AS n_shared,
      |    0.5 * coalesce(s.c, 0) / 1e12
      |      + 0.5 * ln(2.0) * (1.0 - CAST(coalesce(s.stf_a, 0) AS DOUBLE) / CAST(g.tot_a AS DOUBLE))
      |      + 0.5 * ln(2.0) * (1.0 - CAST(coalesce(s.stf_b, 0) AS DOUBLE) / CAST(g.tot_b AS DOUBLE)) AS js_nats
      |  FROM grid g LEFT JOIN shared s ON g.src_a = s.src_a AND g.src_b = s.src_b
      |)
      |SELECT src_a, src_b, n_shared, js_nats,
      |  CAST(floor(js_nats / ln(2.0) * 1e6) AS BIGINT) AS js_norm_ppm
      |FROM j
      |ORDER BY src_a, src_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_zipf" -> (textZipf _),
    "text_overlap" -> (textOverlap _),
    "text_js" -> (textJs _),
    "text_overlap_sketch" -> (textOverlapSketch _),
    "text_inverted" -> (textInverted _),
    "text_pmi" -> (textPmi _),
    "text_entropy" -> (textEntropy _),
    "text_heavy_hitters" -> (textHeavyHitters _),
    "text_quality_calibrated" -> (textQualityCalibrated _),
    "text_adaptive_filter" -> (textAdaptiveFilter _),
    "text_bigram" -> (textBigramSurprisal _),
    "text_surprisal" -> (textSurprisal _),
    "text_chunks" -> (textChunks _),
    "text_normalize" -> (textNormalize _),
    "text_corpus_stats" -> (textCorpusStats _),
    "text_tokens" -> (textTokens _),
    "text_quality" -> (textQuality _),
    "text_langid" -> (textLangid _),
    "text_langid2" -> (textLangid2 _),
    "text_fingerprint" -> (textFingerprint _),
    "text_winnow_pairs" -> (textWinnowPairs _),
    "text_repetition" -> (textRepetition _),
    "text_tfidf" -> (textTfidf _),
    "text_collocations" -> (textCollocations _),
    "text_rake" -> (textRake _),
    "text_pii" -> (textPii _),
    "text_vocab" -> (textVocab _),
    "text_vocab_growth" -> (textVocabGrowth _),
    "text_bm25" -> (textBm25 _),
    "text_rrf" -> (textRrf _),
    "text_compress" -> (textCompress _),
  )

  val oracles: Map[String, String] = Map(
    "text_zipf" -> textZipfSql,
    "text_overlap" -> textOverlapSql,
    "text_js" -> textJsSql,
    "text_overlap_sketch" -> textOverlapSketchSql,
    "text_inverted" -> textInvertedSql,
    "text_bigram" -> textBigramSurprisalSql,
    "text_pmi" -> textPmiSql,
    "text_entropy" -> textEntropySql,
    "text_heavy_hitters" -> textHeavyHittersSql,
    "text_quality_calibrated" -> textQualityCalibratedSql,
    "text_adaptive_filter" -> textAdaptiveFilterSql,
    "text_surprisal" -> textSurprisalSql,
    "text_chunks" -> textChunksSql,
    "text_normalize" -> textNormalizeSql,
    "text_corpus_stats" -> textCorpusStatsSql,
    "text_tokens" -> textTokensSql,
    "text_quality" -> textQualitySql,
    "text_langid" -> textLangidSql,
    "text_langid2" -> textLangid2Sql,
    "text_fingerprint" -> textFingerprintSql,
    "text_repetition" -> textRepetitionSql,
    "text_tfidf" -> textTfidfSql,
    "text_collocations" -> textCollocationsSql,
    "text_rake" -> textRakeSql,
    "text_pii" -> textPiiSql,
    "text_vocab" -> textVocabSql,
    "text_vocab_growth" -> textVocabGrowthSql,
    "text_bm25" -> textBm25Sql,
    "text_rrf" -> textRrfSql,
  )
}
