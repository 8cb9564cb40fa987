package graft.operators

import graft.GraftSession.{materialized, table}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.3 — deduplication family over `documents`.
  *
  * Scale design: exact dedup is one hash-shuffle; MinHash/LSH is the
  * classic Broder'97 + banding construction — signature computation is
  * a map-side pass of pure codegen'd higher-order expressions (no
  * UDFs), and the only wide op is the shuffle on (band_idx, band_key).
  * SimHash (Charikar'02) uses a 4-segment pigeonhole index so
  * hamming≤3 search joins on segment equality instead of an all-pairs
  * cross.
  */
object Dedup {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "documents")

  private val words: Column = split(col("text"), " ")

  /** Distinct 3-word shingles (fallback: whole text for tiny docs —
    * the [[graft.functions.WordNgrams]] kernel emits one all-words
    * gram for short docs, which equals the whole text on this
    * single-spaced corpus).
    */
  private[graft] val shingles: Column =
    array_distinct(graft.functions.ArrayExprs.wordNgrams(words, 3))

  /** exact set-Jaccard between two pre-distinct string arrays. */
  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) / size(array_union(a, b))

  // ---------------------------------------------------------------- exact

  /** §2.3 #22 — exact dedup by content hash; min-id survivor. The
    * idempotent-put semantics of the reference store
    * (store/mod.rs:330-344) expressed as a relational operator.
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("content_hash"))
    docs(spark, dir)
      .select(col("doc_id"), sha2(col("text"), 256).as("content_hash"))
      .withColumn("keep_id", min(col("doc_id")).over(w))
      .withColumn("is_dup", col("doc_id") =!= col("keep_id"))
      .orderBy("doc_id")
  }

  val dedupExactSql: String =
    """SELECT doc_id, sha256(text) AS content_hash,
      |  min(doc_id) OVER (PARTITION BY sha256(text)) AS keep_id,
      |  doc_id != min(doc_id) OVER (PARTITION BY sha256(text)) AS is_dup
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** §2.3 #22c — corpus duplication profile: the cluster-size
    * histogram of exact (content-hash) duplicate groups — one row per
    * cluster size with how many clusters, how many documents, and the
    * exact bytes a dedup pass reclaims ((size−1) × blob bytes, since
    * members of a hash group are byte-identical). This is the "is
    * dedup worth running, and what will it save" report read before
    * scheduling the pass — and after it, the size-1-only profile IS
    * the proof it worked.
    *
    * Scale shape: one content-hash groupBy (map-side combined) then a
    * handful-of-rows histogram aggregation — the same single shuffle
    * as `dedup_exact` itself.
    */
  def dedupProfile(spark: SparkSession, dir: String): DataFrame = {
    val clusters = docs(spark, dir)
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(count(lit(1)).as("cluster_size"),
        max(octet_length(col("text"))).cast(LongType).as("blob_bytes"))
    clusters.groupBy(col("cluster_size"))
      .agg(
        count(lit(1)).as("n_clusters"),
        sum(col("cluster_size")).as("n_docs"),
        sum((col("cluster_size") - 1) * col("blob_bytes")).as("reclaimable_bytes"),
      )
      .orderBy("cluster_size")
  }

  val dedupProfileSql: String =
    """WITH c AS (
      |  SELECT sha256(text) AS content_hash, count(*) AS cluster_size,
      |    CAST(max(strlen(text)) AS BIGINT) AS blob_bytes
      |  FROM documents GROUP BY sha256(text)
      |)
      |SELECT cluster_size, count(*) AS n_clusters,
      |  CAST(sum(cluster_size) AS BIGINT) AS n_docs,
      |  CAST(sum((cluster_size - 1) * blob_bytes) AS BIGINT) AS reclaimable_bytes
      |FROM c GROUP BY cluster_size
      |ORDER BY cluster_size""".stripMargin

  // ---------------------------------------------------------------- n-gram jaccard

  /** §2.3 #23 — exact word-set Jaccard near-dup pairs, scoped to
    * same-source pairs (cross-source near-dups are MinHash's job).
    *
    * Blocking is (source, size band), not source alone: J(A,B) ≥ 0.8
    * forces min(|A|,|B|) ≥ 0.8·max(|A|,|B|) (|A∩B| ≤ min, |A∪B| ≥
    * max), so qualifying pairs differ by at most one geometric
    * log₁.₂₅ size band — joining each doc against its own and the two
    * adjacent bands prunes the pair space LOSSLESSLY (identical output,
    * same oracle) and keeps a hot source key from detonating into
    * O(n²): the quadratic term is now per (source, band), and band
    * population is bounded by the corpus length distribution.
    */
  def dedupJaccard(spark: SparkSession, dir: String): DataFrame = {
    // word sets as sorted xxhash64 arrays: |A∩B| then runs in the
    // codegen'd two-pointer kernel; set sizes (and hence jaccard)
    // equal the string-set formulation absent 64-bit collisions
    val bandBase = math.log(1.25)
    val d = docs(spark, dir)
      .select(
        col("doc_id"),
        col("source"),
        array_sort(array_distinct(transform(words, w => xxhash64(w)))).as("wset"),
      )
      .withColumn("band", floor(log(greatest(size(col("wset")), lit(1)).cast(DoubleType)) / bandBase).cast(IntegerType))
      .cache()
    val a = d.select(col("doc_id").as("doc_a"), col("source"), col("wset").as("wa"), col("band"))
      // a qualifying partner's band is within ±1 of ours; emitting the
      // three bands on the smaller-id side keeps each pair matched
      // exactly once (the partner's band is a single value)
      .withColumn("jband", explode(array(col("band") - 1, col("band"), col("band") + 1)))
      .drop("band")
    val b = d.select(col("doc_id").as("doc_b"), col("source"), col("wset").as("wb"), col("band").as("jband"))
    val inter = graft.functions.ArrayExprs.sortedIntersectCount(col("wa"), col("wb"))
    val out = a.join(b, Seq("source", "jband"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard", inter.cast(DoubleType) / (size(col("wa")) + size(col("wb")) - inter))
      .filter(col("jaccard") >= 0.8)
      .select(col("doc_a"), col("doc_b"), col("source"), col("jaccard"))
    materialized(out, Seq("doc_a", "doc_b"), d)
  }

  val dedupJaccardSql: String =
    """WITH s AS (
      |  SELECT doc_id, source, list_distinct(string_split(text, ' ')) AS wset FROM documents
      |)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.source,
      |  CAST(len(list_intersect(a.wset, b.wset)) AS DOUBLE) / len(list_distinct(list_concat(a.wset, b.wset))) AS jaccard
      |FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.wset, b.wset)) AS DOUBLE) / len(list_distinct(list_concat(a.wset, b.wset))) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- minhash + LSH

  /** The permutation modulus MUST match the element-hash universe:
    * with p far above the universe (say 2^61-1 over 2^31 hashes),
    * a*h+b barely wraps, the affine maps are near-monotone in h, every
    * "permutation" shares one argmin, and the estimator collapses to a
    * single bit. p = 2^31-1 (prime) over h ∈ [0, p) wraps ~2^31 times
    * → a genuine 2-universal permutation family. PropertySpec pins the
    * estimator against exact Jaccard to keep this honest.
    */
  private[graft] val MinHashPrime = 2147483647L // 2^31 - 1
  private val NumPerms = 64
  private val NumBands = 16
  private val RowsPerBand = 4
  private val VerifyThreshold = 0.8

  /** Deterministic affine-permutation params (seed 42):
    * a ∈ [1, p-1], b ∈ [0, p-1]; a*h < 2^62 stays exact in Long.
    */
  private[graft] val perms: Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NumPerms)((
      (rnd.nextInt(Int.MaxValue - 1) + 1).toLong,
      rnd.nextInt(Int.MaxValue).toLong,
    ))
  }

  /** MinHash signature column over a distinct-shingle array column.
    * Element hashes land in [0, p) so the codegen'd kernel's
    * `(a*h + b) % p` is overflow-free and equals `pmod` (all operands
    * non-negative).
    */
  private[graft] def signature(shingleCol: Column): Column = {
    val hs = transform(shingleCol, s => pmod(hash(s).cast(LongType), lit(MinHashPrime)))
    graft.functions.ArrayExprs.minhashSig(hs, perms.map(_._1).toArray, perms.map(_._2).toArray, MinHashPrime)
  }

  /** (band_idx, band_key) structs of a precomputed signature column —
    * shared by the batch band relation and the streaming near-dup
    * candidate operator so both index identically.
    */
  private[graft] def bandArrayOf(sig: Column): Column =
    transform(
      sequence(lit(0), lit(NumBands - 1)),
      b => struct(
        b.cast(IntegerType).as("band_idx"),
        xxhash64(slice(sig, b * RowsPerBand + 1, lit(RowsPerBand))).as("band_key"),
      ),
    )

  /** §2.3 #24d — LSH banding TUNING audit: the (bands × rows) choice
    * IS the MinHash design decision (it places the S-curve), and this
    * op measures it empirically on the actual corpus instead of
    * trusting the formula: the SAME 64-perm signature is banded three
    * ways — 32×2, 16×4 (the production config), 8×8 — and each config
    * reports its candidate load, exact-verified pair count at J ≥ 0.8,
    * measured precision, and the theoretical collision probability at
    * the threshold. Because the configs NEST (an 8-row band match
    * implies both 4-row halves match, which imply the 2-row quarters),
    * candidate/verified sets are strictly ⊆-ordered — more, narrower
    * bands buy recall with candidate load; the audit shows exactly how
    * much of each on this corpus.
    *
    * Scale shape: signatures computed once (map-side codegen kernel),
    * three band-keyed self-joins of the usual bounded shape; per-config
    * results are two scalar counts (bounded driver collect). Rows-only
    * by design (xxhash64 band keys); ScalaTest pins the nesting order,
    * the 16×4 row's equality with `dedup_minhash_lsh`, and the theory
    * column's closed form.
    */
  def dedupLshTune(spark: SparkSession, dir: String): DataFrame = {
    val configs = Seq((32, 2), (16, 4), (8, 8))
    val d = docs(spark, dir).select(col("doc_id"), shingles.as("sh")).cache()
    // r16 fusion: the three configs NEST (an 8-row band is two 4-row
    // halves is four 2-row quarters), so the 32×2 candidate set is a
    // superset of the other two and ONE self-join at the finest
    // banding decides all three — each exploded row carries, next to
    // its own 2-row key, the keys of its ENCLOSING 16×4 and 8×8
    // bands; a pair is a 16×4 (8×8) candidate iff any colliding
    // quarter agrees on the enclosing k4 (k8). The previous shape ran
    // three band self-joins + three exact-verify joins + six count
    // actions; this runs one of each, and one scalar aggregation
    // yields all six counts. Identical sets: a wider-band key match
    // is slice equality (xxhash64 of equal slices), which forces
    // every quarter to collide with equal enclosing keys.
    val q4 = (bi: Column) => (bi / lit(2)).cast(IntegerType)
    val q8 = (bi: Column) => (bi / lit(4)).cast(IntegerType)
    val bandArr = transform(
      sequence(lit(0), lit(31)),
      bi => struct(
        bi.cast(IntegerType).as("band_idx"),
        xxhash64(slice(col("sig"), bi * 2 + 1, lit(2))).as("k2"),
        xxhash64(slice(col("sig"), q4(bi) * 4 + 1, lit(4))).as("k4"),
        xxhash64(slice(col("sig"), q8(bi) * 8 + 1, lit(8))).as("k8")))
    val bands = d.withColumn("sig", signature(col("sh")))
      .select(col("doc_id"), explode(bandArr).as("b"))
      .select(col("doc_id"), col("b.band_idx").as("band_idx"),
        col("b.k2").as("k2"), col("b.k4").as("k4"), col("b.k8").as("k8"))
      .cache()
    val pairs = bands
      .select(col("doc_id").as("doc_a"), col("band_idx"), col("k2"),
        col("k4").as("k4a"), col("k8").as("k8a"))
      .join(bands.select(col("doc_id").as("doc_b"), col("band_idx"), col("k2"),
        col("k4").as("k4b"), col("k8").as("k8b")),
        Seq("band_idx", "k2"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(
        max(when(col("k4a") === col("k4b"), 1L).otherwise(0L)).as("in4"),
        max(when(col("k8a") === col("k8b"), 1L).otherwise(0L)).as("in8"))
    val counts = pairs
      .join(d.select(col("doc_id").as("doc_a"), col("sh").as("sha_")), "doc_a")
      .join(d.select(col("doc_id").as("doc_b"), col("sh").as("shb_")), "doc_b")
      .select(col("in4"), col("in8"),
        when(jaccard(col("sha_"), col("shb_")) >= VerifyThreshold, 1L).otherwise(0L).as("ver"))
      .agg(
        count(lit(1)).as("c2"), sum(col("in4")).as("c4"), sum(col("in8")).as("c8"),
        sum(col("ver")).as("v2"), sum(col("in4") * col("ver")).as("v4"),
        sum(col("in8") * col("ver")).as("v8"))
      .head()
    d.unpersist(); bands.unpersist()
    def cnt(i: Int): Long = if (counts.isNullAt(i)) 0L else counts.getLong(i)
    val perCfg = Map(2 -> (cnt(0), cnt(3)), 4 -> (cnt(1), cnt(4)), 8 -> (cnt(2), cnt(5)))
    val rows = configs.map { case (b, r) =>
      val (nCand, nVer) = perCfg(r)
      val theory = math.floor(
        (1 - math.pow(1 - math.pow(VerifyThreshold, r), b)) * 1e6 + 0.5).toLong
      // zero candidates → NULL precision, not 1e6: an empty config
      // must not read as perfect precision and rank best in the audit
      (s"${b}x$r", b.toLong, r.toLong, nCand, nVer,
        if (nCand == 0) None else Some(nVer * 1000000L / nCand), theory)
    }
    import spark.implicits._
    rows.toDF("cfg", "n_bands", "rows_per_band", "n_candidates", "n_verified",
      "precision_ppm", "theory_recall_ppm")
      .orderBy("rows_per_band")
  }

  /** Exploded (doc_id, band_idx, band_key) relation. The 4-long band
    * slice is collapsed to one 64-bit hash before the shuffle — a
    * quarter of the shuffle bytes, and a band-hash collision can only
    * add a candidate that exact-Jaccard verification then rejects.
    */
  private def bandRows(d: DataFrame): DataFrame =
    d.withColumn("sig", signature(col("sh")))
      .select(col("doc_id"), col("sh"), explode(bandArrayOf(col("sig"))).as("band"))
      .select(col("doc_id"), col("sh"), col("band.band_idx").as("band_idx"), col("band.band_key").as("band_key"))

  /** §2.3 #24 — MinHash + LSH banding: 64 perms, 16 bands × 4 rows →
    * candidate pairs sharing any band, then exact-Jaccard verified at
    * 0.8 (so precision is 1.0 by construction; recall at s=0.9 is
    * 1-(1-0.9⁴)¹⁶ ≈ 1-2e-4). The oracle is the exact all-pairs
    * computation — valid because verified candidates ⊆ exact pairs and
    * the band parameters make a miss at ≥0.8 similarity vanishingly
    * unlikely (and deterministic, given the fixed perms).
    */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    // cached: both sides of the band self-join (and the verify joins)
    // would otherwise recompute shingling + signatures from scratch
    val d = docs(spark, dir).select(col("doc_id"), shingles.as("sh")).cache()
    val bands = bandRows(d).drop("sh").cache()
    val candidates = bands
      .select(col("doc_id").as("doc_a"), col("band_idx"), col("band_key"))
      .join(
        bands.select(col("doc_id").as("doc_b"), col("band_idx"), col("band_key")),
        Seq("band_idx", "band_key"),
      )
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    val sa = d.select(col("doc_id").as("doc_a"), col("sh").as("sha_"))
    val sb = d.select(col("doc_id").as("doc_b"), col("sh").as("shb_"))
    val out = candidates
      .join(sa, "doc_a")
      .join(sb, "doc_b")
      .withColumn("jaccard", jaccard(col("sha_"), col("shb_")))
      .filter(col("jaccard") >= VerifyThreshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    materialized(out, Seq("doc_a", "doc_b"), d, bands)
  }

  val dedupMinhashLshSql: String =
    """WITH w AS (
      |  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
      |), s AS (
      |  SELECT doc_id,
      |    CASE WHEN len(ws) >= 3
      |      THEN list_distinct(list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
      |      ELSE [text] END AS sh
      |  FROM w
      |)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
      |FROM s a JOIN s b ON a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  /** §2.3 #24c — EXACT n-gram Jaccard similarity join via prefix
    * filtering (the AllPairs/PPJoin family): each doc's distinct
    * shingles are globally ordered rarest-first (by document
    * frequency), and only the first `n - ⌈t·n⌉ + 1` shingles are
    * indexed. The prefix-filtering lemma makes candidate generation
    * LOSSLESS: two sets with J ≥ t must collide inside these prefixes
    * under any shared total order, so unlike MinHash there is no
    * recall parameter — the output IS the exact similarity join.
    *
    * Scale shape: doc-frequency count (one shuffle, map-side combine),
    * per-doc prefix (one window over doc_id), then a self-join keyed
    * on RARE shingles — rarest-first ordering means hot n-grams never
    * enter an index prefix unless a doc is nearly all stopword grams,
    * so posting lists stay short and the candidate pair space stays
    * near-linear. Verification reuses the codegen'd sorted-intersect
    * kernel on xxhash64'd shingles.
    */
  def ngramJaccardPairs(d0: DataFrame, t: Double): DataFrame = {
    val d = d0
      .select(col("doc_id"), array_sort(array_distinct(transform(col("sh"), g => xxhash64(g)))).as("hs"))
      .withColumn("n", size(col("hs")))
      .cache()
    val posts = d.select(col("doc_id"), col("n"), explode(col("hs")).as("g"))
    val dfreq = posts.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))
    // ⌈t·n⌉ in exact terms: fp can round n*t up past the true integer
    // (shrinking the prefix and breaking the lossless guarantee), so
    // shave an epsilon below any representable fp drift before ceil —
    // an undershoot only lengthens the prefix, which stays lossless
    val prefixes = posts
      .join(dfreq, "g")
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") <= col("n") - ceil(col("n") * t - lit(1e-9)) + 1)
      .select(col("doc_id"), col("g"))
    val cand = prefixes.select(col("doc_id").as("doc_a"), col("g"))
      .join(prefixes.select(col("doc_id").as("doc_b"), col("g")), Seq("g"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    val inter = graft.functions.ArrayExprs.sortedIntersectCount(col("ha"), col("hb"))
    val out = cand
      .join(d.select(col("doc_id").as("doc_a"), col("hs").as("ha"), col("n").as("na")), "doc_a")
      .join(d.select(col("doc_id").as("doc_b"), col("hs").as("hb"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard", inter.cast(DoubleType) / (col("na") + col("nb") - inter))
      .filter(col("jaccard") >= t)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    // materialize the (near-dup-sized, small) pair output while `d` is
    // cached, then release the full hs-array corpus cache — returning
    // the lazy plan instead would pin it for the session's lifetime
    materialized(out, Seq("doc_a", "doc_b"), d)
  }

  /** named query: exact global 3-gram-shingle Jaccard join at 0.8 —
    * same semantics as `dedup_minhash_lsh`'s oracle, but guaranteed
    * (lossless candidates) rather than probabilistic.
    */
  def dedupNgramExact(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardPairs(docs(spark, dir).select(col("doc_id"), shingles.as("sh")), VerifyThreshold)

  val dedupNgramExactSql: String = dedupMinhashLshSql

  // ---------------------------------------------------------------- containment

  /** §2.3 #26o — asymmetric containment join: ordered pairs (a, b)
    * with |G(a) ∩ G(b)| / |G(a)| ≥ 0.8 over distinct 3-gram shingles
    * — the quote/subset detector Jaccard misses (a short doc embedded
    * verbatim in a much longer one has low Jaccard but containment
    * ≈ 1), the asymmetric-dedup primitive behind "drop docs that are
    * mostly a substring of another".
    *
    * Candidates by the overlap prefix filter (Chaudhuri'06 / PPJoin
    * family, containment form): to reach overlap ⌈τ·n_a⌉, doc a must
    * share one of its (n_a − ⌈τ·n_a⌉ + 1) globally-rarest grams with
    * b — so only a's rarest-first prefix joins the full posting list
    * (the b side can't be prefix-pruned: containment is one-sided).
    * Lossless by the pigeonhole, exactly like `dedup_ngram_exact`'s
    * symmetric variant; same fp-exactness bound on hashed grams.
    * Verification is the codegen two-pointer intersect; the final
    * containment is ONE IEEE division (inter / n_a), bit-identical in
    * DuckDB, and candidates ⊆ exact pairs keeps the oracle valid.
    *
    * Scale: gram signatures map-side, df counts one agg, prefix join
    * shuffles 8-byte gram keys; the posting-list side is the scale
    * knob — rarest-first prefixes keep common grams out of the join
    * key set, so posting skew only enters through genuinely-shared
    * rare grams (true near-dup mass).
    */
  /** Containment core over any (doc_id, sh: array<string>) frame —
    * see [[dedupContainment]] for semantics and scale notes.
    */
  def containmentPairs(d0: DataFrame, t: Double): DataFrame = {
    val d = d0
      .select(col("doc_id"), array_sort(array_distinct(transform(col("sh"), g => xxhash64(g)))).as("hs"))
      .withColumn("n", size(col("hs")))
      .cache()
    val posts = d.select(col("doc_id"), explode(col("hs")).as("g"))
    val dfreq = posts.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("g"))
    val prefixes = posts
      .join(dfreq, "g")
      .join(d.select(col("doc_id"), col("n")), "doc_id")
      .withColumn("pos", row_number().over(w))
      .filter(col("pos") <= col("n") - ceil(col("n") * t - lit(1e-9)) + 1)
      .select(col("doc_id"), col("g"))
    val cand = prefixes.select(col("doc_id").as("doc_a"), col("g"))
      .join(posts.select(col("doc_id").as("doc_b"), col("g")), Seq("g"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    val inter = graft.functions.ArrayExprs.sortedIntersectCount(col("ha"), col("hb"))
    val out = cand
      .join(d.select(col("doc_id").as("doc_a"), col("hs").as("ha"), col("n").as("na")), "doc_a")
      .join(d.select(col("doc_id").as("doc_b"), col("hs").as("hb")), "doc_b")
      .withColumn("containment", inter.cast(DoubleType) / col("na"))
      .filter(col("containment") >= t)
      .select(col("doc_a"), col("doc_b"), col("containment"))
    materialized(out, Seq("doc_a", "doc_b"), d)
  }

  /** named query: containment over the documents 3-gram shingles. */
  def dedupContainment(spark: SparkSession, dir: String): DataFrame =
    containmentPairs(docs(spark, dir).select(col("doc_id"), shingles.as("sh")), VerifyThreshold)

  val dedupContainmentSql: String =
    """WITH w AS (
      |  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
      |), s AS (
      |  SELECT doc_id,
      |    CASE WHEN len(ws) >= 3
      |      THEN list_distinct(list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
      |      ELSE [text] END AS sh
      |  FROM w
      |)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh) AS containment
      |FROM s a JOIN s b ON a.doc_id <> b.doc_id
      |WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / len(a.sh) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---------------------------------------------------------------- incremental

  /** §2.3 #24b — incremental corpus dedup: the production pattern where
    * a corpus's MinHash band index is built ONCE and each new ingest
    * batch is checked against it (no corpus self-join, no re-signing of
    * old data). Demo split: `doc_id % 10 == 0` is the arriving batch,
    * the rest is the standing corpus. Candidates come from joining the
    * batch's band rows against the corpus band index — the batch side is
    * small, so at scale this is a broadcast against the bucketed index —
    * then exact-Jaccard verification picks the best corpus match per new
    * doc ((jaccard desc, dup_of asc) tiebreak → deterministic).
    *
    * Output: every batch doc with `is_dup` and its best match (null
    * when none). Oracle = exact batch×corpus Jaccard (valid for the
    * same reason as `dedup_minhash_lsh`: verified candidates ⊆ exact
    * pairs and band recall at the 0.8 threshold is 1−(1−0.8⁴)¹⁶ ≈
    * 0.9998 per pair, deterministic given the fixed perms).
    */
  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .select(col("doc_id"), shingles.as("sh"), (col("doc_id") % 10 === 0).as("is_new"))
      .cache()
    val corpus = d.filter(!col("is_new"))
    val batch = d.filter(col("is_new"))
    val corpusBands = bandRows(corpus).drop("sh") // the persistent index
    val batchBands = bandRows(batch).drop("sh")
    val candidates = batchBands
      .select(col("doc_id"), col("band_idx"), col("band_key"))
      .join(
        corpusBands.select(col("doc_id").as("dup_of"), col("band_idx"), col("band_key")),
        Seq("band_idx", "band_key"),
      )
      .select("doc_id", "dup_of")
      .distinct()
    val verified = candidates
      .join(batch.select(col("doc_id"), col("sh").as("sh_n")), "doc_id")
      .join(corpus.select(col("doc_id").as("dup_of"), col("sh").as("sh_c")), "dup_of")
      .withColumn("jaccard", jaccard(col("sh_n"), col("sh_c")))
      .filter(col("jaccard") >= VerifyThreshold)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("jaccard").desc, col("dup_of"))
    val best = verified
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("dup_of"), col("jaccard"))
    val out = batch.select(col("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of").isNotNull.as("is_dup"), col("dup_of"), col("jaccard"))
    materialized(out, Seq("doc_id"), d)
  }

  val dedupIncrementalSql: String =
    """WITH w AS (
      |  SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents
      |), s AS (
      |  SELECT doc_id,
      |    CASE WHEN len(ws) >= 3
      |      THEN list_distinct(list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
      |      ELSE [text] END AS sh
      |  FROM w
      |), batch AS (SELECT * FROM s WHERE doc_id % 10 = 0),
      |corpus AS (SELECT * FROM s WHERE doc_id % 10 <> 0),
      |m AS (
      |  SELECT n.doc_id, c.doc_id AS dup_of,
      |    CAST(len(list_intersect(n.sh, c.sh)) AS DOUBLE) / len(list_distinct(list_concat(n.sh, c.sh))) AS jaccard
      |  FROM batch n JOIN corpus c ON
      |    CAST(len(list_intersect(n.sh, c.sh)) AS DOUBLE) / len(list_distinct(list_concat(n.sh, c.sh))) >= 0.8
      |), r AS (
      |  SELECT doc_id, dup_of, jaccard,
      |    row_number() OVER (PARTITION BY doc_id ORDER BY jaccard DESC, dup_of) AS rk
      |  FROM m
      |)
      |SELECT b.doc_id, r.dup_of IS NOT NULL AS is_dup, r.dup_of, r.jaccard
      |FROM batch b LEFT JOIN (SELECT doc_id, dup_of, jaccard FROM r WHERE rk = 1) r USING (doc_id)
      |ORDER BY b.doc_id""".stripMargin

  // ---------------------------------------------------------------- fuzzy match

  /** Approximate string join on arbitrary (name) frames: pairs of
    * distinct values within levenshtein distance `maxDist`.
    *
    * Blocking is lossless length banding: edit distance ≤ d bounds the
    * length difference by d, so with band width d+1 a qualifying
    * partner sits in the same or an adjacent band. One side explodes
    * to its 3 candidate bands, the other keeps its single band — a
    * plain equi-join on the band key, no cross join at any scale; the
    * `a < b` orientation on the exploding side yields each pair exactly
    * once.
    */
  def fuzzyPairs(names: DataFrame, maxDist: Int): DataFrame = {
    val bandW = maxDist + 1
    val d = names.select(col("name")).distinct()
      .withColumn("band", (length(col("name")) / bandW).cast(IntegerType))
    val a = d.select(col("name").as("name_a"), col("band"))
      .withColumn("jband", explode(array(col("band") - 1, col("band"), col("band") + 1)))
      .drop("band")
    val b = d.select(col("name").as("name_b"), col("band").as("jband"))
    a.join(b, Seq("jband"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast(LongType))
      .filter(col("dist") <= maxDist)
      .select(col("name_a"), col("name_b"), col("dist"))
      .orderBy("name_a", "name_b")
  }

  /** §2.3 #23c — named query: part names within edit distance 2 (the
    * record-linkage / catalog-entity near-match primitive).
    */
  def dedupFuzzy(spark: SparkSession, dir: String): DataFrame =
    fuzzyPairs(table(spark, dir, "part").select(col("p_name").as("name")), 2)

  val dedupFuzzySql: String =
    """WITH n AS (SELECT DISTINCT p_name AS name FROM part)
      |SELECT a.name AS name_a, b.name AS name_b,
      |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
      |FROM n a JOIN n b ON a.name < b.name AND levenshtein(a.name, b.name) <= 2
      |ORDER BY name_a, name_b""".stripMargin

  // ---------------------------------------------------------------- simhash

  /** Per-doc 62-bit SimHash relation (Charikar'02): one aggregate pass
    * accumulates per-bit +1/-1 counts over word hashes, a second packs
    * sign bits. Pure codegen'd higher-order exprs; a custom
    * TypedImperativeAggregate would shave constants but not the
    * complexity.
    */
  private def simhashDf(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        col("doc_id"),
        graft.functions.ArrayExprs
          .simhash62(transform(words, w => xxhash64(w)))
          .as("simhash"),
      )
  // deliberately NOT cached: the signature is one codegen map pass, so
  // each side of the segment self-join recomputing it from the scan is
  // cheaper than a cache round-trip (and at corpus scale, pinning the
  // full signature table in executor memory is the wrong trade — two
  // streaming scans beat a spill-prone cache)

  /** §2.3 #25 — SimHash near-dup pairs at hamming ≤ 3, via the 4-way
    * segment pigeonhole (a pair within hamming 3 must agree on ≥1 of 4
    * disjoint segments, so candidates join on segment equality).
    * Engine-specific hash → rows-only check + ScalaTest.
    */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    dedupSimhashOn(simhashDf(spark, dir)).orderBy("doc_a", "doc_b")

  private def dedupSimhashOn(d: DataFrame): DataFrame = {
    val segs = d.select(
      col("doc_id"),
      col("simhash"),
      explode(
        array((0 until 4).map(j =>
          struct(lit(j).as("seg_idx"), pmod(shiftright(col("simhash"), j * 16), lit(65536L)).as("seg_val"))): _*)
      ).as("seg"),
    ).select(col("doc_id"), col("simhash"), col("seg.seg_idx").as("seg_idx"), col("seg.seg_val").as("seg_val"))
    segs
      .select(col("doc_id").as("doc_a"), col("simhash").as("sim_a"), col("seg_idx"), col("seg_val"))
      .join(
        segs.select(col("doc_id").as("doc_b"), col("simhash").as("sim_b"), col("seg_idx"), col("seg_val")),
        Seq("seg_idx", "seg_val"),
      )
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast(LongType).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
  }

  // ---------------------------------------------------------------- duplicate spans

  /** §2.3 #25b — duplicated-span detection at 10-gram granularity (the
    * distributable form of exact-substring training-data dedup: a
    * duplicated substring of ≥ 10 words is exactly a run of duplicated
    * 10-grams). A gram is "duplicated" when it occurs more than once in
    * the corpus — including twice in the same document; each doc
    * reports its duplicated-gram ratio, the fraction of its content
    * that exists elsewhere.
    *
    * Scale shape: grams are xxhash64'd map-side so the corpus-frequency
    * groupBy and the posting join shuffle 8-byte keys, never gram
    * strings (~70 bytes each); both aggregations are partial
    * (map-side combine). Collisions at 64 bits are ~n²/2⁶⁵ — no
    * engine-visible hash reaches the output, so the DuckDB oracle
    * groups the gram strings themselves and must agree wherever no
    * collision occurs.
    */
  def dedupSpans(spark: SparkSession, dir: String): DataFrame = {
    val grams10 = graft.functions.ArrayExprs.wordNgrams(words, 10)
    val posts = docs(spark, dir)
      .select(col("doc_id"), explode(transform(grams10, g => xxhash64(g))).as("g"))
    val gfreq = posts.groupBy(col("g")).agg(count(lit(1)).as("cnt"))
    posts
      .join(gfreq, "g")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        sum((col("cnt") > 1).cast(LongType)).as("n_dup_grams"),
      )
      .withColumn("dup_ratio", col("n_dup_grams").cast(DoubleType) / col("n_grams"))
      .withColumn("is_mostly_dup", col("dup_ratio") >= 0.5)
      .orderBy("doc_id")
  }

  val dedupSpansSql: String = {
    val gram10 = (0 until 10).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
    s"""WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
      |g AS (
      |  SELECT doc_id, unnest(
      |    CASE WHEN len(ws) >= 10 THEN list_transform(range(1, len(ws) - 8), i -> $gram10)
      |    ELSE [text] END) AS g
      |  FROM w
      |), c AS (SELECT g, count(*) AS cnt FROM g GROUP BY g)
      |SELECT doc_id,
      |  count(*) AS n_grams,
      |  CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
      |  CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS dup_ratio,
      |  CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) >= 0.5 AS is_mostly_dup
      |FROM g JOIN c USING (g)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact" -> (dedupExact _),
    "dedup_profile" -> (dedupProfile _),
    "dedup_jaccard" -> (dedupJaccard _),
    "dedup_minhash_lsh" -> (dedupMinhashLsh _),
    "dedup_lsh_tune" -> (dedupLshTune _),
    "dedup_ngram_exact" -> (dedupNgramExact _),
    "dedup_containment" -> (dedupContainment _),
    "dedup_simhash" -> (dedupSimhash _),
    "dedup_incremental" -> (dedupIncremental _),
    "dedup_fuzzy" -> (dedupFuzzy _),
    "dedup_spans" -> (dedupSpans _),
  )

  val oracles: Map[String, String] = Map(
    "dedup_exact" -> dedupExactSql,
    "dedup_profile" -> dedupProfileSql,
    "dedup_jaccard" -> dedupJaccardSql,
    "dedup_minhash_lsh" -> dedupMinhashLshSql,
    "dedup_ngram_exact" -> dedupNgramExactSql,
    "dedup_containment" -> dedupContainmentSql,
    "dedup_incremental" -> dedupIncrementalSql,
    "dedup_fuzzy" -> dedupFuzzySql,
    "dedup_spans" -> dedupSpansSql,
    // dedup_simhash: engine-specific xxhash64 → rows-only check
  )
}
