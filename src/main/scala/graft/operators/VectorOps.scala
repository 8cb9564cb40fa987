package graft.operators

import graft.GraftSession.table
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2.4 + §2.3 #26 — similarity search over `embeddings`
  * (64-dim unit-norm float vectors).
  *
  * Cross-engine determinism trick: scores are computed on
  * round(x*10000) int64-quantized vectors — dot products and norms are
  * then exact integers, and the final double division/sqrt is
  * correctly-rounded IEEE on both engines, so cosine values (and
  * threshold/top-k decisions) hash-match DuckDB bit-for-bit. The
  * quantization error (~1e-4) is far below any semantic threshold.
  *
  * Scale paths: brute-force is the exact baseline (O(n·q)); LSH
  * (random-hyperplane, Charikar'02) and IVF (coarse-quantizer probe,
  * Jégou'11) bound the candidate set — their shuffles are on bucket /
  * centroid keys, and centroids are broadcast.
  */
object VectorOps {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")

  /** int64-quantized copy of the embedding.
    *
    * floor(x*10000 + 0.5), NOT round(): Spark's round() rounds the
    * shortest decimal repr while DuckDB rounds the binary double — they
    * disagree when the binary value sits just below x.5 but its
    * shortest repr is "x.5" (observed at sf0.1). floor(+0.5) is pure
    * binary IEEE arithmetic, bit-identical in both engines.
    *
    * The float element is explicitly widened to double BEFORE the
    * multiply: without the cast one engine multiplies in float32 and
    * the other in float64, shifting an occasional element by ±1
    * quantum (also observed at sf0.1).
    */
  private val qvec: Column =
    transform(col("embedding"), x => floor(x.cast(DoubleType) * 10000 + 0.5).cast(LongType))

  /** exact integer dot product of two quantized vectors — a codegen'd
    * Catalyst expression ([[graft.functions.LongArrayDot]]); the
    * higher-order `aggregate(zip_with(...))` formulation is interpreted
    * and ~100× slower on the n² pair space.
    */
  private def qdot(a: Column, b: Column): Column =
    graft.functions.ArrayExprs.longDot(a, b)

  /** deterministic cosine from quantized ints. */
  private def qcos(a: Column, b: Column): Column =
    qdot(a, b).cast(DoubleType) / (sqrt(qdot(a, a).cast(DoubleType)) * sqrt(qdot(b, b).cast(DoubleType)))

  private def pairs(spark: SparkSession, dir: String, queryFilter: Column): DataFrame = {
    // norms are computed once per vector, not per pair (at n vectors the
    // pair space is n² — anything per-pair beyond the single dot product
    // multiplies the dominant term)
    val d = emb(spark, dir).select(col("vec_id"), qvec.as("qv"))
      .withColumn("norm", sqrt(qdot(col("qv"), col("qv")).cast(DoubleType)))
      .cache() // both sides of the pair join read this
    val q = d.filter(queryFilter)
      .select(col("vec_id").as("query_id"), col("qv").as("qa"), col("norm").as("na"))
    val c = d.select(col("vec_id").as("neighbor_id"), col("qv").as("qb"), col("norm").as("nb"))
    q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", qdot(col("qa"), col("qb")).cast(DoubleType) / (col("na") * col("nb")))
      .select("query_id", "neighbor_id", "cosine")
  }

  // --------------------------------------------------- LSH hyperplanes
  // (shared by dedup_embedding and ann_lsh)

  private val NumTables = 8
  private val BitsPerTable = 4

  /** Deterministic random hyperplanes (seed 7): NumTables × BitsPerTable
    * planes of 64 coords each, as literal columns (broadcast-free —
    * they live in the plan).
    */
  private val planes: Seq[Seq[Array[Double]]] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(NumTables)(Seq.fill(BitsPerTable)(Array.fill(64)(rnd.nextGaussian())))
  }

  /** int64-quantized planes: bucket bits become exact integer sign
    * tests (qv · qplane), reproducible bit-for-bit in DuckDB SQL.
    */
  private val qplanes: Seq[Seq[Array[Long]]] =
    planes.map(_.map(_.map(x => math.floor(x * 10000 + 0.5).toLong)))

  private def qsignBit(qv: Column, p: Array[Long]): Column =
    when(qdot(qv, array(p.map(lit(_)): _*)) >= 0, 1).otherwise(0)

  /** integer-exact bucket id of quantized vector `qv` in table `t`. */
  private def qbucketIn(qv: Column, t: Int): Column =
    qplanes(t).zipWithIndex.map { case (p, bit) => qsignBit(qv, p) * (1 << bit) }.reduce(_ + _)

  private val oracleQuantCte: String =
    """WITH q AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS qv
      |  FROM embeddings
      |), p AS (
      |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      |    CAST(list_sum(list_transform(range(1, 65), i -> a.qv[i] * b.qv[i])) AS DOUBLE)
      |      / (sqrt(CAST(list_sum(list_transform(range(1, 65), i -> a.qv[i] * a.qv[i])) AS DOUBLE))
      |         * sqrt(CAST(list_sum(list_transform(range(1, 65), i -> b.qv[i] * b.qv[i])) AS DOUBLE))) AS cosine
      |  FROM q a JOIN q b ON a.vec_id != b.vec_id
      |)""".stripMargin

  /** §2.4 #27 — exact brute-force cosine top-k (k=5) for the first 20
    * vectors as queries; ties broken by neighbor id.
    */
  def annBruteforce(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    pairs(spark, dir, col("vec_id") < 20)
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy("query_id", "rank")
  }

  val annBruteforceSql: String =
    s"""$oracleQuantCte
      |SELECT query_id, CAST(rank AS BIGINT) AS rank, neighbor_id, cosine FROM (
      |  SELECT query_id, neighbor_id, cosine,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      |  FROM p WHERE query_id < 20
      |)
      |WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin

  /** §2.3 #26 — embedding near-dup: each vector's nearest LSH-bucketed
    * candidate + a duplicate flag at cosine ≥ 0.5.
    *
    * Scale design: the only wide ops are the (tbl, bucket) self-join
    * and the pair dedup — NO all-pairs cartesian (an n² BNLJ cannot
    * survive 100×; round-1 lesson). Near-dups (the pairs the flag is
    * for) collide in some bucket with probability ≈ 1; a vector whose
    * true NN is far away may report its best *candidate* instead —
    * exactly the LSH trade, and the DuckDB oracle mirrors the same
    * buckets so the contract is still hash-exact.
    *
    * Cross-engine determinism: bucket bits are sign tests on int64
    * dot products of the quantized vector against int64-quantized
    * hyperplanes — exact integer math, bit-identical in both engines
    * (a float-dot sign would flip on summation-order differences).
    */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    val d = emb(spark, dir)
      .select(col("vec_id"), qvec.as("qv"))
      .withColumn("norm", sqrt(qdot(col("qv"), col("qv")).cast(DoubleType)))
      .select(
        col("vec_id"), col("qv"), col("norm"),
        explode(array((0 until NumTables).map(t =>
          struct(lit(t).as("tbl"), qbucketIn(col("qv"), t).as("bucket"))): _*)).as("b"),
      )
      .select(col("vec_id"), col("qv"), col("norm"), col("b.tbl").as("tbl"), col("b.bucket").as("bucket"))
      .cache() // both sides of the bucket self-join read this
    val q = d.select(col("vec_id").as("query_id"), col("qv").as("qa"), col("norm").as("na"), col("tbl"), col("bucket"))
    val c = d.select(col("vec_id").as("neighbor_id"), col("qv").as("qb"), col("norm").as("nb"), col("tbl"), col("bucket"))
    // Cosine is computed map-side right after the bucket join and the
    // pair is immediately projected to 3 narrow columns: shuffling the
    // 64-long arrays through a dedup + window was the dominant cost
    // (wide-row shuffles). A pair colliding in k tables computes its
    // dot k times — map-side codegen'd work, far cheaper than a wide
    // shuffle — and collapses in the aggregate below.
    val scored = q.join(c, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(
        col("query_id"),
        col("neighbor_id"),
        (qdot(col("qa"), col("qb")).cast(DoubleType) / (col("na") * col("nb"))).as("cosine"),
      )
    // argmax via max(struct(cosine, -id)): partial aggregation (map-side
    // combine) replaces a row_number window — same (cosine DESC, id ASC)
    // tie-break, one narrow shuffle.
    scored
      .groupBy(col("query_id").as("vec_id"))
      .agg(max(struct(col("cosine"), (-col("neighbor_id")).as("nid"))).as("m"))
      .select(
        col("vec_id"),
        (-col("m.nid")).as("nearest_id"),
        col("m.cosine").as("cosine"),
        (col("m.cosine") >= 0.5).as("is_near_dup"),
      )
      .orderBy("vec_id")
  }

  /** `[p0, p1, ...]` DuckDB list literal of one quantized plane. */
  private def qplaneSqlList(p: Array[Long]): String = p.mkString("[", ", ", "]")

  /** bucket id of `qv` in table `t` as DuckDB SQL — same integer sign
    * tests as [[qbucketIn]].
    */
  private def bucketSql(t: Int): String =
    qplanes(t).zipWithIndex.map { case (p, bit) =>
      s"(CASE WHEN list_sum(list_transform(range(1, 65), i -> qv[i] * ${qplaneSqlList(p)}[i])) >= 0 THEN ${1 << bit} ELSE 0 END)"
    }.mkString(" + ")

  lazy val dedupEmbeddingSql: String = {
    val bucketSelects = (0 until NumTables)
      .map(t => s"  SELECT vec_id, qv, norm, $t AS tbl, ${bucketSql(t)} AS bucket FROM n")
      .mkString("\n  UNION ALL\n")
    s"""WITH q AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 10000 + 0.5) AS BIGINT)) AS qv
       |  FROM embeddings
       |), n AS (
       |  SELECT vec_id, qv, sqrt(CAST(list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i])) AS DOUBLE)) AS norm
       |  FROM q
       |), b AS (
       |$bucketSelects
       |), cand AS (
       |  SELECT DISTINCT a.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM b a JOIN b c ON a.tbl = c.tbl AND a.bucket = c.bucket AND a.vec_id != c.vec_id
       |), scored AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    CAST(list_sum(list_transform(range(1, 65), i -> na.qv[i] * nb.qv[i])) AS DOUBLE) / (na.norm * nb.norm) AS cosine
       |  FROM cand JOIN n na ON na.vec_id = cand.query_id JOIN n nb ON nb.vec_id = cand.neighbor_id
       |)
       |SELECT query_id AS vec_id, neighbor_id AS nearest_id, cosine, cosine >= 0.5 AS is_near_dup FROM (
       |  SELECT query_id, neighbor_id, cosine,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
       |  FROM scored
       |)
       |WHERE rn = 1
       |ORDER BY vec_id""".stripMargin
  }

  // ---------------------------------------------------------------- LSH ANN

  private def planeLit(p: Array[Double]): Column = array(p.map(lit(_)): _*)

  private def signBit(v: Column, p: Array[Double]): Column =
    when(aggregate(zip_with(v, planeLit(p), (x, y) => x * y), lit(0.0d), (acc, x) => acc + x) >= 0, 1).otherwise(0)

  /** bucket id of vector `v` in table `t`. */
  private def bucketIn(v: Column, t: Int): Column =
    planes(t).zipWithIndex.map { case (p, i) => signBit(v, p) * (1 << i) }.reduce(_ + _)

  /** §2.4 #28 — random-hyperplane LSH ANN: 8 tables × 4 bits; a
    * query's candidates are all vectors sharing any bucket; exact
    * cosine re-rank within candidates. Engine-specific plan (float
    * dots) → rows-only + recall ScalaTest vs brute force.
    */
  def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val d = emb(spark, dir).select(
      col("vec_id"),
      qvec.as("qv"),
      explode(
        array((0 until NumTables).map(t => struct(lit(t).as("tbl"), bucketIn(col("embedding"), t).as("bucket"))): _*)
      ).as("b"),
    ).select(col("vec_id"), col("qv"), col("b.tbl").as("tbl"), col("b.bucket").as("bucket"))

    val q = d.filter(col("vec_id") < 20).select(col("vec_id").as("query_id"), col("qv").as("qa"), col("tbl"), col("bucket"))
    val c = d.select(col("vec_id").as("neighbor_id"), col("qv").as("qb"), col("tbl"), col("bucket"))
    val candidates = q
      .join(c, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qa", "neighbor_id", "qb")
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    candidates
      .withColumn("cosine", qcos(col("qa"), col("qb")))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy("query_id", "rank")
  }

  // ---------------------------------------------------------------- IVF ANN

  private val NumCentroids = 16
  private val NumProbes = 4

  /** §2.4 #29 — IVF-style ANN: coarse centroids (deterministic sample:
    * every 31st vector), inverted lists by nearest centroid, queries
    * probe the 4 nearest lists, exact re-rank inside. The centroid
    * table is broadcast (it is tiny by construction at any scale);
    * the inverted-list shuffle is on centroid id.
    */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir).select(col("vec_id"), qvec.as("qv"))
    val centroids = e
      .filter(pmod(col("vec_id"), lit(31)) === 0)
      .withColumn("centroid_id", (col("vec_id") / 31).cast(IntegerType))
      .filter(col("centroid_id") < NumCentroids)
      .select(col("centroid_id"), col("qv").as("cv"))

    // assign: nearest centroid per vector (broadcast join + argmax)
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("cdist").desc, col("centroid_id"))
    val assigned = e
      .join(broadcast(centroids), lit(true))
      .withColumn("cdist", qcos(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("qv"), col("centroid_id"))

    // probe: 4 nearest centroids per query
    val wProbe = Window.partitionBy(col("query_id")).orderBy(col("cdist").desc, col("centroid_id"))
    val probes = e
      .filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("qv").as("qa"))
      .join(broadcast(centroids), lit(true))
      .withColumn("cdist", qcos(col("qa"), col("cv")))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= NumProbes)
      .select(col("query_id"), col("qa"), col("centroid_id"))

    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    probes
      .join(assigned.select(col("centroid_id"), col("vec_id").as("neighbor_id"), col("qv").as("qb")), Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", qcos(col("qa"), col("qb")))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cosine"))
      .orderBy("query_id", "rank")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_bruteforce" -> (annBruteforce _),
    "dedup_embedding" -> (dedupEmbedding _),
    "ann_lsh" -> (annLsh _),
    "ann_ivf" -> (annIvf _),
  )

  val oracles: Map[String, String] = Map(
    "ann_bruteforce" -> annBruteforceSql,
    "dedup_embedding" -> dedupEmbeddingSql,
    // ann_lsh / ann_ivf: engine-specific candidate generation → rows-only + recall tests
  )
}
