package graft

import graft.functions.Winnowing
import graft.operators.{Dedup, VectorOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupVectorSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("minhash LSH finds exactly the exact-jaccard pairs (full recall on planted dups)") {
    // the oracle claim: verified LSH candidates == exact all-pairs result
    val lsh = Dedup.dedupMinhashLsh(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // exact all-pairs via the same shingle definition
    val d = GraftSession.table(spark, sf, "documents")
      .select(col("doc_id"), Dedup.shingles.as("sh"))
    val a = d.select(col("doc_id").as("doc_a"), col("sh").as("sa"))
    val b = d.select(col("doc_id").as("doc_b"), col("sh").as("sb"))
    val exact = a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("j", size(array_intersect(col("sa"), col("sb"))).cast("double") / size(array_union(col("sa"), col("sb"))))
      .filter(col("j") >= 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(lsh == exact, s"LSH=${lsh.size} exact=${exact.size} missed=${(exact -- lsh).size}")
    assert(exact.nonEmpty, "test data should contain planted near-dups")
  }

  test("simhash pairs all satisfy the hamming bound and include the near-dup pairs") {
    val sim = Dedup.dedupSimhash(spark, sf).collect()
    sim.foreach(r => assert(r.getAs[Long]("hamming") <= 3))
    // near-identical docs (0.9+ shingle jaccard) should mostly collide in simhash
    val minhashPairs = Dedup.dedupMinhashLsh(spark, sf)
      .filter(col("jaccard") >= 0.95).select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val simPairs = sim.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    val hit = minhashPairs.count(simPairs.contains)
    assert(minhashPairs.isEmpty || hit >= minhashPairs.size / 2,
      s"simhash found $hit of ${minhashPairs.size} very-near dups")
  }

  test("ann_lsh recall@5 vs brute force") {
    val bf = VectorOps.annBruteforce(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = VectorOps.annLsh(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = bf.count(lsh.contains).toDouble / bf.size
    info(s"ann_lsh recall@5 = $recall")
    // deterministic (fixed hyperplane seed); measured 0.70 exact-bucket,
    // 0.98 since 4-probe multi-probe (Lv'07) landed on the query side
    assert(recall >= 0.7, s"LSH recall under the pinned floor: $recall")
  }

  test("ann_ivf recall@5 vs brute force") {
    val bf = VectorOps.annBruteforce(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = VectorOps.annIvf(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = bf.count(ivf.contains).toDouble / bf.size
    info(s"ann_ivf recall@5 = $recall")
    // floor pinned from the tools/IvfSweep sweep: 8/16 probes measures
    // 0.76 here — deterministic given the fixed k-means seeds
    assert(recall >= 0.7, s"IVF recall under the pinned floor: $recall")
  }

  test("ann_pq recall@5 vs brute force and determinism") {
    val bf = VectorOps.annBruteforce(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq1 = VectorOps.annPq(spark, sf)
    val pq = pq1.select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = bf.count(pq.contains).toDouble / bf.size
    info(s"ann_pq recall@5 = $recall")
    // 16 subspaces × 16 codes + 8k exact re-rank measures 0.89 here —
    // deterministic (fixed sample order + seeds)
    assert(recall >= 0.7, s"PQ recall under the pinned floor: $recall")
    val again = VectorOps.annPq(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(pq == again, "PQ must be deterministic across invocations")
  }

  test("pq ADC score equals the reconstruction dot product exactly") {
    // the ADC sum over LUT entries must equal dot(query, reconstructed
    // vector) — same integers, different summation route
    val e = GraftSession.table(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val numSub = 8; val ksub = 16
    val cb = VectorOps.pqCodebooks(e, numSub, ksub)
    val qv = org.apache.spark.sql.functions.transform(
      col("embedding"),
      x => floor(x.cast("double") * 10000 + 0.5).cast("long"))
    val rows = e.limit(30)
      .select(
        col("id"),
        qv.as("qv"),
        graft.functions.ArrayExprs.pqEncode(qv, cb, numSub, ksub).as("codes"),
        graft.functions.ArrayExprs.pqLut(qv, cb, numSub, ksub).as("lut"),
        graft.functions.ArrayExprs.pqAdcScore(
          graft.functions.ArrayExprs.pqEncode(qv, cb, numSub, ksub),
          graft.functions.ArrayExprs.pqLut(qv, cb, numSub, ksub), ksub).as("self_adc"),
      )
      .as[(Long, Seq[Long], Seq[Int], Seq[Long], Long)].collect()
    val subDim = 64 / numSub
    rows.foreach { case (id, v, codes, lut, selfAdc) =>
      // reconstruction = concat of chosen centroids; ADC vs itself =
      // dot(v, reconstruction)
      val recon = codes.zipWithIndex.flatMap { case (c, j) => cb(j * ksub + c) }
      val dot = v.zip(recon).map { case (a, b) => a * b }.sum
      assert(selfAdc == dot, s"vec $id: ADC $selfAdc != reconstruction dot $dot")
      // and the LUT route agrees element-wise
      val lutSum = codes.zipWithIndex.map { case (c, j) => lut(j * ksub + c) }.sum
      assert(lutSum == selfAdc)
    }
  }

  test("dedup_embedding: candidate-NN is sound and recalls the true NN well") {
    val bf = VectorOps.annBruteforce(spark, sf)
      .filter(col("rank") === 1)
      .select(col("query_id"), col("neighbor_id"), col("cosine"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val nn = VectorOps.dedupEmbedding(spark, sf)
      .filter(col("vec_id") < 20)
      .select(col("vec_id"), col("nearest_id"), col("cosine"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // soundness: an LSH candidate can never beat the exact NN
    nn.foreach { case (id, (_, cos)) => assert(cos <= bf(id)._2 + 1e-12, s"vec $id") }
    val recall = bf.count { case (id, (nbr, _)) => nn.get(id).exists(_._1 == nbr) }.toDouble / bf.size
    info(s"dedup_embedding NN recall = $recall")
    assert(recall >= 0.5, s"LSH candidate-NN recall collapsed: $recall")
  }

  test("dedup_embedding: every flagged near-dup pair is a genuine high-cosine pair") {
    val flagged = VectorOps.dedupEmbedding(spark, sf).filter(col("is_near_dup"))
      .select("cosine").as[Double].collect()
    flagged.foreach(c => assert(c >= 0.5))
  }

  test("generic ANN API: held-out query set, LSH and IVF recall vs brute force") {
    // queries the named entry points never see — exercises the
    // parameterized (data, queries, k) API end to end
    val e = GraftSession.table(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val held = e.filter(col("id") >= 200 && col("id") < 220)
    val bf = VectorOps.annBruteforce(e, held, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert(bf.size == 20 * 5)
    val lsh = VectorOps.annLsh(e, held, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lshRecall = bf.count(lsh.contains).toDouble / bf.size
    info(s"held-out ann_lsh recall@5 = $lshRecall")
    // 0.61 exact-bucket → 0.99 with multi-probe on held-out queries
    assert(lshRecall >= 0.7, s"LSH recall under the pinned floor on held-out queries: $lshRecall")
    val ivf = VectorOps.annIvf(e, held, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivfRecall = bf.count(ivf.contains).toDouble / bf.size
    info(s"held-out ann_ivf recall@5 = $ivfRecall")
    assert(ivfRecall >= 0.7, s"IVF recall under the pinned floor on held-out queries: $ivfRecall")
  }

  test("kmeansCentroids: k centers on the unit sphere, every list populated") {
    val e = GraftSession.table(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding"))
    val cents = VectorOps.kmeansCentroids(e, 8).collect()
    assert(cents.length == 8)
    cents.foreach { r =>
      assert(r.getSeq[Long](r.fieldIndex("cv")).length == 64)
      // data is unit-norm ×10000-quantized; spherical means stay near the sphere
      val n = r.getAs[Double]("cnorm")
      assert(n > 5000 && n < 15000, s"centroid norm off the sphere: $n")
    }
    // centroids should partition the data non-degenerately: the largest
    // inverted list must not swallow (almost) everything
    val cdf = VectorOps.kmeansCentroids(e, 8)
    val counts = e.select(col("id"), col("embedding"))
      .join(broadcast(cdf), expr("true"))
      .withColumn("qv", expr("transform(embedding, x -> cast(floor(cast(x as double) * 10000 + 0.5) as bigint))"))
      .withColumn("cos", expr("aggregate(zip_with(qv, cv, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"))
      .groupBy("id").agg(max(struct(col("cos"), col("centroid_id"))).as("m"))
      .groupBy(col("m.centroid_id")).count()
      .select("count").as[Long].collect()
    assert(counts.max < 450, s"one centroid swallowed ${counts.max} of 500 vectors")
  }

  test("connectedComponents: chains merge transitively, components stay separate") {
    // 1-2, 2-3, 3-4 chain → one cluster labeled 1; 10-11 separate; 20-21, 21-22
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (21L, 22L), (20L, 21L))
      .toDF("doc_a", "doc_b")
    val got = operators.Pipeline.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("winnowing: identical docs share fingerprints; guarantee threshold holds") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "a completely different set of words with no overlap whatsoever here now"),
    ).toDF("id", "text").withColumn("fp", Winnowing.fingerprints(col("text")))
    val fp = docs.select("id", "fp").as[(Long, Seq[Long])].collect().toMap
    assert(fp(1L) == fp(2L), "identical text must produce identical fingerprints")
    assert(fp(1L).intersect(fp(3L)).isEmpty, "disjoint text should share nothing")
    assert(fp(1L).nonEmpty && fp(1L).size < 11, "winnowing must compress the gram set")
  }

  test("winnowing: shared long substring guarantees a shared fingerprint") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"prefix words here $shared"),
      (2L, s"$shared suffix tail words there"),
    ).toDF("id", "text").withColumn("fp", Winnowing.fingerprints(col("text")))
    val fp = docs.select("id", "fp").as[(Long, Seq[Long])].collect().toMap
    assert(fp(1L).intersect(fp(2L)).nonEmpty, "w+k-1 shared tokens must yield a shared fingerprint")
  }

  test("langid prediction is priority-deterministic on ties") {
    val out = operators.TextAnalysis.textLangid(spark, sf)
    val zeros = out.filter(
      col("score_en") === 0 && col("score_de") === 0 && col("score_es") === 0 &&
        col("score_fr") === 0 && col("score_zh") === 0
    )
    // all-zero scores tie → priority picks 'en'
    assert(zeros.filter(col("pred_lang") =!= "en").count() == 0)
  }

  test("quality score stays in [0,1] and ratios are consistent") {
    val rows = operators.TextAnalysis.textQuality(spark, sf).collect()
    rows.foreach { r =>
      val q = r.getAs[Double]("quality_score")
      assert(q >= 0.0 && q <= 1.0)
      assert(r.getAs[Long]("n_uniq") <= r.getAs[Long]("n_tokens"))
    }
  }

  test("decontaminate_semantic: covers exactly the non-eval split, flags the near band") {
    val rows = operators.VectorOps.decontaminateSemantic(spark, sf).collect()
    val corpusIds = GraftSession.table(spark, sf, "embeddings")
      .filter(col("vec_id") % 20 =!= 0).select("vec_id")
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(rows.map(_.getAs[Long]("vec_id")).toSet == corpusIds,
      "one verdict per non-eval corpus vector, eval vectors never self-screen")
    rows.foreach { r =>
      assert(r.getAs[Long]("nearest_eval_id") % 20 == 0, "nearest neighbor must be an eval vector")
      val c = r.getAs[Double]("cosine")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      assert(r.getAs[Boolean]("contaminated") == (c >= 0.4))
    }
    val flagged = rows.count(_.getAs[Boolean]("contaminated"))
    assert(flagged > 0 && flagged < rows.length,
      s"the 0.4 band should flag some but not all of this corpus ($flagged/${rows.length})")
  }
}
