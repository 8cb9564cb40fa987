package graft

import graft.operators.{Graph, Relational}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 additions: plain-Scala replays / property pins for the
  * session's new operators (SURVEY §2 rows reference these tests as
  * their engine-independent oracle companions).
  */
class Round14OpsSpec extends AnyFunSuite {
  import TestSpark._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("q_join_card2: cross-table sketch replays exactly and upper-bounds the true join size") {
    def counts(tab: String, key: String): Map[Long, Long] =
      GraftSession.table(spark, sf, tab).select(col(key)).collect()
        .map(_.getLong(0)).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ce = counts("events", "user_id")
    val co = counts("orders", "o_custkey")
    val exact = ce.iterator.collect {
      case (k, c) if co.contains(k) => BigInt(c) * BigInt(co(k))
    }.sum
    def bucketOf(k: Long): Long =
      java.lang.Long.parseLong(md5hex(s"$k:joincard").take(8), 16) % 256
    def sketch(m: Map[Long, Long]): Map[Long, (Long, Long)] =
      m.toSeq.groupBy(p => bucketOf(p._1))
        .view.mapValues(ps => (ps.map(_._2).sum, ps.length.toLong)).toMap
    val se = sketch(ce)
    val so = sketch(co)
    val matched = se.keySet.intersect(so.keySet)
    val est = matched.iterator.map(b => BigInt(se(b)._1) * BigInt(so(b)._1)).sum

    val r = Relational.qJoinCard2(spark, sf).collect().head
    assert(r.getAs[Long]("n_buckets") == matched.size.toLong)
    assert(r.getAs[Long]("n_keys_e") == matched.iterator.map(se(_)._2).sum)
    assert(r.getAs[Long]("n_keys_o") == matched.iterator.map(so(_)._2).sum)
    assert(BigInt(r.getAs[String]("exact_pairs")) == exact)
    assert(BigInt(r.getAs[String]("est_pairs")) == est)

    // AGM-style bound: Σ_b n_b·m_b ≥ Σ_k c_e(k)·c_o(k), always.
    assert(est >= exact, "sketch must upper-bound the true join size")
    val wantPpm = ((est * 1000 / exact) * 1000 + (est * 1000 % exact) * 1000 / exact - 1000000).toLong
    assert(r.getAs[Long]("over_ppm") == wantPpm)
    assert(wantPpm >= 0L)

    // Equality iff every matched bucket is PURE — holds exactly one
    // shared key and no key private to either side. Verified both
    // directions on synthetic key sets, same hash, same algebra.
    def estOf(a: Map[Long, Long], b: Map[Long, Long]): (BigInt, BigInt) = {
      val sa = sketch(a); val sb = sketch(b)
      val m = sa.keySet.intersect(sb.keySet)
      val ex = a.iterator.collect { case (k, c) if b.contains(k) => BigInt(c) * BigInt(b(k)) }.sum
      val es = m.iterator.map(x => BigInt(sa(x)._1) * BigInt(sb(x)._1)).sum
      (ex, es)
    }
    // pure: identical singleton key sets in distinct buckets
    val pureKeys = (1L to 64L).filter(k => (1L to 64L).count(j => bucketOf(j) == bucketOf(k)) == 1)
    assert(pureKeys.nonEmpty)
    val pa = pureKeys.map(k => k -> (k % 5 + 1)).toMap
    val pb = pureKeys.map(k => k -> (k % 7 + 1)).toMap
    val (pex, pes) = estOf(pa, pb)
    assert(pes == pex, "pure buckets ⇒ estimate is exact")
    // impure: force two distinct keys into one shared bucket
    val k0 = pureKeys.head
    val clash = (65L to 5000L).find(j => bucketOf(j) == bucketOf(k0)).get
    val (iex, ies) = estOf(pa + (clash -> 3L), pb + (clash -> 2L))
    assert(ies > iex, "an impure bucket ⇒ strict overestimate")
  }

  test("q_neighborhood_k: 32-register replay is bit-exact and beats the 1-register error vs exact BFS") {
    val K = 32
    val pairs = GraftSession.table(spark, sf, "orders")
      .join(GraftSession.table(spark, sf, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("c"), r.getAs[Long]("s")))
    val adj = (pairs.map(p => p._1 -> p._2) ++ pairs.map(p => p._2 -> p._1))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
    val nodes = adj.keys.toVector.sorted

    // ---- plain-Scala register replay (same md5 init, same OR rounds)
    def init(v: Long, j: Int): Long = {
      val h = java.lang.Long.parseLong(md5hex(s"$v:anf:$j").take(8), 16)
      if (h == 0L) 1L << 32 else h & -h
    }
    var reg: Map[(Long, Int), Long] =
      (for (v <- nodes; j <- 0 until K) yield (v, j) -> init(v, j)).toMap
    def estRow: (Long, Long) = {
      val q = nodes.iterator.map { v =>
        val sv = (0 until K).map { j =>
          val m = reg((v, j)); java.lang.Long.bitCount(((m + 1) & ~m) - 1).toLong
        }.sum
        math.floor(math.pow(2.0, sv.toDouble / K) * 1024.0).toLong
      }.sum
      (q, (q / 79207424L) * 100000L + (q % 79207424L) * 100000L / 79207424L)
    }
    var want = Vector(estRow)
    for (_ <- 1 to 4) {
      reg = reg.map { case ((v, j), m) =>
        (v, j) -> adj(v).foldLeft(m)((acc, u) => acc | reg((u, j)))
      }
      want :+= estRow
    }
    val rows = Graph.qNeighborhoodK(spark, sf).collect()
    assert(rows.length == 5)
    rows.zipWithIndex.foreach { case (r, t) =>
      assert(r.getAs[Int]("t") == t)
      assert(r.getAs[Long]("sum_q10") == want(t)._1, s"round $t register sum diverges")
      assert(r.getAs[Long]("est_reach") == want(t)._2, s"round $t estimate diverges")
    }

    // ---- exact N(t) by BFS ball growth (BitSet per node)
    val idx = nodes.zipWithIndex.toMap
    var ball = nodes.map { v =>
      val b = new java.util.BitSet(nodes.length); b.set(idx(v)); b
    }.toArray
    def exactN: Long = ball.iterator.map(_.cardinality().toLong).sum
    var exact = Vector(exactN)
    for (_ <- 1 to 4) {
      ball = nodes.map { v =>
        val b = ball(idx(v)).clone().asInstanceOf[java.util.BitSet]
        adj(v).foreach(u => b.or(ball(idx(u))))
        b
      }.toArray
      exact :+= exactN
    }

    // ---- √k variance reduction must show up as a tighter curve:
    // total relative error (ppm, t=1..4) of the 32-register estimate
    // is below the 1-register one's
    val est1 = Graph.qNeighborhood(spark, sf).collect()
      .map(r => r.getAs[Int]("t") -> r.getAs[Long]("est_reach")).toMap
    def relErrPpm(est: Long, ex: Long): Long = math.abs(est - ex) * 1000000L / ex
    val errK = (1 to 4).map(t => relErrPpm(want(t)._2, exact(t))).sum
    val err1 = (1 to 4).map(t => relErrPpm(est1(t), exact(t))).sum
    assert(errK < err1,
      s"32-register total error $errK ppm should beat 1-register $err1 ppm")
    // and it should be a genuinely good estimate, not just less bad
    (1 to 4).foreach(t => assert(relErrPpm(want(t)._2, exact(t)) < 250000L,
      s"round $t error ${relErrPpm(want(t)._2, exact(t))} ppm exceeds 25%"))
  }
}
