package graft

import graft.operators.Relational
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
}
