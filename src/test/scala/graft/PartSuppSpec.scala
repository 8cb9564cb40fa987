package graft

import graft.operators.PartSupp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plain-Scala replay oracles for the synthesized partsupp relation and
  * the partsupp-family TPC-H shapes (SURVEY §2.2 rows 21ci-21cm). The
  * five queries are also DuckDB-hash-oracled (CORRECTNESS gate); these
  * tests pin the synthesis contract itself — membership, hash-derived
  * columns, and the integer-exact threshold algebra — independently of
  * either engine's SQL layer.
  */
class PartSuppSpec extends AnyFunSuite {
  import TestSpark._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def u32(tag: String, p: Long, s: Long): Long =
    java.lang.Long.parseLong(md5hex(s"$tag:$p:$s").take(8), 16)

  /** The partsupp contract replayed in plain Scala. */
  private lazy val expectedPs: Seq[(Long, Long, Long, Long)] = {
    val parts = GraftSession.table(spark, sf, "part")
      .select(col("p_partkey")).collect().map(_.get(0).asInstanceOf[Number].longValue).toSeq
    val supps = GraftSession.table(spark, sf, "supplier")
      .select(col("s_suppkey")).collect().map(_.get(0).asInstanceOf[Number].longValue).toSeq
    for {
      p <- parts
      s <- supps
      if p % 25 == s % 25
    } yield (p, s, 1L + u32("aq", p, s) % 9999L, 1L + u32("sc", p, s) % 1000L)
  }

  test("partsupp: membership + md5-derived columns match the plain-Scala replay exactly") {
    val got = PartSupp.partsupp(spark, sf).collect()
      .map(r => (r.getAs[Long]("ps_partkey"), r.getAs[Long]("ps_suppkey"),
        r.getAs[Long]("ps_availqty"), r.getAs[Long]("ps_supplycost")))
      .toSeq.sorted
    assert(got == expectedPs.sorted)
    // every part has at least one supplier only when some supplier key
    // shares its mod-25 bucket; the density contract is |supplier|/25
    // suppliers per covered part
    val perPart = expectedPs.groupBy(_._1).values.map(_.size).toSet
    assert(perPart.nonEmpty && perPart.forall(_ >= 1))
  }

  test("q11_important: the mean-relative threshold replays exactly from partsupp") {
    val euSupp = {
      val n = GraftSession.table(spark, sf, "nation")
        .select(col("n_nationkey"), col("n_regionkey")).collect()
        .map(r => r.get(0).asInstanceOf[Number].longValue -> r.get(1).asInstanceOf[Number].intValue).toMap
      val r = GraftSession.table(spark, sf, "region")
        .filter(col("r_name") === "EUROPE").select(col("r_regionkey")).collect()
        .map(_.get(0).asInstanceOf[Number].intValue).toSet
      GraftSession.table(spark, sf, "supplier")
        .select(col("s_suppkey"), col("s_nationkey")).collect()
        .map(row => (row.get(0).asInstanceOf[Number].longValue, row.get(1).asInstanceOf[Number].longValue))
        .filter { case (_, nk) => r.contains(n(nk).toInt) }.map(_._1).toSet
    }
    val nat = expectedPs.filter(t => euSupp.contains(t._2)).map(t => (t._1, t._3 * t._4))
    val grp = nat.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    val total = nat.map(_._2).sum
    val nParts = nat.map(_._1).distinct.size.toLong
    val want = grp.filter { case (_, v) => 2L * v * nParts > 3L * total }
      .sortBy { case (k, v) => (-v, k) }
    val got = PartSupp.q11Important(spark, sf).collect()
      .map(r => (r.getAs[Long]("ps_partkey"), r.getAs[Long]("value"))).toSeq
    assert(got == want)
  }

  test("q16_suppcnt: distinct-supplier counts replay from partsupp + the part/supplier dims") {
    val p = GraftSession.table(spark, sf, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size")).collect()
      .map(r => r.get(0).asInstanceOf[Number].longValue -> (r.getString(1), r.getString(2), r.get(3).asInstanceOf[Number].intValue)).toMap
    val bad = GraftSession.table(spark, sf, "supplier")
      .filter(col("s_acctbal") < 0).select(col("s_suppkey")).collect()
      .map(_.get(0).asInstanceOf[Number].longValue).toSet
    val sizes = Set(1, 9, 14, 19, 23, 36, 45, 49)
    val want = expectedPs
      .filter(t => !bad.contains(t._2))
      .flatMap { t =>
        val (brand, ptype, size) = p(t._1)
        if (brand != "Brand#3" && ptype != "PROMO" && sizes.contains(size))
          Some(((brand, ptype, size.toLong), t._2))
        else None
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong).toSeq
      .sortBy { case ((b, t, s), c) => (-c, b, t, s) }
    val got = PartSupp.q16Suppcnt(spark, sf).collect()
      .map(r => ((r.getAs[String]("p_brand"), r.getAs[String]("p_type"), r.getAs[Long]("p_size")),
        r.getAs[Long]("supplier_cnt"))).toSeq
    assert(got == want)
  }

  test("q2_mincost: every returned row carries its part's true minimum EU supplycost") {
    val rows = PartSupp.q2Mincost(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute per-part min over EU suppliers from the replayed partsupp
    val euSupp = {
      val n = GraftSession.table(spark, sf, "nation")
        .select(col("n_nationkey"), col("n_regionkey")).collect()
        .map(r => r.get(0).asInstanceOf[Number].longValue -> r.get(1).asInstanceOf[Number].intValue).toMap
      val r = GraftSession.table(spark, sf, "region")
        .filter(col("r_name") === "EUROPE").select(col("r_regionkey")).collect()
        .map(_.get(0).asInstanceOf[Number].intValue).toSet
      GraftSession.table(spark, sf, "supplier")
        .select(col("s_suppkey"), col("s_nationkey")).collect()
        .map(row => (row.get(0).asInstanceOf[Number].longValue, row.get(1).asInstanceOf[Number].longValue))
        .filter { case (_, nk) => r.contains(n(nk).toInt) }.map(_._1).toSet
    }
    val minCost = expectedPs.filter(t => euSupp.contains(t._2))
      .groupBy(_._1).view.mapValues(_.map(_._4).min).toMap
    rows.foreach { r =>
      val pk = r.getAs[Long]("ps_partkey")
      assert(r.getAs[Long]("ps_supplycost") == minCost(pk), s"part $pk not at min cost")
    }
  }

  test("q9_profit and q20_potential return non-degenerate results at sf0.001") {
    val q9 = PartSupp.q9Profit(spark, sf).collect()
    assert(q9.nonEmpty)
    // ordering contract: nation asc, year desc within nation
    val keys = q9.map(r => (r.getAs[String]("nation"), r.getAs[Long]("o_year"))).toSeq
    assert(keys == keys.sortBy { case (n, y) => (n, -y) })
    val q20 = PartSupp.q20Potential(spark, sf).collect()
    assert(q20.nonEmpty)
    assert(q20.map(_.getAs[String]("s_name")).toSeq == q20.map(_.getAs[String]("s_name")).toSeq.sorted)
  }
}
