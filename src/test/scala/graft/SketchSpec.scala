package graft

import org.scalatest.funsuite.AnyFunSuite

class SketchSpec extends AnyFunSuite {
  import TestSpark._

  test("HLL approx distinct within 5% of exact; approx median inside [min,max]") {
    val rows = operators.Relational.qSketches(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_parts").toDouble
      val approx = r.getAs[Long]("approx_parts").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05, s"HLL err: $approx vs $exact")
      val med = r.getAs[Double]("approx_median_qty")
      assert(med >= r.getAs[Double]("min_qty") && med <= r.getAs[Double]("max_qty"))
    }
  }

  test("theta set algebra: exact-mode equality below 2^12 uniques, invariants everywhere") {
    val rows = operators.Relational.qThetaSets(spark, sf).collect()
    assert(rows.nonEmpty)
    // every distinct type pair appears exactly once, ordered
    val pairs = rows.map(r => (r.getAs[String]("type_a"), r.getAs[String]("type_b")))
    assert(pairs.distinct.length == pairs.length)
    pairs.foreach { case (a, b) => assert(a < b) }
    val nUsers = GraftSession.table(spark, sf, "events")
      .select("user_id").distinct().count()
    rows.foreach { r =>
      val (ei, xi) = (r.getAs[Long]("est_inter"), r.getAs[Long]("exact_inter"))
      val (eu, xu) = (r.getAs[Long]("est_union"), r.getAs[Long]("exact_union"))
      val (ed, xd) = (r.getAs[Long]("est_only_a"), r.getAs[Long]("exact_only_a"))
      // sf0.001 has < 2^12 distinct users per type: every sketch is
      // still a complete hash sample, so estimate ≡ exact
      if (nUsers < 4096) {
        assert(ei == xi, s"exact-mode intersection diverged: $ei vs $xi")
        assert(eu == xu, s"exact-mode union diverged: $eu vs $xu")
        assert(ed == xd, s"exact-mode difference diverged: $ed vs $xd")
      } else {
        // estimation mode: 5% relative error band (lgK=12 gives ~1.6%
        // RSE on the union; intersection error scales with overlap)
        assert(math.abs(eu - xu).toDouble / math.max(1L, xu) <= 0.05)
        assert(math.abs(ei - xi).toDouble / math.max(1L, xu) <= 0.05)
      }
      // set-algebra invariants hold for the ESTIMATES themselves
      assert(ei + ed <= eu + 1, "A∩B + A\\B must not exceed A∪B")
      assert(xi + xd <= xu)
    }
  }
}
