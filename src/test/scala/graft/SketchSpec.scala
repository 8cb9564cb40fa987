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
}
