package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = GraftSession.build("local[4]", shufflePartitions = 4)
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("every declared query has an oracle or is explicitly rows-only") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name runs at sf0.001 and returns rows") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("q1_agg values are internally consistent") {
    val rows = operators.Relational.q1Agg(spark, sf).collect()
    rows.foreach { r =>
      val sumQty = r.getAs[Double]("sum_qty")
      val n = r.getAs[Long]("count_order")
      val avg = r.getAs[Double]("avg_qty")
      assert(math.abs(sumQty / n - avg) < 1e-9)
      assert(r.getAs[Double]("sum_charge") >= r.getAs[Double]("sum_disc_price"))
    }
  }

  test("q_sessionize session bounds are ordered and disjoint per user") {
    val rows = operators.Relational.qSessionize(spark, sf).collect()
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("session_id"))
      sorted.foreach { r =>
        assert(!r.getAs[java.sql.Timestamp]("session_start").after(r.getAs[java.sql.Timestamp]("session_end")))
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val gap = b.getAs[java.sql.Timestamp]("session_start").getTime -
            a.getAs[java.sql.Timestamp]("session_end").getTime
          assert(gap > 1800L * 1000, "adjacent sessions must be > 30min apart")
        case _ => ()
      }
    }
  }
}

/** Plan-quality gates (SURVEY.md §4): pushdown reaches the scan,
  * small dims broadcast. These guard the 100 TB story, not just
  * correctness.
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  test("q6_filter pushes predicates into the parquet scan") {
    val plan = operators.Relational.q6Filter(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("l_shipdate"), "shipdate filter should be pushed")
  }

  test("q1_agg prunes columns at the scan") {
    val scan = operators.Relational.q1Agg(spark, sf)
      .queryExecution.executedPlan.toString
    // l_orderkey is never referenced by q1 → must not be read
    assert(!scan.contains("l_orderkey"), "q1 must not read l_orderkey")
  }

  test("q5_multijoin broadcasts the dimension tables") {
    val plan = operators.Relational.q5Multijoin(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("q1_agg uses whole-stage codegen") {
    val df = operators.Relational.q1Agg(spark, sf)
    df.collect() // materialize so AQE finalizes the physical plan
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen spans in the plan string
    assert(plan.contains("*("), plan)
    assert(plan.contains("partial_sum"), "map-side combine expected before the shuffle")
  }
}
