package graft

import graft.functions.TopKAggregator
import graft.functions.TopKAggregator.Entry
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("bounded-heap top-k aggregator equals the window-filter formulation") {
    val joined = GraftSession.table(spark, sf, "orders")
      .join(broadcast(GraftSession.table(spark, sf, "customer")), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"), col("o_totalprice").as("sort"), col("o_orderkey").as("payload"))
    val agg = joined
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, s, p) => Entry(s, p) }
      .agg(TopKAggregator.topK(3).toColumn)
      .collect()
      .flatMap { case (seg, items) => items.zipWithIndex.map { case (e, i) => (seg, (i + 1).toLong, e.payload, e.sort) } }
      .toSet

    val window = operators.Relational.qTopkGroup(spark, sf)
      .select(col("c_mktsegment"), col("rk"), col("o_orderkey"), col("o_totalprice"))
      .as[(String, Long, Long, Double)].collect().toSet
    assert(agg == window)
  }

  test("aggregator buffer stays bounded at k") {
    val many = (1 to 10000).map(i => Entry(i.toDouble % 97, i.toLong))
    val buf = many.foldLeft(TopKAggregator.topK(5).zero)((b, e) => TopKAggregator.topK(5).reduce(b, e))
    assert(buf.items.size == 5)
    assert(buf.items.map(_.sort).forall(_ == 96.0), "must keep only max-sort entries")
  }
}
