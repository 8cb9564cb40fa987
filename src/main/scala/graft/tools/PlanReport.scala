package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.execution.SparkPlan

/** Per-query physical-plan audit artifact: one JSON object per named
  * query counting the plan features that decide 100 TB behavior —
  * shuffle exchanges, broadcast exchanges, join strategies, sorts,
  * whole-stage-codegen spans, dynamic-pruning subqueries. The same
  * AQE-aware walk as PlanSpec's audits (TreeNode.collect does not
  * descend through the adaptive wrapper), emitted as a machine-read
  * snapshot (`PLANS.json`) so plan-shape regressions are diffable
  * across rounds the way floor regressions already are.
  *
  * Usage: runMain graft.tools.PlanReport [sfDir]
  */
object PlanReport {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val expanded = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => Seq(r.relation.cachedPlan)
      case _ => p.children
    }
    p +: expanded.flatMap(flatten)
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.build(s"local[$cpus]", shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("ERROR")

    val rows = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val qe = fn(spark, sf).queryExecution
        // Under AQE, whole-stage-codegen collapse happens per query
        // stage AT RUNTIME: the unexecuted adaptive wrapper shows zero
        // WholeStageCodegenExec nodes for any non-materialized query
        // (r11 verdict: the counter was blind for 234/248 plans).
        // Execute first — distributed, nothing shipped to the driver —
        // so the walk below sees the FINAL adaptive plan.
        qe.toRdd.count(): Unit
        val nodes = flatten(qe.executedPlan)
        def n(pred: SparkPlan => Boolean) = nodes.count(pred)
        val shuffles = n(_.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec])
        val broadcasts = n(_.isInstanceOf[org.apache.spark.sql.execution.exchange.BroadcastExchangeExec])
        val smj = n(_.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec])
        val bhj = n(_.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec])
        val bnlj = n(_.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec])
        val sorts = n(_.isInstanceOf[org.apache.spark.sql.execution.SortExec])
        val codegen = n(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
        val windows = n(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec])
        val dpp = if (nodes.exists(_.toString.contains("dynamicpruning"))) 1 else 0
        Some(name ->
          s"""{"shuffles":$shuffles,"broadcasts":$broadcasts,"smj":$smj,"bhj":$bhj,"bnlj":$bnlj,"sorts":$sorts,"codegen_spans":$codegen,"windows":$windows,"dpp":$dpp}""")
      } catch {
        case e: Throwable =>
          println(s"[planreport] SKIP $name: ${e.getClass.getSimpleName}")
          None
      }
    }
    val json = rows.map { case (k, v) => s""""$k":$v""" }
      .mkString(s"""{"sf":"$sf","n_queries":${rows.size},"plans":{""", ",", "}}")
    val w = new java.io.PrintWriter("PLANS.json")
    try w.println(json) finally w.close()
    println(s"[planreport] wrote PLANS.json for ${rows.size} queries")
    spark.stop()
  }
}
