package graft.operators

import graft.GraftSession.table
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational / analytics core (SURVEY.md §2.2).
  *
  * Every query here is written DataFrame-first so Catalyst plans it
  * (pushdown, pruning, join selection, AQE), and every query carries a
  * DuckDB-equivalent oracle in [[oracles]].
  *
  * Oracle-parity rules (SURVEY.md §6) applied throughout:
  *  - money math goes through DECIMAL casts before aggregation so the
  *    result is exact and order-independent on both engines, then back
  *    to DOUBLE for schema parity;
  *  - integral-valued doubles (l_quantity) are summed raw — exact in
  *    fp regardless of order;
  *  - every result has a total ORDER BY;
  *  - identical aliases on both sides.
  */
object Relational {

  /** price-scale decimal: prices < 10^10, 2 decimals */
  private def decP(c: Column): Column = c.cast(DecimalType(12, 2))

  /** rate-scale decimal: discounts / taxes in [0,1) */
  private def decR(c: Column): Column = c.cast(DecimalType(4, 2))

  private val one = lit(1).cast(DecimalType(3, 2))

  private def dbl(c: Column): Column = c.cast(DoubleType)

  private def ts(s: String): Column = lit(s).cast(TimestampType)

  /** §2.2 #11 — grouped aggregation, TPC-H Q1 shape (pricing summary). */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val l = table(spark, dir, "lineitem").filter(col("l_shipdate") <= ts("1998-09-02"))
    val discPrice = decP(col("l_extendedprice")) * (one - decR(col("l_discount")))
    l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        dbl(sum(decP(col("l_extendedprice")))).as("sum_base_price"),
        dbl(sum(discPrice)).as("sum_disc_price"),
        dbl(sum(discPrice * (one + decR(col("l_tax"))))).as("sum_charge"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"),
      )
      .orderBy("l_returnflag", "l_linestatus")
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  sum(l_quantity) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  sum(l_quantity) / count(*) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** §2.2 #10 — selective filter + aggregate; the filter must reach the
    * parquet scan as PushedFilters (verified in PlanSpec).
    */
  def q6Filter(spark: SparkSession, dir: String): DataFrame = {
    val l = table(spark, dir, "lineitem").filter(
      col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01") &&
        col("l_discount").between(0.02, 0.04) && col("l_quantity") < 24
    )
    l.agg(
      dbl(sum(decP(col("l_extendedprice")) * decR(col("l_discount")))).as("revenue"),
      count(lit(1)).as("n_rows"),
    )
  }

  val q6FilterSql: String =
    """SELECT
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24""".stripMargin

  /** §2.2 #12/#16 — 3-way join + broadcast dim + top-k, TPC-H Q3 shape.
    * customer is the small side at any SF ratio → broadcast.
    */
  def q3Join(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = table(spark, dir, "orders").filter(col("o_orderdate") < ts("1997-01-01"))
    val l = table(spark, dir, "lineitem").filter(col("l_shipdate") > ts("1997-01-01"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dbl(sum(decP(col("l_extendedprice")) * (one - decR(col("l_discount"))))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  val q3JoinSql: String =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |  AND l_shipdate > TIMESTAMP '1997-01-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** §2.2 #13 — semi join (EXISTS): orders having a high-quantity line. */
  def q4Semijoin(spark: SparkSession, dir: String): DataFrame = {
    val big = table(spark, dir, "lineitem").filter(col("l_quantity") > 45).select(col("l_orderkey"))
    table(spark, dir, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  val q4SemijoinSql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** §2.2 #14 — anti join (NOT EXISTS): customers with no URGENT order. */
  def qAntijoin(spark: SparkSession, dir: String): DataFrame = {
    val urgent = table(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    table(spark, dir, "customer")
      .join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
  }

  val qAntijoinSql: String =
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** §2.2 #12 — 6-way join, TPC-H Q5 shape (revenue by nation in ASIA).
    * region/nation/supplier stay tiny at every SF → broadcast; the
    * customer⋈orders⋈lineitem chain shuffles on its keys and AQE
    * handles skew.
    */
  def q5Multijoin(spark: SparkSession, dir: String): DataFrame = {
    val r = table(spark, dir, "region").filter(col("r_name") === "ASIA")
    val n = table(spark, dir, "nation")
    val s = table(spark, dir, "supplier")
    val c = table(spark, dir, "customer")
    val o = table(spark, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
    val l = table(spark, dir, "lineitem")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dbl(sum(decP(col("l_extendedprice")) * (one - decR(col("l_discount"))))).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5MultijoinSql: String =
    """SELECT n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** §2.2 #15 — window functions: per-customer order rank + running spend. */
  def qWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    table(spark, dir, "orders").select(
      col("o_custkey"),
      col("o_orderkey"),
      col("o_orderdate"),
      rank().over(w).cast(LongType).as("rk"),
      dbl(sum(decP(col("o_totalprice"))).over(wRun)).as("running_spend"),
    ).orderBy("o_custkey", "o_orderkey")
  }

  val qWindowSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(rank() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS rk,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** §2.2 #17 — distinct / count-distinct per group. */
  def qDistinct(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"),
      )
      .orderBy("l_returnflag")

  val qDistinctSql: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** §2.2 #18 — rollup: customer counts/balances by region → nation → total. */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "customer")
    val n = table(spark, dir, "nation")
    val r = table(spark, dir, "region")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), dbl(sum(decP(col("c_acctbal")))).as("sum_acctbal"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region_name"),
        coalesce(col("n_name"), lit("ALL")).as("nation_name"),
        col("n_cust"),
        col("sum_acctbal"),
      )
      .orderBy("region_name", "nation_name")
  }

  val qRollupSql: String =
    """SELECT coalesce(r_name, 'ALL') AS region_name, coalesce(n_name, 'ALL') AS nation_name,
      |  count(*) AS n_cust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY region_name, nation_name""".stripMargin

  /** §2.2 #19 — as-of join: each purchase event paired with the same
    * user's most recent click at-or-before it.
    *
    * Spark-first plan: instead of a per-row correlated lookup (the
    * oracle's formulation), union click+purchase streams and take a
    * running max over a single user-partitioned sort — one shuffle,
    * no join, scales linearly. 'click' < 'purchase' lexicographically,
    * so ordering by (ts, event_type) makes a same-timestamp click
    * visible to the purchase, matching `c.ts <= e.ts`.
    */
  def qAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_type"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("last_click_ts", max(when(col("event_type") === "click", col("ts"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("last_click_ts"))
      .orderBy("event_id")
  }

  val qAsofSql: String =
    """SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
      |  CAST((SELECT max(c.ts) FROM events c
      |        WHERE c.user_id = e.user_id AND c.event_type = 'click' AND c.ts <= e.ts) AS TIMESTAMP) AS last_click_ts
      |FROM events e
      |WHERE e.event_type = 'purchase'
      |ORDER BY e.event_id""".stripMargin

  /** §2.2 #19b — as-of join with tolerance (pandas merge_asof
    * semantics): the prior click only counts if within 1 hour of the
    * purchase. Same union+running-max plan; the tolerance is a post
    * filter on the matched timestamp, not a second join.
    */
  def qAsofTolerance(spark: SparkSession, dir: String): DataFrame = {
    val tolUs = 3600L * 1000000L
    qAsof(spark, dir)
      .withColumn(
        "last_click_ts",
        when(unix_micros(col("ts")) - unix_micros(col("last_click_ts")) <= tolUs, col("last_click_ts")),
      )
      .withColumn("matched", col("last_click_ts").isNotNull)
  }

  val qAsofToleranceSql: String =
    """SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
      |  CAST((SELECT max(c.ts) FROM events c
      |        WHERE c.user_id = e.user_id AND c.event_type = 'click'
      |          AND c.ts <= e.ts AND c.ts >= e.ts - INTERVAL 1 HOUR) AS TIMESTAMP) AS last_click_ts,
      |  (SELECT max(c.ts) FROM events c
      |   WHERE c.user_id = e.user_id AND c.event_type = 'click'
      |     AND c.ts <= e.ts AND c.ts >= e.ts - INTERVAL 1 HOUR) IS NOT NULL AS matched
      |FROM events e
      |WHERE e.event_type = 'purchase'
      |ORDER BY e.event_id""".stripMargin

  /** §2.2 #20 — gap-based sessionization (30 min), batch analog of the
    * streaming flatMapGroupsWithState operator in graft.streaming.
    */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = 1800L * 1000000L
    table(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn(
        "new_s",
        when(col("prev_us").isNull || (unix_micros(col("ts")) - col("prev_us")) > gapUs, 1L).otherwise(0L),
      )
      .withColumn("session_id", sum(col("new_s")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
      )
      .orderBy("user_id", "session_id")
  }

  val qSessionizeSql: String =
    """WITH g AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), s AS (
      |  SELECT user_id, ts,
      |    CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      |  FROM g
      |)
      |SELECT user_id, session_id, count(*) AS n_events,
      |  CAST(min(ts) AS TIMESTAMP) AS session_start,
      |  CAST(max(ts) AS TIMESTAMP) AS session_end
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** §2.2 #21 — tumbling time-window aggregation over the event stream
    * (batch form; the streaming form with watermark lives in
    * graft.streaming).
    */
  def qEventsWindow(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(floor(col("value")).cast(LongType)).as("sum_floor_value"),
        // value is a raw double: a decimal cast rounds differently in
        // Spark (shortest-repr HALF_UP) vs DuckDB (binary). floor(x*100
        // + 0.5) is pure IEEE arithmetic, identical in both; the Long
        // sum is then exact and order-independent (§6).
        (dbl(sum(floor(col("value").cast(DoubleType) * 100 + 0.5).cast(LongType))) / 100.0)
          .as("sum_value"),
      )
      .orderBy("day", "event_type")

  val qEventsWindowSql: String =
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor_value,
      |  CAST(sum(CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY day, event_type""".stripMargin

  /** §2.2 #21b2 — HOPPING (sliding) window aggregation: 1-day windows
    * advancing every 6 hours, so each event lands in windows/hop = 4
    * overlapping windows — the smoothing/trend twin of the tumbling
    * [[qEventsWindow]]. Spark's `window(ts, "1 day", "6 hours")`
    * assigns the 4 memberships map-side (a bounded explode, no join);
    * the oracle replays the same epoch-aligned floor-division window
    * starts via an unnest over the 4 hop offsets. Counts and
    * floor-integer sums only — exact in both engines.
    */
  def qHopping(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .groupBy(window(col("ts"), "1 day", "6 hours").as("win"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(floor(col("value")).cast(LongType)).as("sum_floor_value"),
      )
      .select(col("win.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_floor_value"))
      .orderBy("window_start", "event_type")

  val qHoppingSql: String =
    """WITH assigned AS (
      |  SELECT make_timestamp((epoch_us(ts) // 21600000000 - i.i) * 21600000000) AS window_start,
      |    event_type, value
      |  FROM events, (SELECT unnest([0, 1, 2, 3]) AS i) i
      |)
      |SELECT window_start, event_type, count(*) AS n_events,
      |  CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor_value
      |FROM assigned
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin

  /** §2.2 #18b — full cube over order status × priority. */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dbl(sum(decP(col("o_totalprice")))).as("sum_total"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"),
        col("sum_total"),
      )
      .orderBy("status", "priority")

  val qCubeSql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status, coalesce(o_orderpriority, 'ALL') AS priority,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_total
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin

  /** §2.2 #16b — top-3 orders per customer segment by price (the
    * window-filter top-k-per-group pattern; one shuffle on the group
    * key, no global sort).
    */
  def qTopkGroup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    table(spark, dir, "orders")
      .join(broadcast(table(spark, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .withColumn("rk", row_number().over(w).cast(LongType))
      .filter(col("rk") <= 3)
      .select(col("c_mktsegment"), col("rk"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("c_mktsegment", "rk")
  }

  val qTopkGroupSql: String =
    """SELECT c_mktsegment, rk, o_orderkey, o_totalprice FROM (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |)
      |WHERE rk <= 3
      |ORDER BY c_mktsegment, rk""".stripMargin

  /** §2.2 #22b — sketch aggregates: HLL distinct + approximate
    * quantiles next to their exact counterparts. Sketch values are
    * engine-specific → rows-only driver check; SketchSpec bounds the
    * approximation error against the exact columns.
    */
  def qSketches(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    // exact count-distinct lives in its own aggregate: mixing a distinct
    // aggregate with object-hash sketch aggregates (HLL, quantile) in one
    // groupBy forces the whole aggregate onto the slow sort-based path
    val exact = li.groupBy(col("l_returnflag")).agg(countDistinct(col("l_partkey")).as("exact_parts"))
    li.groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("approx_median_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
      )
      .join(broadcast(exact), Seq("l_returnflag"))
      .orderBy("l_returnflag")
  }

  /** §2.2 #23b — set operations: customers buying high-value orders
    * EXCEPT urgent-order customers; INTERSECT of two order cohorts.
    */
  def qSetops(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
    val highValue = o.filter(col("o_totalprice") > 200000).select(col("o_custkey"))
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    val early = o.filter(col("o_orderdate") < ts("1997-01-01")).select(col("o_custkey"))
    highValue.except(urgent).withColumn("cohort", lit("high_minus_urgent"))
      .unionByName(highValue.intersect(early).withColumn("cohort", lit("high_and_early")))
      .select(col("cohort"), col("o_custkey"))
      .orderBy("cohort", "o_custkey")
  }

  val qSetopsSql: String =
    """WITH high AS (SELECT o_custkey FROM orders WHERE o_totalprice > 200000),
      |     urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
      |     early AS (SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01')
      |SELECT 'high_minus_urgent' AS cohort, o_custkey FROM (SELECT o_custkey FROM high EXCEPT SELECT o_custkey FROM urgent)
      |UNION ALL
      |SELECT 'high_and_early' AS cohort, o_custkey FROM (SELECT o_custkey FROM high INTERSECT SELECT o_custkey FROM early)
      |ORDER BY cohort, o_custkey""".stripMargin

  /** §2.2 #23c — pivot: customer counts by region × market segment.
    * Pivot values are the closed segment set, so the output schema is
    * static and the oracle mirrors it with conditional aggregation.
    */
  def qPivot(spark: SparkSession, dir: String): DataFrame = {
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    table(spark, dir, "customer")
      .join(broadcast(table(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(table(spark, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .pivot("c_mktsegment", segs)
      .agg(count(lit(1)))
      .na.fill(0L, segs)
      .orderBy("r_name")
  }

  val qPivotSql: String =
    """SELECT r_name,
      |  count(*) FILTER (WHERE c_mktsegment = 'AUTOMOBILE') AS "AUTOMOBILE",
      |  count(*) FILTER (WHERE c_mktsegment = 'BUILDING') AS "BUILDING",
      |  count(*) FILTER (WHERE c_mktsegment = 'FURNITURE') AS "FURNITURE",
      |  count(*) FILTER (WHERE c_mktsegment = 'HOUSEHOLD') AS "HOUSEHOLD",
      |  count(*) FILTER (WHERE c_mktsegment = 'MACHINERY') AS "MACHINERY"
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name
      |ORDER BY r_name""".stripMargin

  /** §2.2 #24b — semi-structured extraction: parse the JSON props
    * column (schema-on-read) and aggregate an extracted field. Spark
    * side uses from_json with an explicit schema — pushdown-friendly
    * and typed, vs stringly get_json_object.
    */
  def qJson(spark: SparkSession, dir: String): DataFrame = {
    val parsed = table(spark, dir, "events")
      .withColumn("k", from_json(col("props"), StructType(Seq(StructField("k", LongType)))).getField("k"))
    parsed
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
      )
      .orderBy("event_type")
  }

  val qJsonSql: String =
    """SELECT event_type, count(*) AS n_events,
      |  count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** §2.2 #15b — window navigation (lead/lag): per-user event deltas —
    * previous/next event type and the inter-event gap in microseconds.
    * One shuffle on user_id; all three window functions share a single
    * Window exchange+sort.
    */
  def qLeadlag(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    table(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .orderBy("user_id", "ts", "event_id")
  }

  val qLeadlagSql: String =
    """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
      |  lag(event_type) OVER w AS prev_type,
      |  epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap_us,
      |  lead(event_type) OVER w AS next_type
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, ts, event_id""".stripMargin

  /** §2.2 #18c — explicit grouping sets, finer-grained than
    * rollup/cube: ((flag, status), (flag), ()) with the grouping_id
    * disambiguator (same bit encoding in Spark and DuckDB: 1 bit per
    * column, set = aggregated out).
    */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")), Seq(col("l_returnflag")), Seq.empty[Column]),
        col("l_returnflag"),
        col("l_linestatus"),
      )
      .agg(
        grouping_id().as("gid"),
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).as("sum_qty"),
      )
      .orderBy("gid", "l_returnflag", "l_linestatus")

  val qGroupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
      |  count(*) AS n_rows,
      |  sum(l_quantity) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin

  /** §2.2 #19c — time-range (interval) join: for each purchase, the
    * count and value of the same user's clicks in the preceding 10
    * minutes.
    *
    * Scale shape: the naive plan for a non-equi time predicate is a
    * BroadcastNestedLoopJoin — O(n²) and a scale-killer. Here the range
    * is made shuffle-friendly by flooring time into buckets exactly as
    * long as the window (10 min): each click lands in one bucket, each
    * purchase explodes to its two candidate buckets, and the join is a
    * plain equi-join on (user_id, bucket) followed by the exact range
    * filter. 2× candidate amplification, zero misses, no cartesian at
    * any scale.
    *
    * The bucket is computed with subtract-mod rather than
    * divide-then-truncate: (us - us % b) / b is exact in doubles (the
    * numerator is a multiple of b and the quotient < 2^53), while
    * truncating a rounded quotient can mis-bucket boundary values.
    */
  def qRangejoin(spark: SparkSession, dir: String): DataFrame = {
    val bucketUs = 600L * 1000000L
    def bucket(us: Column): Column = ((us - pmod(us, lit(bucketUs))) / lit(bucketUs)).cast(LongType)
    val ev = table(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(
        col("user_id").as("c_user"),
        unix_micros(col("ts")).as("c_us"),
        floor(col("value").cast(DoubleType) * 100 + 0.5).cast(LongType).as("c_cents"),
      )
      .withColumn("c_bucket", bucket(col("c_us")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), unix_micros(col("ts")).as("p_us"))
    val hits = purchases
      .withColumn("pb", bucket(col("p_us")))
      .withColumn("b", explode(array(col("pb") - 1, col("pb"))))
      .join(
        clicks,
        col("user_id") === col("c_user") && col("b") === col("c_bucket") &&
          col("c_us") >= col("p_us") - lit(bucketUs) && col("c_us") < col("p_us"),
      )
      .groupBy(col("event_id"))
      .agg(count(lit(1)).as("n_clicks"), sum(col("c_cents")).as("cents"))
    purchases
      .join(hits, Seq("event_id"), "left")
      .select(
        col("event_id"),
        col("user_id"),
        col("ts"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        (dbl(coalesce(col("cents"), lit(0L))) / 100.0).as("click_value"),
      )
      .orderBy("event_id")
  }

  val qRangejoinSql: String =
    """WITH p AS (SELECT event_id, user_id, ts, epoch_us(ts) AS p_us FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT user_id AS c_user, epoch_us(ts) AS c_us,
      |        CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT) AS c_cents
      |      FROM events WHERE event_type = 'click'),
      |j AS (SELECT p.event_id, count(*) AS n_clicks, sum(c.c_cents) AS cents
      |      FROM p JOIN c ON p.user_id = c.c_user
      |        AND c.c_us >= p.p_us - 600000000 AND c.c_us < p.p_us
      |      GROUP BY p.event_id)
      |SELECT p.event_id, p.user_id, CAST(p.ts AS TIMESTAMP) AS ts,
      |  coalesce(j.n_clicks, 0) AS n_clicks,
      |  CAST(coalesce(j.cents, 0) AS DOUBLE) / 100.0 AS click_value
      |FROM p LEFT JOIN j USING (event_id)
      |ORDER BY event_id""".stripMargin

  /** §2.2 #13c — correlated scalar subquery (parts priced ≥1.01× their
    * type's average), decorrelated the way Catalyst rewrites it: the
    * per-type aggregate is computed once and broadcast back — no
    * per-row subquery execution at any scale.
    *
    * Cross-engine determinism: the comparison is done as
    * `price·n > 1.01·sum` with an exact decimal sum, so no
    * order-dependent double average is involved (§6).
    */
  def qCorrScalar(spark: SparkSession, dir: String): DataFrame = {
    val p = table(spark, dir, "part")
    val typeAgg = p.groupBy(col("p_type")).agg(
      dbl(sum(decP(col("p_retailprice")))).as("type_sum"),
      count(lit(1)).as("type_n"),
    )
    p.join(broadcast(typeAgg), Seq("p_type"))
      .filter(col("p_retailprice") * col("type_n") > lit(1.01) * col("type_sum"))
      .select(
        col("p_partkey"),
        col("p_name"),
        col("p_type"),
        col("p_retailprice"),
        (col("type_sum") / col("type_n")).as("type_avg"),
      )
      .orderBy("p_partkey")
  }

  val qCorrScalarSql: String =
    """WITH t AS (
      |  SELECT p_type,
      |    CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS type_sum,
      |    count(*) AS type_n
      |  FROM part GROUP BY p_type
      |)
      |SELECT p_partkey, p_name, p.p_type, p_retailprice, type_sum / type_n AS type_avg
      |FROM part p JOIN t ON p.p_type = t.p_type
      |WHERE p_retailprice * type_n > 1.01 * type_sum
      |ORDER BY p_partkey""".stripMargin

  /** §2.2 #21l — SCD-1 upsert (MERGE INTO semantics relationally):
    * apply a change batch to a keyed dimension, latest-wins per key
    * with a deterministic (version desc, key) tiebreak. Here the
    * change feed is each customer's orders (most recent order sets
    * the account balance to its total price); unmatched keys keep the
    * base row.
    *
    * Scale shape: union + one row_number window partitioned by the
    * merge key — a single shuffle on the key, the same plan MERGE
    * INTO compiles to in lakehouse table formats. No join explosion;
    * base and changes co-partition on the shuffle.
    */
  def qUpsert(spark: SparkSession, dir: String): DataFrame = {
    val base = table(spark, dir, "customer")
      .select(
        col("c_custkey"), col("c_name"), col("c_acctbal").as("acctbal"),
        lit(0L).as("version"), lit("base").as("src"),
      )
    val changes = table(spark, dir, "orders")
      .select(
        col("o_custkey").as("c_custkey"),
        col("o_totalprice").as("acctbal"),
        col("o_orderkey").as("version"), // orderkeys grow with time: a valid version stamp
        lit("change").as("src"),
      )
      .join(base.select(col("c_custkey")), Seq("c_custkey"), "left_semi")
    val named = changes
      .join(base.select(col("c_custkey"), col("c_name")), Seq("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("acctbal"), col("version"), col("src"))
    val w = Window.partitionBy(col("c_custkey")).orderBy(col("version").desc)
    base.unionByName(named)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("c_custkey"), col("c_name"), col("acctbal"), col("version"), col("src"))
      .orderBy("c_custkey")
  }

  val qUpsertSql: String =
    """WITH base AS (
      |  SELECT c_custkey, c_name, c_acctbal AS acctbal, CAST(0 AS BIGINT) AS version, 'base' AS src
      |  FROM customer
      |), changes AS (
      |  SELECT o.o_custkey AS c_custkey, c.c_name, o.o_totalprice AS acctbal,
      |    o.o_orderkey AS version, 'change' AS src
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |), u AS (
      |  SELECT c_custkey, c_name, acctbal, version, src FROM base
      |  UNION ALL
      |  SELECT c_custkey, c_name, acctbal, version, src FROM changes
      |)
      |SELECT c_custkey, c_name, acctbal, version, src FROM (
      |  SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY version DESC) AS rn FROM u
      |)
      |WHERE rn = 1
      |ORDER BY c_custkey""".stripMargin

  /** §2.2 #21m — ordered funnel analysis (view → click → purchase):
    * per user, the first view, the first click strictly AFTER that
    * view, and the first purchase strictly after that click — the
    * product-analytics conversion primitive, distinct from
    * sessionization (order across types, not gaps within a stream).
    *
    * Scale shape: one keyed aggregation per stage plus a keyed join
    * against the previous stage — every shuffle is on user_id, so the
    * stages co-partition and AQE reuses the exchange; no windows over
    * the full event stream. Cross-engine exactness: every comparison
    * and min() runs on integer epoch-MICROSECONDS on both sides
    * (events.parquet carries nanos; comparing raw timestamps would
    * let DuckDB see sub-µs orderings Spark's µs truncation cannot).
    */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = table(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
    def stage(tpe: String, prev: DataFrame, prevCol: String, outCol: String): DataFrame =
      e.filter(col("event_type") === tpe)
        .join(prev.select(col("user_id"), col(prevCol)), "user_id")
        .filter(col("us") > col(prevCol))
        .groupBy(col("user_id"))
        .agg(min(col("us")).as(outCol))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("ts_view_us"))
    val c = stage("click", v, "ts_view_us", "ts_click_us")
    val p = stage("purchase", c, "ts_click_us", "ts_purchase_us")
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(
        col("user_id"),
        col("ts_view_us"),
        col("ts_click_us"),
        col("ts_purchase_us"),
        (lit(1L) + col("ts_click_us").isNotNull.cast(LongType) + col("ts_purchase_us").isNotNull.cast(LongType))
          .as("depth"),
      )
      .orderBy("user_id")
  }

  val qFunnelSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_type FROM events
      |), v AS (
      |  SELECT user_id, min(us) AS ts_view_us FROM e WHERE event_type = 'view' GROUP BY user_id
      |), c AS (
      |  SELECT e.user_id, min(us) AS ts_click_us
      |  FROM e JOIN v USING (user_id)
      |  WHERE event_type = 'click' AND us > ts_view_us
      |  GROUP BY e.user_id
      |), p AS (
      |  SELECT e.user_id, min(us) AS ts_purchase_us
      |  FROM e JOIN c USING (user_id)
      |  WHERE event_type = 'purchase' AND us > ts_click_us
      |  GROUP BY e.user_id
      |)
      |SELECT v.user_id, ts_view_us, ts_click_us, ts_purchase_us,
      |  CAST(1 + (CASE WHEN ts_click_us IS NULL THEN 0 ELSE 1 END)
      |         + (CASE WHEN ts_purchase_us IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS depth
      |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
      |ORDER BY user_id""".stripMargin

  /** §2.2 #21mm — CONVERSION-WINDOW funnel (the product-analytics
    * variant of [[qFunnel]]): each stage counts only if it lands
    * inside a bounded window after the previous stage — click within
    * 3 days of the first view, purchase within 7 days of that click —
    * which is how real funnel reports are defined ("conversion
    * window"); the unbounded funnel overstates conversion by crediting
    * arbitrarily-late events. Output adds the exact per-stage
    * latencies the bounded semantics make meaningful.
    *
    * Scale shape: identical to qFunnel — per-stage min-aggregation on
    * user_id (map-side combinable) joined forward, all equi-joins on
    * the user key; the window bound is a map-side predicate, free at
    * any scale. Latencies are exact int64 microsecond differences.
    */
  def qFunnelWindow(spark: SparkSession, dir: String): DataFrame = {
    val DayUs = 86400000000L
    val e = table(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_type"))
    def stage(tpe: String, prev: DataFrame, prevCol: String, outCol: String, windowUs: Long): DataFrame =
      e.filter(col("event_type") === tpe)
        .join(prev.select(col("user_id"), col(prevCol)), "user_id")
        .filter(col("us") > col(prevCol) && col("us") <= col(prevCol) + windowUs)
        .groupBy(col("user_id"))
        .agg(min(col("us")).as(outCol))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("ts_view_us"))
    val c = stage("click", v, "ts_view_us", "ts_click_us", 3 * DayUs)
    val p = stage("purchase", c, "ts_click_us", "ts_purchase_us", 7 * DayUs)
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .select(
        col("user_id"),
        col("ts_view_us"),
        (col("ts_click_us") - col("ts_view_us")).as("click_lag_us"),
        (col("ts_purchase_us") - col("ts_click_us")).as("purchase_lag_us"),
        (lit(1L) + col("ts_click_us").isNotNull.cast(LongType) + col("ts_purchase_us").isNotNull.cast(LongType))
          .as("depth"),
      )
      .orderBy("user_id")
  }

  val qFunnelWindowSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_type FROM events
      |), v AS (
      |  SELECT user_id, min(us) AS ts_view_us FROM e WHERE event_type = 'view' GROUP BY user_id
      |), c AS (
      |  SELECT e.user_id, min(us) AS ts_click_us
      |  FROM e JOIN v USING (user_id)
      |  WHERE event_type = 'click' AND us > ts_view_us AND us <= ts_view_us + 3 * 86400000000
      |  GROUP BY e.user_id
      |), p AS (
      |  SELECT e.user_id, min(us) AS ts_purchase_us
      |  FROM e JOIN c USING (user_id)
      |  WHERE event_type = 'purchase' AND us > ts_click_us AND us <= ts_click_us + 7 * 86400000000
      |  GROUP BY e.user_id
      |)
      |SELECT user_id, ts_view_us,
      |  ts_click_us - ts_view_us AS click_lag_us,
      |  ts_purchase_us - ts_click_us AS purchase_lag_us,
      |  CAST(1 + (ts_click_us IS NOT NULL)::int + (ts_purchase_us IS NOT NULL)::int AS BIGINT) AS depth
      |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
      |ORDER BY user_id""".stripMargin

  /** §2.2 #21s — last-touch attribution: each purchase is credited to
    * the same user's most recent PRECEDING non-purchase touchpoint
    * (view/click/signup/error), 'none' when there is no touch within
    * 7 days — the marketing-analytics revenue-attribution primitive,
    * distinct from [[qFunnel]] (which takes first events per stage,
    * not the last touch before each conversion).
    *
    * Scale shape: one window pass partitioned by user (`last(...,
    * ignoreNulls)` over a ROWS frame — a running carry, no self-join
    * against the touch stream) followed by a tiny channel rollup.
    * Cross-engine exactness: ordering is (µs, event_id) — total and
    * identical in both engines — and revenue sums as integer cents
    * (`floor(value*100)`: both engines run the same IEEE double ops,
    * then sum exactly).
    */
  def qAttribution(spark: SparkSession, dir: String): DataFrame = {
    val e = table(spark, dir, "events")
      .select(
        col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"), col("event_type"),
        floor(col("value") * 100).cast(LongType).as("cents"),
      )
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase", struct(col("us"), col("event_type")))
    val sevenDaysUs = 7L * 24 * 3600 * 1000000L
    e.withColumn("lt", last(touch, ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        when(col("lt").isNull || col("us") - col("lt.us") > sevenDaysUs, "none")
          .otherwise(col("lt.event_type")).as("attr_channel"),
        col("cents"),
      )
      .groupBy(col("attr_channel"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("total_cents"))
      .orderBy("attr_channel")
  }

  val qAttributionSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type,
      |    CAST(floor(value * 100) AS BIGINT) AS cents
      |  FROM events
      |), t AS (
      |  SELECT *,
      |    last_value(CASE WHEN event_type <> 'purchase'
      |                    THEN struct_pack(us := us, event_type := event_type) END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY us, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
      |  FROM e
      |), p AS (
      |  SELECT CASE WHEN lt IS NULL OR us - lt.us > 604800000000 THEN 'none'
      |              ELSE lt.event_type END AS attr_channel,
      |    cents
      |  FROM t WHERE event_type = 'purchase'
      |)
      |SELECT attr_channel, count(*) AS n_purchases, CAST(sum(cents) AS BIGINT) AS total_cents
      |FROM p GROUP BY attr_channel
      |ORDER BY attr_channel""".stripMargin

  /** §2.2 #21n — bidirectional two-nation trade volume by year, TPC-H
    * Q7 shape: the big fact join (lineitem⋈orders) shuffles on
    * orderkey once; customer/supplier/nation are broadcast dims, so
    * the nation-pair filter prunes map-side before the fact shuffle's
    * output is aggregated. Decimal-exact revenue (§6 parity rules).
    */
  def q7Volume(spark: SparkSession, dir: String): DataFrame = {
    val n1 = table(spark, dir, "nation").select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = table(spark, dir, "nation").select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val s = table(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val c = table(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val o = table(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val l = table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1998-01-01"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(
        (col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_11") ||
          (col("supp_nation") === "NATION_11" && col("cust_nation") === "NATION_19")
      )
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).cast(LongType).as("l_year"))
      .agg(dbl(sum(decP(col("l_extendedprice")) * (one - decR(col("l_discount"))))).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7VolumeSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE ((n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_11')
      |    OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_19'))
      |  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  /** §2.2 #21o — national market share by year, TPC-H Q8 shape: the
    * share is a quotient of two decimal-exact sums (conditional
    * numerator over the same rows), divided once as doubles — the
    * one-division form is bit-identical across engines where a
    * per-row double ratio sum would not be.
    */
  def q8Share(spark: SparkSession, dir: String): DataFrame = {
    val nCust = table(spark, dir, "nation").select(col("n_nationkey").as("c_nk"), col("n_regionkey"))
    val r = table(spark, dir, "region").filter(col("r_name") === "EUROPE")
    val nSupp = table(spark, dir, "nation").select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val p = table(spark, dir, "part").filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
    val s = table(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val c = table(spark, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
    val o = table(spark, dir, "orders").select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val l = table(spark, dir, "lineitem")
    val vol = decP(col("l_extendedprice")) * (one - decR(col("l_discount")))
    val natVol = when(col("supp_nation") === "NATION_3", vol).otherwise(lit(0).cast(DecimalType(3, 2)))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nCust), col("c_nationkey") === col("c_nk"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nSupp), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"))
      .agg(
        dbl(sum(natVol)).as("nation_volume"),
        dbl(sum(vol)).as("total_volume"),
        (dbl(sum(natVol)) / dbl(sum(vol))).as("mkt_share"),
      )
      .orderBy("o_year")
  }

  val q8ShareSql: String =
    """WITH v AS (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |    CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) AS vol,
      |    CASE WHEN n2.n_name = 'NATION_3'
      |      THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
      |      ELSE CAST(0 AS DECIMAL(3,2)) END AS nat_vol
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |  JOIN region ON n1.n_regionkey = r_regionkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |  WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
      |)
      |SELECT o_year,
      |  CAST(sum(nat_vol) AS DOUBLE) AS nation_volume,
      |  CAST(sum(vol) AS DOUBLE) AS total_volume,
      |  CAST(sum(nat_vol) AS DOUBLE) / CAST(sum(vol) AS DOUBLE) AS mkt_share
      |FROM v GROUP BY o_year ORDER BY o_year""".stripMargin

  /** §2.2 #21p — per-column data profiling (count / nulls / exact NDV
    * / typed min-max), the scan-side quality report a lake runs before
    * accepting a drop. One union branch per column, each a
    * column-PRUNED scan + partial aggregate: the single-aggregate
    * multi-countDistinct alternative plans an Expand that replicates
    * every full-width row once per distinct aggregate (measured 7×
    * slower at sf0.1, and strictly worse at 100 TB where the wide scan
    * dominates). Numeric and string extremes live in typed columns
    * (casting a double extreme through a string would be
    * engine-repr-dependent); dates are ISO-formatted.
    */
  def profileTable(spark: SparkSession, dir: String): DataFrame = {
    val l = table(spark, dir, "lineitem")
    def base(c: String) = l.select(col(c)).agg(
      count(lit(1)).as("n_rows"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
      countDistinct(col(c)).as("n_distinct"),
      min(col(c)).as("mn"),
      max(col(c)).as("mx"),
    )
    def num(c: String) = base(c).select(
      lit(c).as("column_name"), col("n_rows"), col("n_nulls"), col("n_distinct"),
      dbl(col("mn")).as("min_d"), dbl(col("mx")).as("max_d"),
      lit(null).cast(StringType).as("min_s"), lit(null).cast(StringType).as("max_s"),
    )
    def str(c: String) = base(c).select(
      lit(c).as("column_name"), col("n_rows"), col("n_nulls"), col("n_distinct"),
      lit(null).cast(DoubleType).as("min_d"), lit(null).cast(DoubleType).as("max_d"),
      col("mn").as("min_s"), col("mx").as("max_s"),
    )
    def dt(c: String) = base(c).select(
      lit(c).as("column_name"), col("n_rows"), col("n_nulls"), col("n_distinct"),
      lit(null).cast(DoubleType).as("min_d"), lit(null).cast(DoubleType).as("max_d"),
      date_format(col("mn"), "yyyy-MM-dd").as("min_s"), date_format(col("mx"), "yyyy-MM-dd").as("max_s"),
    )
    Seq(num("l_quantity"), num("l_extendedprice"), num("l_discount"),
      str("l_returnflag"), str("l_linestatus"), dt("l_shipdate"))
      .reduce(_.unionAll(_))
      .orderBy("column_name")
  }

  val profileTableSql: String = {
    def num(c: String) =
      s"""SELECT '$c' AS column_name, count(*) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  count(DISTINCT $c) AS n_distinct,
         |  CAST(min($c) AS DOUBLE) AS min_d, CAST(max($c) AS DOUBLE) AS max_d,
         |  CAST(NULL AS VARCHAR) AS min_s, CAST(NULL AS VARCHAR) AS max_s
         |FROM lineitem""".stripMargin
    def str(c: String) =
      s"""SELECT '$c', count(*),
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         |  count(DISTINCT $c),
         |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), min($c), max($c)
         |FROM lineitem""".stripMargin
    def dt(c: String) =
      s"""SELECT '$c', count(*),
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         |  count(DISTINCT $c),
         |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
         |  strftime(min($c), '%Y-%m-%d'), strftime(max($c), '%Y-%m-%d')
         |FROM lineitem""".stripMargin
    Seq(num("l_quantity"), num("l_extendedprice"), num("l_discount"),
      str("l_returnflag"), str("l_linestatus"), dt("l_shipdate"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  /** §2.2 #21q — returned-item revenue by customer, TPC-H Q10 shape:
    * one fact shuffle (filtered lineitem⋈orders), customer/nation
    * broadcast, decimal-exact revenue, deterministic top-20.
    */
  def q10Returns(spark: SparkSession, dir: String): DataFrame = {
    val l = table(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
    val o = table(spark, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
    val c = table(spark, dir, "customer")
    val n = table(spark, dir, "nation")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(dbl(sum(decP(col("l_extendedprice")) * (one - decR(col("l_discount"))))).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10ReturnsSql: String =
    """SELECT c_custkey, c_name, n_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE l_returnflag = 'R'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY c_custkey, c_name, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** §2.2 #21r — customer order-count distribution, TPC-H Q13 shape:
    * a LEFT join (customers with zero orders must survive into the
    * c_count=0 bucket) followed by a second aggregation over the
    * first's output — the double-grouping histogram plan.
    */
  def q13Custdist(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "customer").select(col("c_custkey"))
    val o = table(spark, dir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13CustdistSql: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority != '1-URGENT'
      |  GROUP BY c_custkey
      |)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** §2.2 #21s — time-RANGE rolling window frames: per-user rolling
    * 1-hour event count and value sum at every event. RANGE frames
    * (not ROWS) — the frame is defined by the timestamp interval, so
    * ties and irregular spacing are handled exactly; integer-µs frame
    * bounds and floor-int sums keep it hash-exact cross-engine. One
    * shuffle on user_id; the sort inside each partition is the window
    * operator's own.
    */
  def qRolling(spark: SparkSession, dir: String): DataFrame = {
    val hourUs = 3600L * 1000000
    val w = Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_us"))
      .rangeBetween(-hourUs, 0)
    table(spark, dir, "events")
      .select(
        col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        floor(col("value")).cast(LongType).as("v"),
      )
      .select(
        col("event_id"), col("user_id"), col("ts_us"),
        count(lit(1)).over(w).as("n_1h"),
        sum(col("v")).over(w).as("sum_1h"),
      )
      .orderBy("event_id")
  }

  val qRollingSql: String =
    """SELECT event_id, user_id, epoch_us(ts) AS ts_us,
      |  count(*) OVER w AS n_1h,
      |  CAST(sum(CAST(floor(value) AS BIGINT)) OVER w AS BIGINT) AS sum_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** §2.2 #21t — Z-order layout key + clustering audit: the
    * bit-interleaved (Morton) key Delta/Iceberg OPTIMIZE ZORDER sorts
    * by, plus the per-bucket min-max spans that show WHY it prunes —
    * after a z-sort, file-level min/max on BOTH dims stay narrow
    * simultaneously, which no single-dim sort achieves. The interleave
    * is the classic 5-step magic-number spread — pure int64 bit ops,
    * exact in both engines, computed map-side at scan throughput.
    */
  private def zSpread(c: String): String = {
    val m1 = s"($c & 65535)"
    val m2 = s"(($m1 | shiftleft($m1, 8)) & 16711935)" // 0x00FF00FF
    val m3 = s"(($m2 | shiftleft($m2, 4)) & 252645135)" // 0x0F0F0F0F
    val m4 = s"(($m3 | shiftleft($m3, 2)) & 858993459)" // 0x33333333
    s"(($m4 | shiftleft($m4, 1)) & 1431655765)" // 0x55555555
  }

  def qZorder(spark: SparkSession, dir: String): DataFrame = {
    val l = table(spark, dir, "lineitem")
    // min-max normalize each dim to the 16-bit grid first: raw keys
    // occupy only the low bits of their domain, which would leave the
    // interleaved key's high bits all-zero and every row in bucket 0.
    // One broadcast 1-row bounds aggregate; integer scaling is exact
    // in both engines.
    val bounds = l.agg(
      min(col("l_partkey")).as("p_lo"), max(col("l_partkey")).as("p_hi"),
      min(col("l_suppkey")).as("s_lo"), max(col("l_suppkey")).as("s_hi"),
    )
    val pn = "((l_partkey - p_lo) * 65536 DIV (p_hi - p_lo + 1))"
    val sn = "((l_suppkey - s_lo) * 65536 DIV (s_hi - s_lo + 1))"
    val z = s"(${zSpread(pn)} | shiftleft(${zSpread(sn)}, 1))"
    l.join(broadcast(bounds), lit(true))
      .select(col("l_partkey"), col("l_suppkey"), expr(z).as("zval"))
      .groupBy(expr("shiftright(zval, 26)").cast(LongType).as("z_bucket"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
        min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"),
      )
      .orderBy("z_bucket")
  }

  val qZorderSql: String = {
    def spread(c: String): String = {
      val m1 = s"($c & 65535)"
      val m2 = s"(($m1 | ($m1 << 8)) & 16711935)"
      val m3 = s"(($m2 | ($m2 << 4)) & 252645135)"
      val m4 = s"(($m3 | ($m3 << 2)) & 858993459)"
      s"(($m4 | ($m4 << 1)) & 1431655765)"
    }
    val pn = "((l_partkey - p_lo) * 65536 // (p_hi - p_lo + 1))"
    val sn = "((l_suppkey - s_lo) * 65536 // (s_hi - s_lo + 1))"
    val z = s"(${spread(pn)} | (${spread(sn)} << 1))"
    s"""WITH b AS (
       |  SELECT min(l_partkey) AS p_lo, max(l_partkey) AS p_hi,
       |         min(l_suppkey) AS s_lo, max(l_suppkey) AS s_hi
       |  FROM lineitem
       |)
       |SELECT $z >> 26 AS z_bucket,
       |  count(*) AS n_rows,
       |  min(l_partkey) AS min_part, max(l_partkey) AS max_part,
       |  min(l_suppkey) AS min_supp, max(l_suppkey) AS max_supp
       |FROM lineitem, b
       |GROUP BY 1
       |ORDER BY 1""".stripMargin
  }

  /** §2.2 #21u — referential-integrity audit: orphan counts for every
    * foreign-key edge of the schema, the relational fsck a lake runs
    * after ingest. Each check is one anti-join — dims broadcast, fact
    * keys projected before the join so the shuffle carries 8-byte
    * keys, and the per-check counts union into a single report.
    */
  def qIntegrity(spark: SparkSession, dir: String): DataFrame = {
    def orphans(name: String, fact: DataFrame, key: String, dim: DataFrame, dimKey: String) =
      fact.select(col(key))
        .join(broadcast(dim.select(col(dimKey))), col(key) === col(dimKey), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
        .select(lit(name).as("fk_edge"), col("n_orphans"))
    val l = table(spark, dir, "lineitem")
    val o = table(spark, dir, "orders")
    val c = table(spark, dir, "customer")
    val s = table(spark, dir, "supplier")
    val p = table(spark, dir, "part")
    val n = table(spark, dir, "nation")
    val r = table(spark, dir, "region")
    Seq(
      orphans("lineitem->orders", l, "l_orderkey", o, "o_orderkey"),
      orphans("lineitem->part", l, "l_partkey", p, "p_partkey"),
      orphans("lineitem->supplier", l, "l_suppkey", s, "s_suppkey"),
      orphans("orders->customer", o, "o_custkey", c, "c_custkey"),
      orphans("customer->nation", c, "c_nationkey", n, "n_nationkey"),
      orphans("supplier->nation", s, "s_nationkey", n, "n_nationkey"),
      orphans("nation->region", n, "n_regionkey", r, "r_regionkey"),
    ).reduce(_.unionAll(_)).orderBy("fk_edge")
  }

  val qIntegritySql: String = {
    def orphans(name: String, fact: String, key: String, dim: String, dimKey: String) =
      s"""SELECT '$name' AS fk_edge, count(*) AS n_orphans
         |FROM $fact WHERE NOT EXISTS (SELECT 1 FROM $dim WHERE $dimKey = $fact.$key)""".stripMargin
    Seq(
      orphans("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      orphans("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
      orphans("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      orphans("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
      orphans("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      orphans("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      orphans("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ).mkString("", "\nUNION ALL\n", "\nORDER BY fk_edge")
  }

  /** §2.2 #21v — large-volume orders, TPC-H Q18 shape: aggregate the
    * fact ONCE on its own key (one shuffle, map-side partials), filter
    * to the rare heavy orders, then BROADCAST the survivors into
    * orders and customer — at 100 TB the >200-qty set is a vanishing
    * fraction of orders, so nothing else shuffles. l_quantity is an
    * integral-valued double: summed raw, exact in fp in any order.
    */
  def q18Large(spark: SparkSession, dir: String): DataFrame = {
    val qty = table(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 200)
    val o = table(spark, dir, "orders")
    val c = table(spark, dir, "customer")
    o.join(broadcast(qty), col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(
        col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"),
      )
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18LargeSql: String =
    """SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
      |FROM orders
      |JOIN (
      |  SELECT l_orderkey, sum(l_quantity) AS total_qty
      |  FROM lineitem GROUP BY l_orderkey
      |) t ON o_orderkey = l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE total_qty > 200
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** §2.2 #21w — promo revenue share by month, TPC-H Q14 shape: the
    * conditional-numerator pattern — both sums decimal-exact in one
    * grouped pass over the filtered fact (part broadcast), divided
    * ONCE as doubles at the end (the q8_share rule: a single division
    * of two exact operands is one IEEE op, bit-identical in both
    * engines; dividing per-row would compound rounding).
    */
  def q14Promo(spark: SparkSession, dir: String): DataFrame = {
    val l = table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01"))
    val p = table(spark, dir, "part")
    val rev = decP(col("l_extendedprice")) * (one - decR(col("l_discount")))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(month(col("l_shipdate")).cast(LongType).as("month"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0).cast(DecimalType(12, 2)))).as("_promo"),
        sum(rev).as("_total"),
      )
      .select(
        col("month"),
        dbl(col("_promo")).as("promo_revenue"),
        dbl(col("_total")).as("total_revenue"),
        (lit(100.0) * dbl(col("_promo")) / dbl(col("_total"))).as("promo_share"),
      )
      .orderBy("month")
  }

  val q14PromoSql: String =
    """SELECT month,
      |  CAST(promo AS DOUBLE) AS promo_revenue,
      |  CAST(total AS DOUBLE) AS total_revenue,
      |  100.0 * CAST(promo AS DOUBLE) / CAST(total AS DOUBLE) AS promo_share
      |FROM (
      |  SELECT CAST(month(l_shipdate) AS BIGINT) AS month,
      |    sum(CASE WHEN p_type = 'PROMO'
      |        THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
      |        ELSE CAST(0 AS DECIMAL(12,2)) END) AS promo,
      |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS total
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  GROUP BY 1
      |)
      |ORDER BY month""".stripMargin

  /** §2.2 #21x — top supplier(s) by quarterly revenue, TPC-H Q15
    * shape: the revenue view aggregates once on l_suppkey, the global
    * max is a 1-row aggregate broadcast back as an equi-join on the
    * DECIMAL revenue (exact equality — the double round-trip could
    * miss ties), and supplier is broadcast. The classic view+scalar
    * -subquery query, decorrelated by hand into two broadcast joins.
    */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(decP(col("l_extendedprice")) * (one - decR(col("l_discount")))).as("_rev"))
    val maxRev = rev.agg(max(col("_rev")).as("_max_rev"))
    rev.join(broadcast(maxRev), col("_rev") === col("_max_rev"))
      .join(broadcast(table(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), dbl(col("_rev")).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  val q15TopSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS r
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY l_suppkey
      |)
      |SELECT s_suppkey, s_name, CAST(r AS DOUBLE) AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE r = (SELECT max(r) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** §2.2 #21y — grouped EXACT percentiles (p25/p50/p75) by
    * sort-based selection: rank inside each group, pick the value at
    * position ceil(p·n). One shuffle on the group key; the per-group
    * sort is the window operator's own sort-based aggregation — the
    * scalable exact-quantile plan (approx_percentile is the sketch
    * analog, q_sketches). Values floored to int64 so the selected
    * element is hash-exact cross-engine; ties don't matter because
    * position-k of a sorted multiset is tie-order-invariant.
    */
  def qMedian(spark: SparkSession, dir: String): DataFrame = {
    val e = table(spark, dir, "events")
      .select(col("event_type"), floor(col("value")).cast(LongType).as("v"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("v"))
    val wc = Window.partitionBy(col("event_type"))
    e.select(
        col("event_type"), col("v"),
        row_number().over(w).as("rn"),
        count(lit(1)).over(wc).as("n"),
      )
      .groupBy(col("event_type"))
      .agg(
        max(col("n")).as("n"),
        max(when(col("rn") === expr("(n + 3) div 4"), col("v"))).as("p25"),
        max(when(col("rn") === expr("(n + 1) div 2"), col("v"))).as("p50"),
        max(when(col("rn") === expr("(3 * n + 3) div 4"), col("v"))).as("p75"),
      )
      .orderBy("event_type")
  }

  val qMedianSql: String =
    """WITH ranked AS (
      |  SELECT event_type, CAST(floor(value) AS BIGINT) AS v,
      |    row_number() OVER (PARTITION BY event_type ORDER BY CAST(floor(value) AS BIGINT)) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events
      |)
      |SELECT event_type, max(n) AS n,
      |  max(CASE WHEN rn = (n + 3) // 4 THEN v END) AS p25,
      |  max(CASE WHEN rn = (n + 1) // 2 THEN v END) AS p50,
      |  max(CASE WHEN rn = (3 * n + 3) // 4 THEN v END) AS p75
      |FROM ranked
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** §2.2 #21co — grouped exact WEIGHTED quartiles from a compressed
    * histogram: per return flag, the revenue-weighted p25/p50/p75 of
    * quantity — "what quantity splits the money in half", the
    * measure unweighted [[qMedian]] cannot answer (a million cheap
    * one-unit rows and one huge bulk order weigh the same to
    * row-median). Weighted selection has no row-rank shortcut, so
    * the scale plan compresses first: one map-side-combined rollup
    * to (flag, qty) weight sums — ≤ |flags|·|distinct qty| rows
    * regardless of fact size — then a running-sum window over that
    * histogram and a conditional-min pick of the smallest qty whose
    * cumulative weight covers p·total (4·cum ≥ total, 2·cum ≥ total,
    * 4·cum ≥ 3·total in int math). The fact table never sorts — the
    * same histogram-quantile shape as `text_adaptive_filter`, here
    * with int64-cent weights instead of unit counts.
    */
  def qWmedian(spark: SparkSession, dir: String): DataFrame = {
    val hist = table(spark, dir, "lineitem")
      .select(col("l_returnflag"),
        col("l_quantity").cast(LongType).as("qty"),
        (decP(col("l_extendedprice")) * 100).cast(LongType).as("cents"))
      .groupBy(col("l_returnflag"), col("qty"))
      .agg(sum(col("cents")).as("w"))
    val wcum = Window.partitionBy(col("l_returnflag")).orderBy(col("qty"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist
      .withColumn("cum", sum(col("w")).over(wcum))
      .withColumn("tot", sum(col("w")).over(Window.partitionBy(col("l_returnflag"))))
      .groupBy(col("l_returnflag"))
      .agg(
        min(col("tot")).as("total_cents"),
        min(when(col("cum") * 4 >= col("tot"), col("qty"))).as("wp25"),
        min(when(col("cum") * 2 >= col("tot"), col("qty"))).as("wp50"),
        min(when(col("cum") * 4 >= col("tot") * 3, col("qty"))).as("wp75"),
      )
      .orderBy("l_returnflag")
  }

  val qWmedianSql: String =
    """WITH hist AS (
      |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS w
      |  FROM lineitem GROUP BY l_returnflag, CAST(l_quantity AS BIGINT)
      |), cum AS (
      |  SELECT l_returnflag, qty, w,
      |    CAST(sum(w) OVER (PARTITION BY l_returnflag ORDER BY qty
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
      |    CAST(sum(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
      |  FROM hist
      |)
      |SELECT l_returnflag,
      |  min(tot) AS total_cents,
      |  min(CASE WHEN cum * 4 >= tot THEN qty END) AS wp25,
      |  min(CASE WHEN cum * 2 >= tot THEN qty END) AS wp50,
      |  min(CASE WHEN cum * 4 >= tot * 3 THEN qty END) AS wp75
      |FROM cum
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** §2.2 #21bq — data drift report (the data-contract monitor): the
    * orders table split into an "old" and "new" half at the midpoint
    * of its date range, then per-column distribution statistics
    * compared across the halves — NDV and modal-value share for the
    * categorical columns, mean/min/max cents for the price — each
    * with an integer relative-delta drift flag (|new−old|·10 > old,
    * i.e. >10% relative change, float-free). This is the report a
    * scheduled pipeline runs on every new partition before training
    * on it: schema is rarely what breaks silently, distributions are.
    *
    * Scale shape: the midpoint is a 1-row min/max aggregate (driver
    * scalar, the qZonemap shape); every metric is a map-side-combined
    * groupBy over (half[, value]) — rollup-scale shuffles; the final
    * report is a dozen rows.
    */
  def qDrift(spark: SparkSession, dir: String): DataFrame = {
    val o0 = table(spark, dir, "orders")
      .select(col("o_orderstatus").as("status"), col("o_orderpriority").as("prio"),
        floor(col("o_totalprice") * 100 + 0.5).cast(LongType).as("cents"),
        expr("unix_micros(o_orderdate) DIV 86400000000").as("day"))
    val b = o0.agg(min(col("day")).as("lo"), max(col("day")).as("hi")).head
    val mid = (b.getLong(0) + b.getLong(1)) / 2
    val o = o0.withColumn("half", when(col("day") <= mid, "old").otherwise("new"))
    def catStats(c: String): DataFrame = {
      val counts = o.groupBy(col("half"), col(c).as("v")).agg(count(lit(1)).as("n"))
      val per = counts.groupBy(col("half"))
        .agg(count(lit(1)).as("ndv"), max(col("n")).as("top_n"), sum(col("n")).as("total"))
        .select(col("half"), col("ndv"),
          expr("top_n * 1000000 div total").as("top_share_ppm"))
      per.select(lit(s"${c}_ndv").as("metric"), col("half"), col("ndv").as("v"))
        .unionByName(per.select(lit(s"${c}_top_share_ppm").as("metric"), col("half"),
          col("top_share_ppm").as("v")))
    }
    val numStats = o.groupBy(col("half"))
      .agg(expr("sum(cents) div count(*)").as("mean"), min(col("cents")).as("mn"),
        max(col("cents")).as("mx"))
    val num = numStats.select(lit("cents_mean").as("metric"), col("half"), col("mean").as("v"))
      .unionByName(numStats.select(lit("cents_min").as("metric"), col("half"), col("mn").as("v")))
      .unionByName(numStats.select(lit("cents_max").as("metric"), col("half"), col("mx").as("v")))
    catStats("status").unionByName(catStats("prio")).unionByName(num)
      .groupBy(col("metric"))
      .agg(max(when(col("half") === "old", col("v"))).as("old_v"),
        max(when(col("half") === "new", col("v"))).as("new_v"))
      .withColumn("drift", abs(col("new_v") - col("old_v")) * 10 > abs(col("old_v")))
      .orderBy("metric")
  }

  val qDriftSql: String =
    """WITH o0 AS (
      |  SELECT o_orderstatus AS status, o_orderpriority AS prio,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
      |    epoch_us(o_orderdate) // 86400000000 AS day
      |  FROM orders
      |), b AS (SELECT (min(day) + max(day)) // 2 AS mid FROM o0),
      |o AS (
      |  SELECT *, CASE WHEN day <= mid THEN 'old' ELSE 'new' END AS half
      |  FROM o0 CROSS JOIN b
      |), cs AS (
      |  SELECT half, status AS v, count(*) AS n FROM o GROUP BY 1, 2
      |), cps AS (
      |  SELECT half, prio AS v, count(*) AS n FROM o GROUP BY 1, 2
      |), m AS (
      |  SELECT 'status_ndv' AS metric, half, count(*) AS v FROM cs GROUP BY half
      |  UNION ALL
      |  SELECT 'status_top_share_ppm', half, max(n) * 1000000 // sum(n) FROM cs GROUP BY half
      |  UNION ALL
      |  SELECT 'prio_ndv', half, count(*) FROM cps GROUP BY half
      |  UNION ALL
      |  SELECT 'prio_top_share_ppm', half, max(n) * 1000000 // sum(n) FROM cps GROUP BY half
      |  UNION ALL
      |  SELECT 'cents_mean', half, sum(cents) // count(*) FROM o GROUP BY half
      |  UNION ALL
      |  SELECT 'cents_min', half, min(cents) FROM o GROUP BY half
      |  UNION ALL
      |  SELECT 'cents_max', half, max(cents) FROM o GROUP BY half
      |)
      |SELECT metric,
      |  CAST(max(CASE WHEN half = 'old' THEN v END) AS BIGINT) AS old_v,
      |  CAST(max(CASE WHEN half = 'new' THEN v END) AS BIGINT) AS new_v,
      |  abs(max(CASE WHEN half = 'new' THEN v END) - max(CASE WHEN half = 'old' THEN v END)) * 10
      |    > abs(max(CASE WHEN half = 'old' THEN v END)) AS drift
      |FROM m GROUP BY metric
      |ORDER BY metric""".stripMargin

  /** §2.2 #21br — chi-square independence test (status × priority
    * contingency table): per-cell observed count, expected count, and
    * χ² contribution (O·N − R·C)²/(N·R·C) — the categorical-dependence
    * screen behind feature selection and A/B guardrails, at table
    * scale. Cross-engine exactness: the numerator is exact in
    * DECIMAL(38,0) (it overflows int64 past ~2M rows), each cell's
    * single division runs in IEEE double — exactly rounded, so both
    * engines agree bit-for-bit even past 2^53 — and is floor-quantized
    * to micro-units BEFORE any summation, so the χ² total (the sum of
    * the output column) is order-free. N comes from a driver scalar
    * (the qZonemap shape), R/C from broadcast-joined rollups of the
    * cell table itself — one fact-grain shuffle, then 15-row algebra.
    */
  def qChisq(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
      .select(col("o_orderstatus").as("status"), col("o_orderpriority").as("prio"))
    val n = o.count()
    val cells = o.groupBy(col("status"), col("prio")).agg(count(lit(1)).as("o_n"))
    val rs = cells.groupBy(col("status")).agg(sum(col("o_n")).as("r_n"))
    val cs = cells.groupBy(col("prio")).agg(sum(col("o_n")).as("c_n"))
    cells
      .join(broadcast(rs), Seq("status"))
      .join(broadcast(cs), Seq("prio"))
      .withColumn("num",
        (col("o_n") * n - col("r_n") * col("c_n")).cast(DecimalType(38, 0)))
      .select(
        col("status"), col("prio"), col("o_n"),
        floor(col("r_n").cast(DoubleType) * col("c_n") * 1000000.0 / n).cast(LongType)
          .as("expected_micro"),
        floor((col("num") * col("num")).cast(DoubleType) * 1000000.0
          / (lit(n.toDouble) * col("r_n") * col("c_n"))).cast(LongType)
          .as("chisq_contrib_micro"),
      )
      .orderBy("status", "prio")
  }

  val qChisqSql: String =
    """WITH o AS (
      |  SELECT o_orderstatus AS status, o_orderpriority AS prio FROM orders
      |), cells AS (
      |  SELECT status, prio, count(*) AS o_n FROM o GROUP BY 1, 2
      |), rs AS (SELECT status, CAST(sum(o_n) AS BIGINT) AS r_n FROM cells GROUP BY status),
      |cs AS (SELECT prio, CAST(sum(o_n) AS BIGINT) AS c_n FROM cells GROUP BY prio),
      |nn AS (SELECT CAST(sum(o_n) AS BIGINT) AS n FROM cells)
      |SELECT c.status, c.prio, c.o_n,
      |  CAST(floor(CAST(r.r_n AS DOUBLE) * s.c_n * 1000000.0 / nn.n) AS BIGINT) AS expected_micro,
      |  CAST(floor(
      |    CAST(CAST(c.o_n * nn.n - r.r_n * s.c_n AS DECIMAL(38,0))
      |         * CAST(c.o_n * nn.n - r.r_n * s.c_n AS DECIMAL(38,0)) AS DOUBLE)
      |    * 1000000.0 / (CAST(nn.n AS DOUBLE) * r.r_n * s.c_n)) AS BIGINT) AS chisq_contrib_micro
      |FROM cells c
      |JOIN rs r USING (status)
      |JOIN cs s USING (prio)
      |CROSS JOIN nn
      |ORDER BY c.status, c.prio""".stripMargin

  /** §2.2 #21bn — event-time lateness audit: per event type, the
    * out-of-orderness distribution of the stream — how far event time
    * lags behind the running event-time high-water mark in arrival
    * order (event_id is the arrival proxy). `p99_late_us` IS the
    * number you set a Structured Streaming watermark from: a watermark
    * of that delay admits 99% of events into their window, and
    * `max_late_us` tells you what the last 1% costs. Run this before
    * choosing the `withWatermark` delay of every §2.7 streaming query.
    *
    * Shape: one ROWS-frame running max in arrival order + one ranking
    * window for the exact-selection p99 (the q_median idiom), both
    * partitioned on event_type — partition-parallel, integer-µs exact,
    * no shuffle beyond the two type-keyed exchanges (which AQE fuses
    * into one).
    */
  def qLateness(spark: SparkSession, dir: String): DataFrame = {
    val e = table(spark, dir, "events")
      .select(col("event_type"), col("event_id"), unix_micros(col("ts")).as("us"))
    val wA = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val late = e.withColumn("late_us", max(col("us")).over(wA) - col("us"))
    val wR = Window.partitionBy(col("event_type")).orderBy(col("late_us"), col("event_id"))
    val wc = Window.partitionBy(col("event_type"))
    late
      .select(
        col("event_type"), col("late_us"),
        row_number().over(wR).as("rn"),
        count(lit(1)).over(wc).as("n"),
      )
      .groupBy(col("event_type"))
      .agg(
        max(col("n")).as("n"),
        sum(when(col("late_us") > 0, 1L).otherwise(0L)).as("n_late"),
        max(when(col("rn") === expr("(99 * n + 99) div 100"), col("late_us"))).as("p99_late_us"),
        max(col("late_us")).as("max_late_us"),
      )
      .orderBy("event_type")
  }

  val qLatenessSql: String =
    """WITH l AS (
      |  SELECT event_type, event_id,
      |    max(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - epoch_us(ts) AS late_us
      |  FROM events
      |), ranked AS (
      |  SELECT event_type, late_us,
      |    row_number() OVER (PARTITION BY event_type ORDER BY late_us, event_id) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM l
      |)
      |SELECT event_type, max(n) AS n,
      |  CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
      |  max(CASE WHEN rn = (99 * n + 99) // 100 THEN late_us END) AS p99_late_us,
      |  max(late_us) AS max_late_us
      |FROM ranked
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** §2.2 #21z — equi-width numeric histogram with in-query bounds:
    * a 1-row min/max aggregate broadcast into the scan (the q_zorder
    * shape), then integer bucket arithmetic and one grouped count/sum
    * — two scan-bound passes, map-side partials, no wide shuffle.
    * Prices go to integer cents via floor(x·100+0.5) (pure IEEE, both
    * engines) so bucket edges and sums are exact.
    */
  def qHistogram(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
      .select(floor(col("o_totalprice") * 100 + 0.5).cast(LongType).as("cents"))
    val bounds = o.agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
    o.join(broadcast(bounds), lit(true))
      .groupBy(expr("((cents - lo) * 20) div (hi - lo + 1)").cast(LongType).as("bucket"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("cents")).as("sum_cents"),
        min(col("cents")).as("min_cents"),
        max(col("cents")).as("max_cents"),
      )
      .orderBy("bucket")
  }

  val qHistogramSql: String =
    """WITH c AS (
      |  SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders
      |), b AS (SELECT min(cents) AS lo, max(cents) AS hi FROM c)
      |SELECT ((cents - lo) * 20) // (hi - lo + 1) AS bucket,
      |  count(*) AS n_orders,
      |  CAST(sum(cents) AS BIGINT) AS sum_cents,
      |  min(cents) AS min_cents,
      |  max(cents) AS max_cents
      |FROM c, b
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  /** §2.2 #21aa — the skew utilities as an oracled query: revenue per
    * order priority via [[Skew.saltedJoin]] (lineitem salted, orders
    * replicated `salts`×) into [[Skew.saltedAggregate]] (priority is a
    * 5-value hot key — the exact shape where a plain groupBy lands
    * each priority on one task no matter how many partitions exist).
    * The oracle is the UNSALTED join+group — proving the rewrite is
    * semantics-preserving is the point. Revenue is summed as integer
    * cents (salted partials must re-merge exactly; decimal partials
    * would too, but int64 keeps the merge codegen-primitive).
    */
  def qSkewjoin(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
      .select(
        col("l_orderkey").as("o_orderkey"),
        (floor(col("l_extendedprice") * 100 + 0.5).cast(LongType)).as("price_cents"),
      )
    val o = table(spark, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
    val joined = Skew.saltedJoin(li, o, "o_orderkey", salts = 8)
    Skew.saltedAggregate(
        joined,
        Seq("o_orderpriority"),
        Map(
          "n_items" -> count(lit(1)),
          "revenue_cents" -> sum(col("price_cents")),
        ),
        salts = 8,
      )
      .select(col("o_orderpriority"), col("n_items"), col("revenue_cents"))
      .orderBy("o_orderpriority")
  }

  val qSkewjoinSql: String =
    """SELECT o_orderpriority,
      |  count(*) AS n_items,
      |  CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** §2.2 #21ac — exact distributed correlation + regression slope via
    * integer moment sums: per-order (item count x, price cents y)
    * pairs, then per-priority n/Σx/Σy/Σxy/Σx²/Σy². Per-row products
    * fit int64; the SUMS would overflow it at 100 TB (Σy² ≈ rows·2.5e15),
    * so sums go DECIMAL(38,0) — exact and order-free in both engines,
    * and still map-side-combinable partial aggregates (the classic
    * scalable-stats pattern: ship moments, not rows). corr and beta
    * are then one closed-form double expression over exact operands —
    * bit-identical cross-engine because the operand values and the
    * operation tree are identical.
    */
  def qCorrstats(spark: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val per = table(spark, dir, "orders")
      .join(table(spark, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      .agg(count(lit(1)).as("x"))
      .select(
        col("o_orderpriority"), col("x"),
        floor(col("o_totalprice") * 100 + 0.5).cast(LongType).as("y"),
      )
    val m = per.groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("x").cast(d38)).as("sx"),
        sum(col("y").cast(d38)).as("sy"),
        sum((col("x") * col("y")).cast(d38)).as("sxy"),
        sum((col("x") * col("x")).cast(d38)).as("sxx"),
        sum((col("y") * col("y")).cast(d38)).as("syy"),
      )
    val n = col("n_orders").cast(DoubleType)
    def d(c: String): Column = col(c).cast(DoubleType)
    val cov = n * d("sxy") - d("sx") * d("sy")
    val vx = n * d("sxx") - d("sx") * d("sx")
    val vy = n * d("syy") - d("sy") * d("sy")
    m.select(
        col("o_orderpriority"), col("n_orders"),
        (cov / sqrt(vx * vy)).as("corr_items_price"),
        (cov / vx).as("beta_items_price"),
      )
      .orderBy("o_orderpriority")
  }

  val qCorrstatsSql: String =
    """WITH per AS (
      |  SELECT o_orderpriority, count(*) AS x,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |  GROUP BY o_orderkey, o_orderpriority, o_totalprice
      |), m AS (
      |  SELECT o_orderpriority, count(*) AS n_orders,
      |    CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
      |    CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
      |    CAST(sum(CAST(x * y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxy,
      |    CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sxx,
      |    CAST(sum(CAST(y * y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS syy
      |  FROM per GROUP BY o_orderpriority
      |)
      |SELECT o_orderpriority, n_orders,
      |  (CAST(n_orders AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / sqrt((CAST(n_orders AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |         * (CAST(n_orders AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr_items_price,
      |  (CAST(n_orders AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / (CAST(n_orders AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS beta_items_price
      |FROM m
      |ORDER BY o_orderpriority""".stripMargin

  /** §2.2 #21zc — TPC-H Q12 shape (shipping-delay priority mix): one
    * big-big equi-join (lineitem⋈orders on orderkey) feeding a
    * conditional two-count grouped aggregate. The reference groups by
    * ship mode; this schema has none, so the group is the shipping
    * delay in 30-day buckets — floor(datediff/30.0), a single IEEE
    * division + floor so negative delays bucket identically in both
    * engines (integer `div` truncates toward zero in Spark but floors
    * in DuckDB — the double floor sidesteps that divergence).
    * Partial aggregation shrinks the join output map-side; at 100 TB
    * the join shuffles both facts on orderkey once and nothing else.
    */
  def q12Priority(spark: SparkSession, dir: String): DataFrame = {
    val l = table(spark, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
    val o = table(spark, dir, "orders").select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(
        floor(datediff(col("l_shipdate"), col("o_orderdate")) / lit(30.0)).cast(LongType).as("delay_bucket"),
        high.as("is_high"),
      )
      .groupBy(col("delay_bucket"))
      .agg(
        sum(when(col("is_high"), 1L).otherwise(0L)).as("high_line_count"),
        sum(when(col("is_high"), 0L).otherwise(1L)).as("low_line_count"),
      )
      .orderBy("delay_bucket")
  }

  val q12PrioritySql: String =
    """SELECT
      |  CAST(floor(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) / 30.0) AS BIGINT) AS delay_bucket,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY delay_bucket""".stripMargin

  /** §2.2 #21zd — TPC-H Q17 shape (small-quantity revenue): the
    * correlated per-part average subquery, decorrelated into one
    * groupBy(l_partkey) pass whose output joins back to lineitem on
    * the SAME key — co-partitioned, so AQE plans one shuffle of the
    * fact, reused by both the aggregate and the join. The predicate
    * qty < 0.2·avg(qty) is rewritten integer-exact as
    * 5·qty·cnt < sum_qty (l_quantity is integral), eliminating the
    * float threshold entirely; part is broadcast. Revenue is summed
    * as DECIMAL and divided by 7.0 once at the end.
    */
  def q17SmallQty(spark: SparkSession, dir: String): DataFrame = {
    val l = table(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val pa = l.groupBy(col("l_partkey")).agg(
      sum(col("l_quantity")).cast(LongType).as("sum_qty"),
      count(lit(1)).as("cnt"),
    )
    val p = table(spark, dir, "part").select(col("p_partkey"), col("p_brand"))
    l.join(pa, "l_partkey")
      .filter(col("l_quantity").cast(LongType) * 5L * col("cnt") < col("sum_qty"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_lines"),
        (dbl(sum(decP(col("l_extendedprice")))) / lit(7.0)).as("avg_yearly"),
      )
      .orderBy("p_brand")
  }

  val q17SmallQtySql: String =
    """WITH pa AS (
      |  SELECT l_partkey, CAST(sum(l_quantity) AS BIGINT) AS sum_qty, count(*) AS cnt
      |  FROM lineitem GROUP BY l_partkey
      |)
      |SELECT p_brand, count(*) AS n_lines,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
      |FROM lineitem
      |JOIN pa USING (l_partkey)
      |JOIN part ON l_partkey = p_partkey
      |WHERE CAST(l_quantity AS BIGINT) * 5 * cnt < sum_qty
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** §2.2 #21ze — TPC-H Q19 shape (disjunctive predicate join):
    * three OR'd (brand, size-range, quantity-range) conjunct groups
    * over lineitem⋈part. The classic optimization is applied by
    * hand: the disjunction's union bounds — p_brand IN (9 brands),
    * p_size ≤ 40, l_quantity BETWEEN 1 AND 40 — are added as
    * redundant conjuncts so they push into both parquet scans
    * (PushedFilters) and shrink the broadcast side to the matched
    * brands, while the full OR evaluates post-join. At 100 TB the
    * fact scan prunes on quantity before any join work.
    */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    val fam1 = Seq("Brand#11", "Brand#12", "Brand#13")
    val fam2 = Seq("Brand#21", "Brand#22", "Brand#23")
    val fam3 = Seq("Brand#31", "Brand#32", "Brand#34")
    val l = table(spark, dir, "lineitem")
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 40)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
    val p = table(spark, dir, "part")
      .filter(col("p_brand").isin((fam1 ++ fam2 ++ fam3): _*) && col("p_size") >= 1 && col("p_size") <= 40)
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val clause =
      (col("p_brand").isin(fam1: _*) && col("p_size") <= 20 && col("l_quantity").between(1, 15)) ||
      (col("p_brand").isin(fam2: _*) && col("p_size") <= 30 && col("l_quantity").between(10, 25)) ||
      (col("p_brand").isin(fam3: _*) && col("p_size") <= 40 && col("l_quantity").between(20, 40))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(clause)
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_lines"),
        dbl(sum(decP(col("l_extendedprice")) * (one - decR(col("l_discount"))))).as("revenue"),
      )
      .orderBy("p_brand")
  }

  val q19DisjunctiveSql: String =
    """SELECT p_brand, count(*) AS n_lines,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand IN ('Brand#11','Brand#12','Brand#13') AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 1 AND 15)
      |   OR (p_brand IN ('Brand#21','Brand#22','Brand#23') AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 10 AND 25)
      |   OR (p_brand IN ('Brand#31','Brand#32','Brand#34') AND p_size BETWEEN 1 AND 40 AND l_quantity BETWEEN 20 AND 40)
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** §2.2 #21zf — TPC-H Q21 shape (suppliers who kept orders
    * waiting): the double-correlated EXISTS / NOT-EXISTS over the
    * same fact table, decorrelated into ONE per-order aggregate —
    * n_supp = distinct suppliers, n_late_supp = distinct late
    * suppliers — joined back to the late lines. A late supplier in a
    * multi-supplier finished order where n_late_supp = 1 is
    * necessarily the only late one, which is exactly the
    * EXISTS(other supplier) ∧ NOT EXISTS(other late supplier)
    * condition. "Late" is shipped >90 days after order date (this
    * schema has no commit/receipt dates). The whole query is ONE
    * linear pipeline — no join-back, no Expand-based countDistinct:
    * the per-(order,supplier) aggregate rolls up to a per-order row
    * carrying (n_supp, n_late_supp, max(case when late then suppkey))
    * — when n_late_supp = 1 that max IS the lone late supplier — and
    * the winners aggregate by that supplier directly. One fact scan,
    * three shrinking shuffles (orderkey+suppkey, orderkey, suppkey);
    * supplier broadcast at the end.
    */
  def q21Waiting(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders").filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val perSupp = table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        when(datediff(col("l_shipdate"), col("o_orderdate")) > 90, 1L).otherwise(0L).as("is_late"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("is_late")).as("supp_late"))
    val perOrder = perSupp.groupBy(col("l_orderkey")).agg(
      count(lit(1)).as("n_supp"),
      sum(col("supp_late")).as("n_late_supp"),
      max(when(col("supp_late") === 1L, col("l_suppkey"))).as("late_sk"),
    )
    val s = table(spark, dir, "supplier").select(col("s_suppkey"), col("s_name"))
    perOrder.filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
      .groupBy(col("late_sk"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(s), col("late_sk") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  val q21WaitingSql: String =
    """WITH flagged AS (
      |  SELECT l_orderkey, l_suppkey,
      |    date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 90 AS is_late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F'
      |),
      |per_order AS (
      |  SELECT l_orderkey,
      |    count(DISTINCT l_suppkey) AS n_supp,
      |    count(DISTINCT CASE WHEN is_late THEN l_suppkey END) AS n_late_supp
      |  FROM flagged GROUP BY l_orderkey
      |),
      |late_lines AS (
      |  SELECT DISTINCT l_orderkey, l_suppkey FROM flagged WHERE is_late
      |)
      |SELECT s_name, count(*) AS numwait
      |FROM late_lines
      |JOIN per_order USING (l_orderkey)
      |JOIN supplier ON l_suppkey = s_suppkey
      |WHERE n_supp >= 2 AND n_late_supp = 1
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  /** §2.2 #21zg — TPC-H Q22 shape (idle wealthy customers): a
    * 1-row scalar aggregate (average positive balance, DECIMAL sum +
    * one double division) broadcast-crossed into the customer scan
    * (the q_zorder bounded-broadcast shape), an anti join against a
    * FILTERED orders subquery, and a per-nation rollup. The
    * reference's "no orders in 7 years" / phone-prefix group become
    * "never placed an order above 350 000" / the nation dimension
    * (every synthetic customer has orders, so the plain anti join is
    * degenerate); the price filter pushes into the orders scan
    * before the anti join shuffles.
    */
  def q22Idle(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
    val avgRow = c.filter(col("c_acctbal") > 0)
      .agg((dbl(sum(decP(col("c_acctbal")))) / count(lit(1))).as("avg_bal"))
    val o = table(spark, dir, "orders")
      .filter(col("o_totalprice") > 350000).select(col("o_custkey"))
    val n = table(spark, dir, "nation").select(col("n_nationkey"), col("n_name"))
    c.join(broadcast(avgRow), lit(true))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("numcust"),
        dbl(sum(decP(col("c_acctbal")))).as("totacctbal"),
      )
      .orderBy("n_name")
  }

  val q22IdleSql: String =
    """WITH pos AS (
      |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_bal
      |  FROM customer WHERE c_acctbal > 0
      |)
      |SELECT n_name, count(*) AS numcust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      |FROM customer CROSS JOIN pos
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_acctbal > avg_bal
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 350000)
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** §2.2 #21ai — time-series gap filling + forward fill: per user,
    * a dense daily grid (sequence + explode over the user's own
    * [min, max] day span) left-joins the per-day aggregate, and a
    * running `last(ignoreNulls)` window carries the latest non-null
    * daily total across gap days. Everything keys on user_id: the
    * daily aggregate, the span aggregate, the grid join, and the
    * fill window share one partitioning, so at 100 TB there is one
    * fact-sized shuffle and per-user-bounded window state. The fill
    * copies values (no arithmetic), so the DECIMAL-exact daily
    * totals stay bit-identical cross-engine.
    */
  def qGapfill(spark: SparkSession, dir: String): DataFrame = {
    val daily = table(spark, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      .groupBy(col("user_id"), col("day"))
      .agg(count(lit(1)).as("n_events"), dbl(sum(decP(col("value")))).as("daily_total"))
    val grid = daily.groupBy(col("user_id"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"), explode(sequence(col("d0"), col("d1"), expr("interval 1 day"))).as("day"))
    val fill = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq("user_id", "day"), "left")
      .select(
        col("user_id"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("daily_total"), ignoreNulls = true).over(fill).as("filled_total"),
      )
      .orderBy("user_id", "day")
  }

  val qGapfillSql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    count(*) AS n_events,
      |    CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS daily_total
      |  FROM events GROUP BY 1, 2
      |),
      |grid AS (
      |  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id)
      |)
      |SELECT g.user_id, g.day, coalesce(n_events, 0) AS n_events,
      |  last_value(daily_total IGNORE NULLS) OVER (
      |    PARTITION BY g.user_id ORDER BY g.day
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_total
      |FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
      |ORDER BY g.user_id, g.day""".stripMargin

  /** §2.2 #21aj — cohort retention analysis: users cohorted by their
    * FIRST purchase day, activity bucketed by whole weeks since that
    * first day, distinct (user, cohort, offset) counted per cell —
    * the standard product-analytics retention triangle. The first-
    * event aggregate joins back on user_id (co-partitioned with its
    * own groupBy), and the distinct + count pair shuffles only
    * (user, cohort, offset) triples. Offsets are non-negative so
    * integer `div 7` agrees between Spark (truncate) and DuckDB
    * (floor).
    */
  def qRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val firsts = ev.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
    ev.join(firsts, "user_id")
      .select(
        col("user_id"),
        datediff(col("first_day"), lit("2024-01-01").cast(DateType)).cast(LongType).as("cohort_day"),
        (datediff(col("day"), col("first_day")).cast(LongType) / lit(7L)).cast(LongType).as("offset_week"),
      )
      .distinct()
      .groupBy(col("cohort_day"), col("offset_week"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "offset_week")
  }

  /** §2.2 — cohort LTV (lifetime-value) curves: the revenue twin of
    * [[qRetention]]'s activity triangle. Users cohort by first
    * purchase day; each cohort's purchase revenue accumulates over
    * age (weeks since first purchase), and the per-user column
    * divides by the cohort's size — the "how much is a week-N user
    * worth" curve growth teams read next to retention.
    *
    * Exactness: event values quantize to integer cents per ROW
    * (floor(value·100) — one IEEE multiply+floor on the same double
    * both engines read, then order-free int64 sums); the running sum
    * is a cohort-partitioned window over the ≤|cohorts|×|weeks|
    * rollup; per-user cents use integer division on positive ints.
    *
    * Scale shape: one corpus-wide purchase filter feeds the first-day
    * groupBy (map-side combined) and a user-keyed join back — the
    * same two shuffles as q_retention; everything after runs on the
    * calendar-bounded (cohort, age) rollup.
    */
  def qLtv(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
    val firsts = ev.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
    val sized = firsts.groupBy(
      datediff(col("first_day"), lit("2024-01-01").cast(DateType)).cast(LongType).as("cohort_day"))
      .agg(count(lit(1)).as("cohort_users"))
    val aged = ev.join(firsts, "user_id")
      .select(
        col("user_id"), col("cents"),
        datediff(col("first_day"), lit("2024-01-01").cast(DateType)).cast(LongType).as("cohort_day"),
        (datediff(col("day"), col("first_day")).cast(LongType) / lit(7L)).cast(LongType).as("age_week"),
      )
      .groupBy(col("cohort_day"), col("age_week"))
      .agg(countDistinct(col("user_id")).as("n_active"), sum(col("cents")).as("rev_cents"))
    val w = Window.partitionBy(col("cohort_day")).orderBy(col("age_week"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    aged
      .withColumn("cum_rev_cents", sum(col("rev_cents")).over(w))
      .join(broadcast(sized), Seq("cohort_day"))
      .select(col("cohort_day"), col("age_week"), col("n_active"), col("cohort_users"),
        col("rev_cents"), col("cum_rev_cents"),
        expr("cum_rev_cents div cohort_users").as("ltv_per_user_cents"))
      .orderBy("cohort_day", "age_week")
  }

  val qLtvSql: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(floor(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'
      |), firsts AS (
      |  SELECT user_id, min(day) AS first_day FROM ev GROUP BY user_id
      |), sized AS (
      |  SELECT CAST(date_diff('day', DATE '2024-01-01', first_day) AS BIGINT) AS cohort_day,
      |    count(*) AS cohort_users
      |  FROM firsts GROUP BY 1
      |), aged AS (
      |  SELECT CAST(date_diff('day', DATE '2024-01-01', first_day) AS BIGINT) AS cohort_day,
      |    CAST(date_diff('day', first_day, day) // 7 AS BIGINT) AS age_week,
      |    CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active,
      |    CAST(sum(cents) AS BIGINT) AS rev_cents
      |  FROM ev e JOIN firsts USING (user_id)
      |  GROUP BY 1, 2
      |), cum AS (
      |  SELECT *, CAST(sum(rev_cents) OVER (
      |    PARTITION BY cohort_day ORDER BY age_week
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_rev_cents
      |  FROM aged
      |)
      |SELECT c.cohort_day, c.age_week, c.n_active, s.cohort_users,
      |  c.rev_cents, c.cum_rev_cents,
      |  c.cum_rev_cents // s.cohort_users AS ltv_per_user_cents
      |FROM cum c JOIN sized s USING (cohort_day)
      |ORDER BY c.cohort_day, c.age_week""".stripMargin

  val qRetentionSql: String =
    """WITH ev AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      |  FROM events WHERE event_type = 'purchase'
      |),
      |firsts AS (SELECT user_id, min(day) AS first_day FROM ev GROUP BY user_id),
      |active AS (
      |  SELECT DISTINCT e.user_id,
      |    CAST(date_diff('day', DATE '2024-01-01', first_day) AS BIGINT) AS cohort_day,
      |    CAST(date_diff('day', first_day, day) // 7 AS BIGINT) AS offset_week
      |  FROM ev e JOIN firsts USING (user_id)
      |)
      |SELECT cohort_day, offset_week, count(*) AS n_users
      |FROM active GROUP BY 1, 2
      |ORDER BY cohort_day, offset_week""".stripMargin

  /** §2.2 #21ak — SCD type-2 history build (the versioned sibling of
    * the SCD-1 MERGE in [[qUpsert]]): the base dimension row opens at
    * a sentinel epoch, every order is an attribute change effective at
    * its o_orderdate, and ONE window pass per customer assigns
    * validity intervals — valid_to = lead(valid_from), version_seq =
    * row_number, is_current = no successor. Ties on the same
    * effective date are totally ordered by the monotone orderkey, so
    * the interval chain is deterministic. One shuffle on the
    * dimension key; window state is bounded by versions-per-key.
    */
  def qScd2(spark: SparkSession, dir: String): DataFrame = {
    val base = table(spark, dir, "customer").select(
      col("c_custkey"), col("c_acctbal").as("acctbal"),
      ts("1990-01-01").as("valid_from"), lit(-1L).as("ver"))
    val changes = table(spark, dir, "orders").select(
      col("o_custkey").as("c_custkey"), col("o_totalprice").as("acctbal"),
      col("o_orderdate").as("valid_from"), col("o_orderkey").as("ver"))
    val w = Window.partitionBy(col("c_custkey")).orderBy(col("valid_from"), col("ver"))
    base.unionByName(changes)
      .select(
        col("c_custkey"),
        row_number().over(w).cast(LongType).as("version_seq"),
        col("acctbal"), col("valid_from"),
        lead(col("valid_from"), 1).over(w).as("valid_to"),
        lead(col("valid_from"), 1).over(w).isNull.as("is_current"),
      )
      .orderBy("c_custkey", "version_seq")
  }

  val qScd2Sql: String =
    """WITH u AS (
      |  SELECT c_custkey, c_acctbal AS acctbal, TIMESTAMP '1990-01-01' AS valid_from, CAST(-1 AS BIGINT) AS ver
      |  FROM customer
      |  UNION ALL
      |  SELECT o_custkey, o_totalprice, o_orderdate, o_orderkey FROM orders
      |)
      |SELECT c_custkey,
      |  CAST(row_number() OVER w AS BIGINT) AS version_seq,
      |  acctbal, valid_from,
      |  lead(valid_from, 1) OVER w AS valid_to,
      |  lead(valid_from, 1) OVER w IS NULL AS is_current
      |FROM u
      |WINDOW w AS (PARTITION BY c_custkey ORDER BY valid_from, ver)
      |ORDER BY c_custkey, version_seq""".stripMargin

  /** §2.2 #21as — point-in-time SCD2 lookup: resolve each event
    * against the account-balance version (the [[qScd2]] history)
    * valid AT the event's timestamp — the temporal-join primitive
    * behind "what did the dimension say when this fact happened".
    *
    * Not a range join: versions and probes UNION into one stream per
    * key, totally ordered by (µs, tag, ver) with versions sorting
    * before probes at equal timestamps (a probe exactly at
    * `valid_from` takes the NEW version — the [valid_from, valid_to)
    * boundary rule), and one `last(ignoreNulls)` ROWS-frame window
    * carries the in-effect version onto each probe. One shuffle on
    * the key, O(n log n) in the partition, no interval blowup —
    * the same plan shape that keeps [[qAsof]] linear, and the reason
    * this survives dimension histories with millions of versions per
    * key where a valid_from <= t < valid_to range join would
    * quadratically explode the hot keys.
    */
  def qScd2Lookup(spark: SparkSession, dir: String): DataFrame = {
    val versions = table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal").as("acctbal"),
        ts("1990-01-01").as("vf"), lit(-1L).as("ver"))
      .unionByName(table(spark, dir, "orders").select(
        col("o_custkey").as("c_custkey"), col("o_totalprice").as("acctbal"),
        col("o_orderdate").as("vf"), col("o_orderkey").as("ver")))
      .select(col("c_custkey"), unix_micros(col("vf")).as("us"), lit(0L).as("tag"),
        col("ver"), col("acctbal"), lit(null).cast(LongType).as("event_id"))
    val probes = table(spark, dir, "events")
      .select(col("user_id").as("c_custkey"), unix_micros(col("ts")).as("us"),
        lit(1L).as("tag"), lit(Long.MaxValue).as("ver"),
        lit(null).cast(DoubleType).as("acctbal"), col("event_id"))
    val w = Window.partitionBy(col("c_custkey")).orderBy(col("us"), col("tag"), col("ver"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    versions.unionByName(probes)
      .withColumn("eff",
        last(when(col("tag") === 0, struct(col("ver"), col("acctbal"))), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(
        col("event_id"), col("c_custkey"), col("us").as("event_us"),
        col("eff.ver").as("version_ver"), col("eff.acctbal").as("acctbal_at"),
      )
      .orderBy("event_id")
  }

  val qScd2LookupSql: String =
    """WITH versions AS (
      |  SELECT c_custkey, epoch_us(TIMESTAMP '1990-01-01') AS us, CAST(0 AS BIGINT) AS tag,
      |    CAST(-1 AS BIGINT) AS ver, c_acctbal AS acctbal, CAST(NULL AS BIGINT) AS event_id
      |  FROM customer
      |  UNION ALL
      |  SELECT o_custkey, epoch_us(o_orderdate), 0, o_orderkey, o_totalprice, NULL FROM orders
      |), probes AS (
      |  SELECT user_id AS c_custkey, epoch_us(ts) AS us, CAST(1 AS BIGINT) AS tag,
      |    CAST(9223372036854775807 AS BIGINT) AS ver, CAST(NULL AS DOUBLE) AS acctbal, event_id
      |  FROM events
      |), u AS (
      |  SELECT * FROM versions UNION ALL SELECT * FROM probes
      |), t AS (
      |  SELECT *,
      |    last_value(CASE WHEN tag = 0 THEN struct_pack(ver := ver, acctbal := acctbal) END IGNORE NULLS)
      |      OVER (PARTITION BY c_custkey ORDER BY us, tag, ver
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS eff
      |  FROM u
      |)
      |SELECT event_id, c_custkey, us AS event_us, eff.ver AS version_ver, eff.acctbal AS acctbal_at
      |FROM t WHERE tag = 1
      |ORDER BY event_id""".stripMargin

  /** §2.2 #21at — integer-exact anomaly flags on the daily event
    * series: per (event_type, day) counts, flagged when the squared
    * deviation from the type's mean exceeds (2σ)² — the z-score test
    * with the float algebra cleared out: |x − S/n| > 2·σ rewrites to
    * (n·x − S)² > 4·(n·S2 − S²) over integer count moments, so the
    * flag is a pure int64 comparison, bit-identical in any engine
    * (the q_corrstats / q17 trick applied to outlier detection). Per-
    * type moments come from a window aggregate over the (tiny) daily
    * rollup — the fact-sized shuffle is the rollup itself, map-side
    * combined.
    */
  def qAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val daily = table(spark, dir, "events")
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy(col("event_type"))
    val n = count(lit(1)).over(w)
    val s = sum(col("n_events")).over(w)
    val s2 = sum(col("n_events") * col("n_events")).over(w)
    daily
      .withColumn("dev", n * col("n_events") - s)
      .withColumn("is_anomaly", col("dev") * col("dev") > lit(4L) * (n * s2 - s * s))
      .drop("dev")
      .orderBy("event_type", "day")
  }

  /** §2.2 — Theil-Sen robust trend per event type: the median of all
    * pairwise daily-volume slopes — the robust-statistics companion
    * to [[qAnomaly]]'s mean/σ screen and the right trend estimator
    * when up to ~29% of days are outliers (launch spikes, outages)
    * that would drag an OLS line.
    *
    * Exactness: each pairwise slope quantizes to ppm/day with
    * sign-symmetric truncation (negate-divide-negate keeps both
    * engines on truncate-toward-zero semantics; the divisor is always
    * positive), and the median is the lower-median row_number over
    * (slope, day-pair) — a total integer order, so cross-engine
    * hash-stable with no float comparison anywhere.
    *
    * Scale shape: the corpus collapses FIRST to a per-(type, day)
    * rollup — metadata-bounded by calendar × |types|, not data size —
    * and the O(|days|²) pair self-join runs on that rollup only (a
    * year of days = ~66k pairs/type). The only corpus-wide op is the
    * map-side-combined daily count.
    */
  def qTheilSen(spark: SparkSession, dir: String): DataFrame = {
    val daily = table(spark, dir, "events")
      .groupBy(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n_events"))
    val a = daily.select(col("event_type"), col("day").as("d1"), col("n_events").as("c1"))
    val b = daily.select(col("event_type"), col("day").as("d2"), col("n_events").as("c2"))
    val pairs = a.join(b, Seq("event_type")).filter(col("d1") < col("d2"))
      .withColumn("slope_ppm",
        expr("""CASE WHEN c2 >= c1 THEN ((c2 - c1) * 1000000) div (d2 - d1)
               |     ELSE -(((c1 - c2) * 1000000) div (d2 - d1)) END""".stripMargin))
    val w = Window.partitionBy(col("event_type"))
    val rk = Window.partitionBy(col("event_type"))
      .orderBy(col("slope_ppm"), col("d1"), col("d2"))
    pairs
      .withColumn("n_pairs", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(rk).cast(LongType))
      .filter(col("rn") === expr("(n_pairs + 1) div 2"))
      .join(
        daily.groupBy(col("event_type")).agg(count(lit(1)).as("n_days")),
        Seq("event_type"))
      .select(col("event_type"), col("n_days"), col("n_pairs"),
        col("slope_ppm").as("ts_slope_ppm"))
      .orderBy("event_type")
  }

  val qTheilSenSql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS n_events
      |  FROM events GROUP BY 1, 2
      |), pairs AS (
      |  SELECT a.event_type, a.day AS d1, b.day AS d2,
      |    CASE WHEN b.n_events >= a.n_events
      |      THEN ((b.n_events - a.n_events) * 1000000) // (b.day - a.day)
      |      ELSE -(((a.n_events - b.n_events) * 1000000) // (b.day - a.day)) END AS slope_ppm
      |  FROM daily a JOIN daily b
      |    ON a.event_type = b.event_type AND a.day < b.day
      |), ranked AS (
      |  SELECT event_type, slope_ppm,
      |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_pairs,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY slope_ppm, d1, d2) AS BIGINT) AS rn
      |  FROM pairs
      |), nd AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days FROM daily GROUP BY 1
      |)
      |SELECT r.event_type, nd.n_days, r.n_pairs, r.slope_ppm AS ts_slope_ppm
      |FROM ranked r JOIN nd USING (event_type)
      |WHERE rn = (n_pairs + 1) // 2
      |ORDER BY event_type""".stripMargin

  val qAnomalySql: String =
    """WITH daily AS (
      |  -- CAST: DuckDB's date_trunc('day') yields DATE; Spark's yields
      |  -- TIMESTAMP — align the types or the compare fails on kind
      |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS n_events
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT event_type, day, n_events,
      |  (count(*) OVER w * n_events - sum(n_events) OVER w)
      |    * (count(*) OVER w * n_events - sum(n_events) OVER w)
      |  > 4 * (count(*) OVER w * sum(n_events * n_events) OVER w
      |         - sum(n_events) OVER w * sum(n_events) OVER w) AS is_anomaly
      |FROM daily
      |WINDOW w AS (PARTITION BY event_type)
      |ORDER BY event_type, day""".stripMargin

  /** §2.2 #21au — A/B experiment significance report: users split
    * into variants by a deterministic hash, per-metric conversion
    * counts, and a two-proportion z-test at 2σ with the float algebra
    * cleared to integers — z² > 4 rewrites to
    * (c_a·n_b − c_b·n_a)² · N  >  4 · (c_a+c_b) · (N − c_a − c_b) · n_a · n_b
    * (N = n_a + n_b), so significance is a pure int64 comparison,
    * bit-identical cross-engine (the q_anomaly rewrite applied to the
    * two-sample test). Conversion = the user fired the metric's event
    * type ≥ 14 times (an engagement bar near the per-user mean, so
    * both converting and non-converting users exist per metric — an
    * at-least-once bar saturates on this corpus and zeroes the test);
    * the per-(user, metric) count is the only fact-sized shuffle.
    * int64 holds to ~10^6 users per variant; beyond that the moments
    * go DECIMAL(38,0) — same knob as q_corrstats.
    */
  def qAbtest(spark: SparkSession, dir: String): DataFrame = {
    val e = table(spark, dir, "events")
      .select(col("user_id"), col("event_type"), (col("user_id") % 2).as("variant"))
    val arms = e.select(col("user_id"), col("variant")).distinct()
      .groupBy(col("variant")).agg(count(lit(1)).as("n"))
    val conv = e.groupBy(col("event_type"), col("variant"), col("user_id"))
      .agg(count(lit(1)).as("n_fired"))
      .filter(col("n_fired") >= 14)
      .groupBy(col("event_type"), col("variant")).agg(count(lit(1)).as("c"))
    val a = conv.filter(col("variant") === 0).select(col("event_type"), col("c").as("c_a"))
    val b = conv.filter(col("variant") === 1).select(col("event_type"), col("c").as("c_b"))
    val nA = arms.filter(col("variant") === 0).select(col("n").as("n_a"))
    val nB = arms.filter(col("variant") === 1).select(col("n").as("n_b"))
    val joined = a.join(b, Seq("event_type"), "full_outer")
      .na.fill(0L, Seq("c_a", "c_b"))
      .crossJoin(broadcast(nA)).crossJoin(broadcast(nB))
    val bigN = col("n_a") + col("n_b")
    val diff = col("c_a") * col("n_b") - col("c_b") * col("n_a")
    val conv2 = col("c_a") + col("c_b")
    joined
      .select(
        col("event_type"), col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        (diff * diff * bigN > lit(4L) * conv2 * (bigN - conv2) * col("n_a") * col("n_b"))
          .as("significant"),
      )
      .orderBy("event_type")
  }

  val qAbtestSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, user_id % 2 AS variant FROM events
      |), arms AS (
      |  SELECT variant, count(*) AS n FROM (SELECT DISTINCT user_id, variant FROM e) GROUP BY variant
      |), conv AS (
      |  SELECT event_type, variant, count(*) AS c
      |  FROM (
      |    SELECT event_type, variant, user_id FROM e
      |    GROUP BY 1, 2, 3 HAVING count(*) >= 14
      |  ) GROUP BY 1, 2
      |), j AS (
      |  SELECT event_type, COALESCE(a.c, 0) AS c_a, COALESCE(b.c, 0) AS c_b
      |  FROM (SELECT event_type, c FROM conv WHERE variant = 0) a
      |  FULL OUTER JOIN (SELECT event_type, c FROM conv WHERE variant = 1) b USING (event_type)
      |)
      |SELECT event_type,
      |  (SELECT n FROM arms WHERE variant = 0) AS n_a, c_a,
      |  (SELECT n FROM arms WHERE variant = 1) AS n_b, c_b,
      |  (c_a * (SELECT n FROM arms WHERE variant = 1) - c_b * (SELECT n FROM arms WHERE variant = 0))
      |    * (c_a * (SELECT n FROM arms WHERE variant = 1) - c_b * (SELECT n FROM arms WHERE variant = 0))
      |    * ((SELECT n FROM arms WHERE variant = 0) + (SELECT n FROM arms WHERE variant = 1))
      |  > 4 * (c_a + c_b)
      |      * ((SELECT n FROM arms WHERE variant = 0) + (SELECT n FROM arms WHERE variant = 1) - c_a - c_b)
      |      * (SELECT n FROM arms WHERE variant = 0) * (SELECT n FROM arms WHERE variant = 1)
      |    AS significant
      |FROM j
      |ORDER BY event_type""".stripMargin

  /** §2.2 #21al — market-basket co-purchase pairs ("customers who
    * bought X also bought Y"): the fact self-joins on its own
    * orderkey — both sides are the SAME distinct projection, so the
    * shuffle is paid once and reused — and p1 < p2 orients each pair
    * once. Pair blowup is bounded by lines-per-order choose 2 (~21
    * for TPC-H-shaped orders), so the join output stays linear in the
    * fact; the pair aggregate shuffles only surviving pairs and
    * top-100 is a TakeOrdered, not a full sort.
    */
  def qCopurchase(spark: SparkSession, dir: String): DataFrame = {
    val l = table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val a = l.select(col("l_orderkey"), col("l_partkey").as("p1"))
    val b = l.select(col("l_orderkey").as("b_orderkey"), col("l_partkey").as("p2"))
    a.join(b, col("l_orderkey") === col("b_orderkey") && col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("p1"), col("p2"))
      .limit(100)
  }

  val qCopurchaseSql: String =
    """WITH l AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
      |SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_orders
      |FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |GROUP BY 1, 2
      |ORDER BY n_orders DESC, p1, p2
      |LIMIT 100""".stripMargin

  /** §2.2 #21am — per-segment customer-spend deciles: lifetime spend
    * per customer, ntile(10) WITHIN each market segment, then
    * per-(segment, decile) population stats — the spend-distribution /
    * customer-tiering report. The window partitions by segment (NOT a
    * global order — a global ntile would funnel every row through one
    * partition; per-segment keeps the sort partition-parallel, and at
    * 100 TB segments are further splittable by pre-aggregating the
    * spend rollup, which is the only fact-sized shuffle here). Spend
    * ties break on custkey so the decile boundary is deterministic;
    * sums stay DECIMAL until the final double cast.
    */
  def qNtile(spark: SparkSession, dir: String): DataFrame = {
    val spend = table(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(decP(col("o_totalprice"))).as("spend"))
      .join(table(spark, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment")), col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("spend").desc, col("c_custkey"))
    spend
      .withColumn("decile", ntile(10).over(w))
      .groupBy(col("c_mktsegment"), col("decile"))
      .agg(
        count(lit(1)).as("n_customers"),
        dbl(sum(col("spend"))).as("sum_spend"),
        dbl(min(col("spend"))).as("min_spend"),
        dbl(max(col("spend"))).as("max_spend"),
      )
      .orderBy("c_mktsegment", "decile")
  }

  val qNtileSql: String =
    """WITH spend AS (
      |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(12,2))) AS spend
      |  FROM orders GROUP BY o_custkey
      |), tiered AS (
      |  SELECT c_mktsegment, spend,
      |    ntile(10) OVER (PARTITION BY c_mktsegment ORDER BY spend DESC, c_custkey) AS decile
      |  FROM spend JOIN customer ON o_custkey = c_custkey
      |)
      |SELECT c_mktsegment, decile,
      |  count(*) AS n_customers,
      |  CAST(sum(spend) AS DOUBLE) AS sum_spend,
      |  CAST(min(spend) AS DOUBLE) AS min_spend,
      |  CAST(max(spend) AS DOUBLE) AS max_spend
      |FROM tiered
      |GROUP BY c_mktsegment, decile
      |ORDER BY c_mktsegment, decile""".stripMargin

  /** Bloom-pruned semi join: build a bloom sketch over `small`'s keys
    * (distributed treeAggregate via `stat.bloomFilter`; the sketch —
    * ~1.2 MB at fpp 1% per million keys — returns to the driver and
    * rides the probe plan as a codegen reference object), pre-filter
    * `big` map-side with the probe, then exact-verify survivors with
    * the real semi join. Semantically identical to `big SEMI JOIN
    * small` for ANY fpp (false positives die in the verify join,
    * false negatives cannot occur), but the big side entering the
    * shuffle shrinks from |big| to |matches| + fpp·|big| — the
    * explicit form of Spark's InjectRuntimeFilter lever, available to
    * callers on plans where the optimizer's size heuristics decline.
    */
  def bloomSemiJoin(big: DataFrame, bigKey: String, small: DataFrame, smallKey: String,
      fpp: Double = 0.01): DataFrame = {
    val keys = small.select(col(smallKey)).distinct()
    val expected = math.max(1000L, keys.count())
    val bloom = keys.stat.bloomFilter(smallKey, expected, fpp)
    big
      .filter(graft.functions.ArrayExprs.bloomMightContain(col(bigKey), bloom))
      .join(keys, col(bigKey) === col(smallKey), "left_semi")
  }

  /** §2.2 #21an — the named bloom-prune query: revenue of lineitems
    * whose order is URGENT-priority from one order-date quarter
    * (~1.6% of orders). The oracle is the PLAIN semi join — passing
    * proves the bloom path is lossless end to end.
    */
  def qBloomPrune(spark: SparkSession, dir: String): DataFrame = {
    val sel = table(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= ts("1995-01-01") && col("o_orderdate") < ts("1995-04-01"))
    val pruned = bloomSemiJoin(table(spark, dir, "lineitem"), "l_orderkey", sel, "o_orderkey")
    pruned
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n_items"),
        dbl(sum(decP(col("l_extendedprice")) * (one - decR(col("l_discount"))))).as("revenue"),
      )
      .orderBy("l_returnflag")
  }

  val qBloomPruneSql: String =
    """SELECT l_returnflag,
      |  count(*) AS n_items,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_orderkey IN (
      |  SELECT o_orderkey FROM orders
      |  WHERE o_orderpriority = '1-URGENT'
      |    AND o_orderdate >= TIMESTAMP '1995-01-01'
      |    AND o_orderdate < TIMESTAMP '1995-04-01'
      |)
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** §2.2 #21ao — join-key skew diagnosis: the report a planner (or
    * an engineer choosing between a plain and a salted join — see
    * [[Skew]]) reads before shuffling 100 TB on a key. One count
    * aggregate with map-side combine, a 1-row global rollup broadcast
    * back, top-10 via TakeOrdered. `skew_micro` = max/avg key
    * multiplicity ×10⁶ (one double product + division — IEEE-exact
    * cross-engine); `share_ppm` = the key's fraction of all rows.
    */
  def qSkewReport(spark: SparkSession, dir: String): DataFrame = {
    val counts = table(spark, dir, "lineitem")
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("c"))
    val tot = counts.agg(
      sum(col("c")).as("n_total"),
      count(lit(1)).as("n_keys"),
      max(col("c")).as("max_c"),
    )
    counts
      .join(broadcast(tot), lit(true))
      .select(
        col("l_suppkey"),
        col("c"),
        floor(col("c").cast(DoubleType) * 1000000.0 / col("n_total").cast(DoubleType)).cast(LongType).as("share_ppm"),
        col("n_keys"),
        floor(col("max_c").cast(DoubleType) * col("n_keys").cast(DoubleType) / col("n_total").cast(DoubleType) * 1000000.0).cast(LongType).as("skew_micro"),
      )
      .orderBy(col("c").desc, col("l_suppkey"))
      .limit(10)
  }

  val qSkewReportSql: String =
    """WITH counts AS (
      |  SELECT l_suppkey, count(*) AS c FROM lineitem GROUP BY l_suppkey
      |), tot AS (
      |  SELECT CAST(sum(c) AS BIGINT) AS n_total, count(*) AS n_keys, max(c) AS max_c FROM counts
      |)
      |SELECT l_suppkey, c,
      |  CAST(floor(CAST(c AS DOUBLE) * 1000000.0 / CAST(n_total AS DOUBLE)) AS BIGINT) AS share_ppm,
      |  n_keys,
      |  CAST(floor(CAST(max_c AS DOUBLE) * CAST(n_keys AS DOUBLE) / CAST(n_total AS DOUBLE) * 1000000.0) AS BIGINT) AS skew_micro
      |FROM counts CROSS JOIN tot
      |ORDER BY c DESC, l_suppkey
      |LIMIT 10""".stripMargin

  /** §2.2 #21bc — pre-execution join-SIZE estimation: before shuffling
    * 100 TB into a many-many self-join on user_id (the
    * `q_concurrency` / `q_copurchase` shape), predict its output
    * cardinality. Exact size = Σ_k c(k)² needs the full per-key
    * rollup; the 256-bucket sketch — bucket = md5-uniform(key) mod
    * 256, n_b = Σ c(k) over the bucket — yields the AGM-style upper
    * bound Σ_b n_b², a 256-row summary a cost-based planner can keep
    * per table and join against ANY other table's sketch (Σ n_b·m_b
    * bounds the two-table join the same way). The report carries both
    * plus `over_ppm`, the sketch's relative overestimate — how much
    * resolution 256 buckets lose on this key distribution.
    *
    * Pair counts aggregate in DECIMAL(38,0) (Spark) / HUGEINT→DECIMAL
    * (DuckDB), exact to 10³⁸ — no int64 ceiling on a quadratic
    * quantity. The ppm ratio uses the split two-step division; its
    * intermediates stay exact while est_pairs ≤ 10³⁵.
    */
  def qJoinCard(spark: SparkSession, dir: String): DataFrame = {
    val counts = table(spark, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("c"))
    val exact = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("exact_pairs"))
    val sketch = counts
      .withColumn("h32",
        conv(substring(md5(concat(col("user_id").cast(StringType), lit(":joincard"))), 1, 8), 16, 10)
          .cast(LongType))
      .withColumn("bucket", expr("h32 % 256"))
      .groupBy(col("bucket")).agg(sum(col("c")).as("nb"))
    val est = sketch.agg(
      count(lit(1)).as("n_buckets"),
      sum(expr("CAST(nb AS DECIMAL(38,0)) * nb")).as("est_pairs"))
    exact.crossJoin(broadcast(est))
      .withColumn("over_ppm", expr(
        """CAST(((est_pairs * 1000) div exact_pairs) * 1000
          | + ((est_pairs * 1000 % exact_pairs) * 1000) div exact_pairs - 1000000 AS BIGINT)""".stripMargin))
      .select(
        col("n_keys"), col("n_buckets"),
        // Strings, not DECIMAL(38,0) or DOUBLE: the pair counts are
        // quadratic quantities that can exceed 2^53 (where double
        // flattens), and the driver hashes the pandas materialization
        // — decimal-typed parquet lands as object(Decimal) while the
        // DuckDB side lands float64, diverging on representation.
        // A decimal-exact STRING is identical in both engines at any
        // magnitude.
        col("exact_pairs").cast(StringType).as("exact_pairs"),
        col("est_pairs").cast(StringType).as("est_pairs"),
        col("over_ppm"))
  }

  val qJoinCardSql: String =
    """WITH counts AS (
      |  SELECT user_id, count(*) AS c FROM events GROUP BY user_id
      |), ex AS (
      |  SELECT count(*) AS n_keys, sum(CAST(c AS HUGEINT) * c) AS ep FROM counts
      |), bkt AS (
      |  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':joincard'), 1, 8))::BIGINT % 256 AS bucket,
      |    CAST(sum(c) AS HUGEINT) AS nb
      |  FROM counts GROUP BY 1
      |), est AS (
      |  SELECT count(*) AS n_buckets, sum(nb * nb) AS sp FROM bkt
      |)
      |SELECT n_keys, n_buckets,
      |  CAST(CAST(ep AS DECIMAL(38,0)) AS VARCHAR) AS exact_pairs,
      |  CAST(CAST(sp AS DECIMAL(38,0)) AS VARCHAR) AS est_pairs,
      |  CAST((sp * 1000 // ep) * 1000 + ((sp * 1000 % ep) * 1000) // ep - 1000000 AS BIGINT) AS over_ppm
      |FROM ex, est""".stripMargin

  /** §2.2 #21bc — CROSS-TABLE join-size estimation, the piece that
    * makes [[qJoinCard]] a planner primitive rather than a self-join
    * demo: estimate |events ⋈_{user_id=o_custkey} orders| from two
    * independently-built 256-bucket sketches. Each relation keeps a
    * per-table summary — bucket = md5-uniform(key) mod 256 (the SAME
    * salted hash on both tables, so equal keys land in equal
    * buckets), n_b / m_b = Σ c(k) over the bucket — and the planner
    * joins the 256-row summaries on bucket: Σ_b n_b·m_b is an
    * AGM-style upper bound on the true join cardinality
    * Σ_k c_e(k)·c_o(k), with equality iff every bucket holds at most
    * one distinct matching key ("pure"). A cost-based planner can
    * keep one such sketch per table per key column and preflight ANY
    * pairwise join without touching the data.
    *
    * Pair counts aggregate in DECIMAL(38,0) / HUGEINT (exact to
    * 10³⁸) and are emitted as decimal-exact STRINGs (double would
    * flatten above 2^53); the sketch join is a 256×256-row
    * broadcast. JoinCardSpec pins the upper-bound property.
    */
  def qJoinCard2(spark: SparkSession, dir: String): DataFrame = {
    def keyCounts(df: DataFrame, key: String) =
      df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
    def bucketed(counts: DataFrame) = counts
      .withColumn("bucket",
        conv(substring(md5(concat(col("k").cast(StringType), lit(":joincard"))), 1, 8), 16, 10)
          .cast(LongType) % 256)
      .groupBy(col("bucket")).agg(sum(col("c")).as("nb"), count(lit(1)).as("nk"))
    val ce = keyCounts(table(spark, dir, "events"), "user_id")
    val co = keyCounts(table(spark, dir, "orders"), "o_custkey")
    val exact = ce.join(co.withColumnRenamed("c", "c2"), "k")
      .agg(sum(expr("CAST(c AS DECIMAL(38,0)) * c2")).as("exact_pairs"))
    val se = bucketed(ce).withColumnRenamed("nk", "nk_e")
    val so = bucketed(co).select(col("bucket"), col("nb").as("mb"), col("nk").as("nk_o"))
    val est = se.join(broadcast(so), "bucket").agg(
      count(lit(1)).as("n_buckets"),
      sum(expr("CAST(nb AS DECIMAL(38,0)) * mb")).as("est_pairs"),
      sum(col("nk_e")).as("n_keys_e"),
      sum(col("nk_o")).as("n_keys_o"))
    exact.crossJoin(broadcast(est))
      .withColumn("over_ppm", expr(
        """CAST(((est_pairs * 1000) div exact_pairs) * 1000
          | + ((est_pairs * 1000 % exact_pairs) * 1000) div exact_pairs - 1000000 AS BIGINT)""".stripMargin))
      .select(
        col("n_keys_e"), col("n_keys_o"), col("n_buckets"),
        col("exact_pairs").cast(StringType).as("exact_pairs"),
        col("est_pairs").cast(StringType).as("est_pairs"),
        col("over_ppm"))
  }

  val qJoinCard2Sql: String =
    """WITH ce AS (
      |  SELECT user_id AS k, count(*) AS c FROM events GROUP BY 1
      |), co AS (
      |  SELECT o_custkey AS k, count(*) AS c FROM orders GROUP BY 1
      |), ex AS (
      |  SELECT sum(CAST(ce.c AS HUGEINT) * co.c) AS ep FROM ce JOIN co USING (k)
      |), se AS (
      |  SELECT ('0x' || substr(md5(CAST(k AS VARCHAR) || ':joincard'), 1, 8))::BIGINT % 256 AS bucket,
      |    CAST(sum(c) AS HUGEINT) AS nb, count(*) AS nk_e
      |  FROM ce GROUP BY 1
      |), so AS (
      |  SELECT ('0x' || substr(md5(CAST(k AS VARCHAR) || ':joincard'), 1, 8))::BIGINT % 256 AS bucket,
      |    CAST(sum(c) AS HUGEINT) AS mb, count(*) AS nk_o
      |  FROM co GROUP BY 1
      |), est AS (
      |  SELECT count(*) AS n_buckets, sum(nb * mb) AS sp,
      |    CAST(sum(nk_e) AS BIGINT) AS n_keys_e, CAST(sum(nk_o) AS BIGINT) AS n_keys_o
      |  FROM se JOIN so USING (bucket)
      |)
      |SELECT n_keys_e, n_keys_o, n_buckets,
      |  CAST(CAST(ep AS DECIMAL(38,0)) AS VARCHAR) AS exact_pairs,
      |  CAST(CAST(sp AS DECIMAL(38,0)) AS VARCHAR) AS est_pairs,
      |  CAST((sp * 1000 // ep) * 1000 + ((sp * 1000 % ep) * 1000) // ep - 1000000 AS BIGINT) AS over_ppm
      |FROM ex, est""".stripMargin

  /** §2.2 #21ap — ordered path aggregation: each customer's order
    * history as a priority "journey string" in (date, orderkey) order
    * — the funnel-path / clickstream-journey primitive. The ordering
    * is NOT a window: collect_list + array_sort on a (date, orderkey,
    * step) struct sorts inside each group's aggregation buffer, so
    * the plan is ONE custkey shuffle with partial aggregation — no
    * sort exchange, no window pass. Struct field order makes the
    * lexicographic sort the total (date, orderkey) order, and the
    * monotone orderkey tiebreak makes the path deterministic.
    */
  def qOrderpath(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
    o.groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        concat_ws(">",
          transform(
            array_sort(collect_list(struct(col("o_orderdate"), col("o_orderkey"), substring(col("o_orderpriority"), 1, 1).as("step")))),
            s => s.getField("step"),
          ),
        ).as("path"),
      )
      .orderBy("o_custkey")
  }

  val qOrderpathSql: String =
    """SELECT o_custkey,
      |  count(*) AS n_orders,
      |  string_agg(substring(o_orderpriority, 1, 1), '>' ORDER BY o_orderdate, o_orderkey) AS path
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  /** §2.2 #21aq — incremental view maintenance by algebraic merge: a
    * per-customer (n_orders, spend) aggregate maintained under an
    * arriving delta batch WITHOUT recomputing the base — merge the
    * base aggregate with the delta's own aggregate via a full outer
    * join and coalesce-add (count and DECIMAL sum are algebraic:
    * merge(a,b) = a+b). At 100 TB the base aggregate is a standing
    * table and only the delta (tiny) aggregates + broadcasts into the
    * merge — the maintenance cost is ∝ |delta|, not |base|. The
    * oracle recomputes from scratch over the union: passing proves
    * merge ≡ recompute.
    */
  def qIvmMerge(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
    def aggOf(d: DataFrame) = d.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), sum(decP(col("o_totalprice"))).as("s"))
    val base = aggOf(o.filter(col("o_orderkey") % 10 =!= 0))
      .select(col("o_custkey"), col("n").as("n_base"), col("s").as("s_base"))
    val delta = aggOf(o.filter(col("o_orderkey") % 10 === 0))
      .select(col("o_custkey"), col("n").as("n_delta"), col("s").as("s_delta"))
    base
      .join(delta, Seq("o_custkey"), "full_outer")
      .select(
        col("o_custkey"),
        (coalesce(col("n_base"), lit(0L)) + coalesce(col("n_delta"), lit(0L))).as("n_orders"),
        dbl(coalesce(col("s_base"), lit(0).cast(DecimalType(12, 2))) +
          coalesce(col("s_delta"), lit(0).cast(DecimalType(12, 2)))).as("spend"),
      )
      .orderBy("o_custkey")
  }

  val qIvmMergeSql: String =
    """SELECT o_custkey,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  /** §2.2 #21aw — event-transition (first-order Markov) report: for
    * every (from_type → to_type) pair of CONSECUTIVE events within a
    * user's stream, the transition count and its probability given
    * from_type — the behavioral-analytics "what happens next" matrix
    * that feeds next-action prediction and anomaly baselines.
    *
    * Scale shape: one window pass partitioned by user_id (`lead`,
    * frame bounded to the next row — per-user streams are short, so
    * the window never concentrates) and two small aggregations over
    * the ~|event_types|² transition space. Cross-engine exactness:
    * ordering is (µs, event_id) — total and identical in both
    * engines — and the probability is floor-quantized to ppm in int64
    * (`(n * 1_000_000) div from_total`), so no float ever enters.
    */
  def qMarkov(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val pairs = table(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_type")).agg(sum(col("n")).as("from_total"))
    pairs
      .join(totals, "from_type") // broadcast: |event_types| rows
      .select(
        col("from_type"), col("to_type"), col("n"),
        expr("(n * 1000000L) div from_total").as("prob_ppm"),
      )
      .orderBy("from_type", "to_type")
  }

  val qMarkovSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events
      |), p AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY us, event_id) AS to_type
      |  FROM e
      |), c AS (
      |  SELECT from_type, to_type, count(*) AS n FROM p
      |  WHERE to_type IS NOT NULL GROUP BY 1, 2
      |)
      |SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
      |  CAST((n * 1000000) // SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS prob_ppm
      |FROM c
      |ORDER BY from_type, to_type""".stripMargin

  /** §2.2 #21ch — functional-dependency audit: does `lhs → rhs`
    * actually HOLD in the data — the schema-contract check behind
    * denormalization, dimension extraction, and join-key trust
    * (profiling's rule-shaped sibling next to [[profileTable]]'s
    * per-column stats and the referential [[qIntegrity]] audit). Four
    * declared FDs are measured: one that must hold (nation →
    * region — safe to denormalize), and three behavioral ones that
    * must NOT (customer → priority, user → event type, source →
    * language), each reported as group counts, violating-group
    * counts, worst fan-out, and violation ppm.
    *
    * Scale shape: one map-side-combined groupBy per FD on its lhs
    * key + a 1-row rollup — the same pass count a SELECT DISTINCT
    * costs; FDs over the same lhs share a scan. All counts exact
    * int64, floor-ppm — no float.
    */
  def qFdAudit(spark: SparkSession, dir: String): DataFrame = {
    def fd(df: DataFrame, tbl: String, lhs: String, rhs: String): DataFrame =
      df.groupBy(col(lhs)).agg(countDistinct(col(rhs)).as("ndv"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("ndv") > 1, 1L).otherwise(0L)).as("n_violating"),
          max(col("ndv")).as("max_fanout"))
        .select(lit(tbl).as("tbl"), lit(s"$lhs->$rhs").as("fd"),
          col("n_groups"), col("n_violating"), col("max_fanout"))
    val t = table(spark, dir, _: String)
    fd(t("nation"), "nation", "n_nationkey", "n_regionkey")
      .unionByName(fd(t("orders"), "orders", "o_custkey", "o_orderpriority"))
      .unionByName(fd(t("events"), "events", "user_id", "event_type"))
      .unionByName(fd(t("documents"), "documents", "source", "lang"))
      .withColumn("violation_ppm", expr("n_violating * 1000000 div n_groups"))
      .orderBy("tbl", "fd")
  }

  val qFdAuditSql: String =
    """WITH f1 AS (
      |  SELECT 'nation' AS tbl, 'n_nationkey->n_regionkey' AS fd,
      |    count(*) AS n_groups,
      |    CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
      |    CAST(max(ndv) AS BIGINT) AS max_fanout
      |  FROM (SELECT n_nationkey, count(DISTINCT n_regionkey) AS ndv
      |        FROM nation GROUP BY 1)
      |), f2 AS (
      |  SELECT 'orders', 'o_custkey->o_orderpriority', count(*),
      |    CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(max(ndv) AS BIGINT)
      |  FROM (SELECT o_custkey, count(DISTINCT o_orderpriority) AS ndv
      |        FROM orders GROUP BY 1)
      |), f3 AS (
      |  SELECT 'events', 'user_id->event_type', count(*),
      |    CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(max(ndv) AS BIGINT)
      |  FROM (SELECT user_id, count(DISTINCT event_type) AS ndv
      |        FROM events GROUP BY 1)
      |), f4 AS (
      |  SELECT 'documents', 'source->lang', count(*),
      |    CAST(sum(CASE WHEN ndv > 1 THEN 1 ELSE 0 END) AS BIGINT),
      |    CAST(max(ndv) AS BIGINT)
      |  FROM (SELECT source, count(DISTINCT lang) AS ndv
      |        FROM documents GROUP BY 1)
      |), u AS (
      |  SELECT * FROM f1 UNION ALL SELECT * FROM f2
      |  UNION ALL SELECT * FROM f3 UNION ALL SELECT * FROM f4
      |)
      |SELECT tbl, fd, n_groups, n_violating, max_fanout,
      |  n_violating * 1000000 // n_groups AS violation_ppm
      |FROM u
      |ORDER BY tbl, fd""".stripMargin

  /** §2.2 #21cg — bitmap-index activity / retention algebra: each
    * user's last-64-day activity compressed to ONE int64 bitmask
    * (bit i = active i days before the corpus max day) in a single
    * `bit_or` aggregation — then every retention/audience question is
    * pure bitwise math on the mask, no second scan and no self-join.
    * This is the bitmap-index trick (roaring-bitmap audiences,
    * ClickHouse `groupBitmap`) that makes "active today AND a week
    * ago" O(users) instead of the event-table self-join
    * [[qRetention]] does per cohort pair. Report rows are
    * active-day-count buckets with exact member counts plus the
    * today / week-ago / both bit tests.
    *
    * Scale shape: one shuffle keyed on user_id with map-side
    * `bit_or` partials (the mask is 8 BYTES of state per user — the
    * whole point), then a tiny bucket rollup; at 100 TB the mask
    * column persists as an incrementally-maintained user dimension
    * (yesterday's mask `>> 1 | today's bit` — the [[qIvmMerge]]
    * algebra). All int64 bit ops — bit-identical cross-engine.
    */
  def qBitmapRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
    val d1 = ev.agg(max(col("day"))).head.getLong(0)
    val masks = ev
      .withColumn("off", lit(d1) - col("day"))
      .filter(col("off") < 64)
      .groupBy(col("user_id"))
      .agg(bit_or(expr("shiftleft(1L, CAST(off AS INT))")).as("mask"))
    masks
      .select(
        bit_count(col("mask")).cast(LongType).as("active_days"),
        (col("mask").bitwiseAND(1L)).as("today"),
        (expr("shiftright(mask, 7)").bitwiseAND(1L)).as("week_ago"),
      )
      .groupBy(col("active_days"))
      .agg(
        count(lit(1)).as("n_users"),
        sum(col("today")).as("n_today"),
        sum(col("week_ago")).as("n_week_ago"),
        sum(col("today") * col("week_ago")).as("n_both"),
      )
      .orderBy("active_days")
  }

  val qBitmapRetentionSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events
      |), b AS (
      |  SELECT max(day) AS d1 FROM e
      |), m AS (
      |  SELECT user_id,
      |    bit_or(CAST(1 AS BIGINT) << CAST(d1 - day AS INT)) AS mask
      |  FROM e CROSS JOIN b
      |  WHERE d1 - day < 64
      |  GROUP BY user_id
      |), f AS (
      |  SELECT CAST(bit_count(mask) AS BIGINT) AS active_days,
      |    mask & 1 AS today,
      |    (mask >> 7) & 1 AS week_ago
      |  FROM m
      |)
      |SELECT active_days, count(*) AS n_users,
      |  CAST(sum(today) AS BIGINT) AS n_today,
      |  CAST(sum(week_ago) AS BIGINT) AS n_week_ago,
      |  CAST(sum(today * week_ago) AS BIGINT) AS n_both
      |FROM f
      |GROUP BY active_days
      |ORDER BY active_days""".stripMargin

  /** §2.2 #21cf — time-in-state / dwell-time report: how long users
    * SIT in each state before the next event — the duration companion
    * to [[qMarkov]]'s transition counts (where do users stall vs flow;
    * the session-UX and ops-funnel latency signal). Each inter-event
    * gap is attributed to the EARLIER event's type; per state the
    * report carries interval count, total/mean/max dwell in exact
    * integer microseconds.
    *
    * Scale shape: one `lead` window pass on the per-user (µs,
    * event_id) total order (bounded frame, user streams short — the
    * q_markov shape) + one small agg over |event_types| groups. All
    * int64; mean is floor division after the aggregate, so no float
    * enters.
    */
  def qDwell(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    table(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .withColumn("dwell", lead(col("us"), 1).over(w) - col("us"))
      .filter(col("dwell").isNotNull)
      .groupBy(col("event_type").as("state"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dwell")).as("total_us"),
        max(col("dwell")).as("max_us"))
      .withColumn("mean_us", expr("total_us div n_intervals"))
      .orderBy("state")
  }

  val qDwellSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events
      |), d AS (
      |  SELECT event_type AS state,
      |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us AS dwell
      |  FROM e
      |)
      |SELECT state, count(*) AS n_intervals,
      |  CAST(sum(dwell) AS BIGINT) AS total_us,
      |  CAST(max(dwell) AS BIGINT) AS max_us,
      |  CAST(sum(dwell) // count(*) AS BIGINT) AS mean_us
      |FROM d WHERE dwell IS NOT NULL
      |GROUP BY state
      |ORDER BY state""".stripMargin

  /** §2.2 #21cd — frequent sequential patterns (PrefixSpan-lite):
    * which "a happens, then LATER b happens" patterns are common
    * across users — the sequence-mining upgrade of [[qMarkov]], which
    * only sees ADJACENT pairs. Pattern a→b holds for a user iff some
    * occurrence of a precedes some occurrence of b in their stream
    * (any gap allowed); support = users exhibiting it; patterns below
    * 1% user share are pruned. a→a (support = "a recurs") is included
    * — the repeat-behavior signal.
    *
    * Scale shape: the classic formulation enumerates occurrence pairs
    * (quadratic per user). This is linear: a→b for a user ⟺
    * first_pos(a) < last_pos(b), so one bounded per-user window
    * (row_number on the (µs, event_id) total order, same as
    * [[qMarkov]]) + a (user, type) min/max rollup collapses each
    * user to ≤|event_types| rows, and the per-user self-join is then
    * ≤|event_types|² rows/user regardless of stream length. Counts
    * exact int64, share floor-quantized to ppm — no float.
    */
  def qSeqmine(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val spans = table(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .withColumn("pos", row_number().over(w))
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("pos")).as("first_pos"), max(col("pos")).as("last_pos"))
    val a = spans.select(col("user_id"), col("event_type").as("a"), col("first_pos"))
    val b = spans.select(col("user_id").as("b_user"), col("event_type").as("b"),
      col("last_pos"))
    val nUsers = table(spark, dir, "events")
      .agg(countDistinct(col("user_id")).as("n_users"))
    a.join(b, col("user_id") === col("b_user") && col("first_pos") < col("last_pos"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("support"))
      .crossJoin(broadcast(nUsers))
      .withColumn("share_ppm", expr("(support * 1000000L) div n_users"))
      .filter(col("share_ppm") >= 10000)
      .select(col("a"), col("b"), col("support"), col("share_ppm"))
      .orderBy("a", "b")
  }

  val qSeqmineSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS us, event_id, event_type FROM events
      |), p AS (
      |  SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS pos
      |  FROM e
      |), s AS (
      |  SELECT user_id, event_type,
      |    min(pos) AS first_pos, max(pos) AS last_pos
      |  FROM p GROUP BY 1, 2
      |), u AS (SELECT count(DISTINCT user_id) AS n_users FROM events),
      |pat AS (
      |  SELECT a.event_type AS a, b.event_type AS b, count(*) AS support
      |  FROM s a JOIN s b ON a.user_id = b.user_id AND a.first_pos < b.last_pos
      |  GROUP BY 1, 2
      |)
      |SELECT a, b, CAST(support AS BIGINT) AS support,
      |  CAST(support * 1000000 // n_users AS BIGINT) AS share_ppm
      |FROM pat CROSS JOIN u
      |WHERE support * 1000000 // n_users >= 10000
      |ORDER BY a, b""".stripMargin

  /** §2.2 #21ax — item-item cosine similarity over the co-purchase
    * matrix ("customers who bought X also bought Y, normalized"):
    * cosine(i,j) = |orders with both| / √(|orders with i|·|orders
    * with j|), the item-based collaborative-filtering primitive that
    * upgrades raw co-purchase counts ([[qCopurchase]]) into a
    * popularity-corrected score.
    *
    * Scale shape: the pair space comes from the same
    * distinct-(order, part) self-join as [[qCopurchase]] (both sides
    * one shared shuffle; output bounded by lines-per-order², linear
    * in the fact), per-item order counts join in by part key, and
    * top-100 is a TakeOrdered. Cross-engine exactness: counts are
    * exact int64; `1_000_000·n_ij` is an exact integer product, and
    * √ + ÷ are both IEEE exactly-rounded on the same inputs, so the
    * doubles agree bit-for-bit before the floor quantization — no
    * accumulated float error anywhere (the counts themselves stay
    * < 2^26, so n_i·n_j is exact in double).
    */
  def qItemSim(spark: SparkSession, dir: String): DataFrame = {
    val l = table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val itemN = l.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_item"))
    val a = l.select(col("l_orderkey"), col("l_partkey").as("p1"))
    val b = l.select(col("l_orderkey").as("b_orderkey"), col("l_partkey").as("p2"))
    a.join(b, col("l_orderkey") === col("b_orderkey") && col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= 3)
      .join(itemN.select(col("l_partkey").as("p1"), col("n_item").as("n1")), "p1")
      .join(itemN.select(col("l_partkey").as("p2"), col("n_item").as("n2")), "p2")
      .select(
        col("p1"), col("p2"), col("n_both"), col("n1"), col("n2"),
        floor(lit(1000000L) * col("n_both") / sqrt(col("n1") * col("n2")))
          .cast(LongType).as("cosine_ppm"),
      )
      .orderBy(col("cosine_ppm").desc, col("p1"), col("p2"))
      .limit(100)
  }

  val qItemSimSql: String =
    """WITH l AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |i AS (SELECT l_partkey, count(*) AS n_item FROM l GROUP BY 1),
      |pairs AS (
      |  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_both
      |  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 3
      |)
      |SELECT p1, p2, CAST(n_both AS BIGINT) AS n_both,
      |  CAST(i1.n_item AS BIGINT) AS n1, CAST(i2.n_item AS BIGINT) AS n2,
      |  CAST(floor(1000000 * n_both / sqrt(CAST(i1.n_item AS DOUBLE) * i2.n_item)) AS BIGINT) AS cosine_ppm
      |FROM pairs JOIN i i1 ON i1.l_partkey = p1 JOIN i i2 ON i2.l_partkey = p2
      |ORDER BY cosine_ppm DESC, p1, p2
      |LIMIT 100""".stripMargin

  /** §2.2 #21ay — Pareto / cumulative-revenue-share report: customers
    * ranked by lifetime spend within their market segment, each
    * carrying its cumulative share of segment revenue (ppm) and a
    * flag for membership in the head that makes up 80% of revenue —
    * the "which customers matter" tiering behind every
    * revenue-concentration dashboard.
    *
    * Scale shape: the only fact-sized shuffle is the per-customer
    * spend rollup; the running sum partitions by segment (parallel,
    * never global). Cross-engine exactness: spend is an exact DECIMAL
    * sum converted to integer cents, the running sum and total are
    * int64, the share is ppm floor division, and the 80% flag
    * compares the EXCLUSIVE integer prefix — no float anywhere.
    * Headroom: the ×10^6 products clear int64 up to ~9×10^12 cents
    * per segment; past that the sums go DECIMAL(38,0) — the q_abtest
    * knob.
    */
  def qPareto(spark: SparkSession, dir: String): DataFrame = {
    val spend = table(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg((sum(decP(col("o_totalprice"))) * 100).cast(LongType).as("cents"))
      .join(table(spark, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
    val wRun = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("cents").desc, col("o_custkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("c_mktsegment"))
    spend
      .withColumn("cum_cents", sum(col("cents")).over(wRun))
      .withColumn("seg_cents", sum(col("cents")).over(wTot))
      .select(
        col("c_mktsegment"), col("o_custkey").as("custkey"), col("cents"),
        expr("(cum_cents * 1000000L) div seg_cents").as("cum_share_ppm"),
        // in the 80% head iff revenue BEFORE this customer is < 80%
        (((col("cum_cents") - col("cents")) * 1000000L) < col("seg_cents") * 800000L).as("in_top80"),
      )
      .orderBy("c_mktsegment", "cum_share_ppm", "custkey")
  }

  val qParetoSql: String =
    """WITH spend AS (
      |  SELECT c_mktsegment, o_custkey AS custkey,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2
      |), r AS (
      |  SELECT c_mktsegment, custkey, cents,
      |    sum(cents) OVER (PARTITION BY c_mktsegment
      |                     ORDER BY cents DESC, custkey
      |                     ROWS UNBOUNDED PRECEDING) AS cum_cents,
      |    sum(cents) OVER (PARTITION BY c_mktsegment) AS seg_cents
      |  FROM spend
      |)
      |SELECT c_mktsegment, custkey, cents,
      |  CAST((cum_cents * 1000000) // seg_cents AS BIGINT) AS cum_share_ppm,
      |  ((cum_cents - cents) * 1000000) < seg_cents * 800000 AS in_top80
      |FROM r
      |ORDER BY c_mktsegment, cum_share_ppm, custkey""".stripMargin

  /** §2.2 #21az — modal value per group (most frequent order priority
    * per market segment, deterministic tie-break on the priority
    * string): the categorical summary statistic GROUP BY can't express
    * directly. Two keyed aggregations (fact-sized then
    * segments×priorities-sized) and a per-segment rank over the tiny
    * rollup — nothing wide beyond the first shuffle at any scale.
    */
  def qMode(spark: SparkSession, dir: String): DataFrame = {
    val counts = table(spark, dir, "orders")
      .join(table(spark, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("n").desc, col("o_orderpriority"))
    counts
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("c_mktsegment"), col("o_orderpriority").as("mode_priority"), col("n"))
      .orderBy("c_mktsegment")
  }

  val qModeSql: String =
    """WITH c AS (
      |  SELECT c_mktsegment, o_orderpriority, count(*) AS n
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2
      |)
      |SELECT c_mktsegment, o_orderpriority AS mode_priority, CAST(n AS BIGINT) AS n
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY c_mktsegment
      |                               ORDER BY n DESC, o_orderpriority) AS rk
      |  FROM c
      |)
      |WHERE rk = 1
      |ORDER BY c_mktsegment""".stripMargin

  /** §2.2 #21ba — RFM (recency / frequency / monetary) customer
    * segmentation: days since last order against a fixed anchor,
    * order count, integer-cents spend, each scored into quintiles
    * WITHIN the customer's market segment (partition-parallel — a
    * global ntile would funnel every row through one partition, the
    * q_ntile lesson; a global variant pre-aggregates the rollup
    * first), composed into the classic 3-digit RFM code.
    *
    * Cross-engine exactness: recency is integer µs floor-divided to
    * days, spend is exact DECIMAL→cents, and every ntile orders by a
    * tie-free (metric, custkey) key — ntile's ceil/floor bucket split
    * is SQL-standard and identical in both engines.
    */
  def qRfm(spark: SparkSession, dir: String): DataFrame = {
    val agg = table(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(
        max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("f"),
        (sum(decP(col("o_totalprice"))) * 100).cast(LongType).as("cents"),
      )
      .join(table(spark, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .withColumn("recency_days",
        expr("(unix_micros(timestamp'2001-08-02 00:00:00') - unix_micros(last_order)) div 86400000000"))
    val seg = Window.partitionBy(col("c_mktsegment"))
    val rQ = ntile(5).over(seg.orderBy(col("recency_days"), col("o_custkey")))
    val fQ = ntile(5).over(seg.orderBy(col("f").desc, col("o_custkey")))
    val mQ = ntile(5).over(seg.orderBy(col("cents").desc, col("o_custkey")))
    agg
      .select(
        col("o_custkey").as("custkey"), col("c_mktsegment"),
        col("recency_days"), col("f"), col("cents"),
        rQ.cast(LongType).as("r_q"), fQ.cast(LongType).as("f_q"), mQ.cast(LongType).as("m_q"),
      )
      .withColumn("rfm_code", col("r_q") * 100 + col("f_q") * 10 + col("m_q"))
      .orderBy("custkey")
  }

  val qRfmSql: String =
    """WITH agg AS (
      |  SELECT o_custkey AS custkey, c_mktsegment,
      |    CAST((epoch_us(TIMESTAMP '2001-08-02') - epoch_us(max(o_orderdate))) // 86400000000 AS BIGINT) AS recency_days,
      |    count(*) AS f,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY o_custkey, c_mktsegment
      |), t AS (
      |  SELECT custkey, c_mktsegment, recency_days, CAST(f AS BIGINT) AS f, cents,
      |    CAST(ntile(5) OVER (PARTITION BY c_mktsegment ORDER BY recency_days, custkey) AS BIGINT) AS r_q,
      |    CAST(ntile(5) OVER (PARTITION BY c_mktsegment ORDER BY f DESC, custkey) AS BIGINT) AS f_q,
      |    CAST(ntile(5) OVER (PARTITION BY c_mktsegment ORDER BY cents DESC, custkey) AS BIGINT) AS m_q
      |  FROM agg
      |)
      |SELECT *, r_q * 100 + f_q * 10 + m_q AS rfm_code
      |FROM t
      |ORDER BY custkey""".stripMargin

  /** §2.2 #21bb — seasonality heatmap: event volume and integer value
    * mass per (day-of-week, hour-of-day) cell — the weekly-rhythm
    * decomposition behind load forecasting and anomaly baselines.
    * Calendar math is PURE int64 epoch arithmetic (`day = us div
    * 86400e6`, `dow = (day + 3) mod 7` with 0 = Monday since
    * 1970-01-01 was a Thursday, `hour = (us div 3600e6) mod 24`) —
    * engine calendar functions disagree on week conventions
    * (Spark's dayofweek starts Sunday=1, DuckDB's dayofweek
    * Sunday=0), integer division does not. One map-side projection +
    * one 168-cell aggregation; trivially parallel at any scale.
    */
  def qSeasonality(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .select(
        unix_micros(col("ts")).as("us"),
        floor(col("value")).cast(LongType).as("v"),
      )
      .select(
        expr("((us div 86400000000) + 3) % 7").as("dow"),
        expr("(us div 3600000000) % 24").as("hour"),
        col("v"),
      )
      .groupBy(col("dow"), col("hour"))
      .agg(count(lit(1)).as("n_events"), sum(col("v")).as("sum_v"))
      .orderBy("dow", "hour")

  val qSeasonalitySql: String =
    """SELECT ((epoch_us(ts) // 86400000000) + 3) % 7 AS dow,
      |  (epoch_us(ts) // 3600000000) % 24 AS hour,
      |  count(*) AS n_events,
      |  CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_v
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY dow, hour""".stripMargin

  /** §2.2 #21bd — volume-weighted average unit price per (brand,
    * 30-day bucket): the VWAP shape behind price monitoring /
    * fairness audits. Unit price is sum(extendedprice)/sum(quantity),
    * computed entirely in integers — per-row DECIMAL→cents, int64
    * sums, one floor division at the end — so it is order-free and
    * bit-exact cross-engine. Time buckets are pure epoch-µs integer
    * division (the q_seasonality lesson: engine calendar functions
    * disagree; integer division doesn't).
    *
    * Scale: the fact-side agg combines map-side down to
    * (partkey-join-key grain → brand × bucket ≈ thousands of rows);
    * part joins on the co-partitioned key and AQE picks broadcast
    * while part is small. Nothing here holds more than a group row.
    */
  def qVwap(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .select(
        col("l_partkey"),
        expr("unix_micros(l_shipdate) div 2592000000000").as("bucket30"),
        (decP(col("l_extendedprice")) * 100).cast(LongType).as("cents"),
        col("l_quantity").cast(LongType).as("qty"),
      )
      .join(table(spark, dir, "part").select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("bucket30"))
      .agg(sum(col("qty")).as("qty_sum"), sum(col("cents")).as("cents_sum"))
      .withColumn("vwap_cents", expr("cents_sum div qty_sum"))
      .orderBy("p_brand", "bucket30")

  val qVwapSql: String =
    """SELECT p_brand, epoch_us(l_shipdate) // 2592000000000 AS bucket30,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS cents_sum,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT))
      |    // sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS vwap_cents
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1, 2
      |ORDER BY p_brand, bucket30""".stripMargin

  /** §2.2 #21be — CUSUM changepoint detection per event type: the day
    * where the cumulative deviation of daily event counts from the
    * type's mean peaks — the classic single-changepoint locator for
    * "when did traffic shift?". With D observed days and total T,
    * cusum_d = Σ_{i≤d}(c_i·D − T) = D·cum_d − r_d·T stays in exact
    * int64 (counts ≤ events, D ≤ days), so the argmax is bit-exact
    * cross-engine; ties break on the earlier day.
    *
    * Scale: one map-side-combined shuffle collapses events to
    * (type, day) grain — after that the series is |types|·|days|
    * rows, and every window partitions by type, so the heavy data
    * passes exactly one aggregation and the windows run on the tiny
    * rollup, partition-parallel.
    */
  def qChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val daily = table(spark, dir, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
    val wSeq = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wTot = Window.partitionBy(col("event_type"))
    val scored = daily
      .withColumn("cum", sum(col("c")).over(wSeq))
      .withColumn("r", row_number().over(Window.partitionBy(col("event_type")).orderBy(col("day"))).cast(LongType))
      .withColumn("n_days", count(lit(1)).over(wTot))
      .withColumn("total", sum(col("c")).over(wTot))
      .withColumn("cusum", col("cum") * col("n_days") - col("r") * col("total"))
    val best = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("cusum")).desc, col("day"))
    scored
      .withColumn("rk", row_number().over(best))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("day").as("cp_day"), col("cusum"),
        col("n_days"), col("total").as("total_events"))
      .orderBy("event_type")
  }

  val qChangepointSql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS c
      |  FROM events GROUP BY 1, 2
      |), s AS (
      |  SELECT event_type, day,
      |    sum(c) OVER (PARTITION BY event_type ORDER BY day ROWS UNBOUNDED PRECEDING) AS cum,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS r,
      |    count(*) OVER (PARTITION BY event_type) AS n_days,
      |    sum(c) OVER (PARTITION BY event_type) AS total
      |  FROM daily
      |), z AS (
      |  SELECT event_type, day, CAST(cum * n_days - r * total AS BIGINT) AS cusum,
      |    CAST(n_days AS BIGINT) AS n_days, CAST(total AS BIGINT) AS total,
      |    row_number() OVER (PARTITION BY event_type ORDER BY abs(cum * n_days - r * total) DESC, day) AS rk
      |  FROM s
      |)
      |SELECT event_type, day AS cp_day, cusum, n_days, total AS total_events
      |FROM z WHERE rk = 1
      |ORDER BY event_type""".stripMargin

  /** §2.2 #21bf — peak session concurrency per day: how many user
    * sessions (the q_sessionize 30-min gap rule) overlap at the
    * busiest instant of each day — the capacity-planning number. The
    * classic interval sweep, distributed: sessions split into per-day
    * segments (explode over the days each spans, clipped to day
    * bounds), each segment emits +1 at its start and −1 just after
    * its closed end, deltas collapse to (day, µs) grain, and a
    * per-day running sum's max — earliest µs on ties — is the peak.
    * Everything is int64; the sweep is exact at µs resolution, and
    * the function is piecewise-constant between boundaries so the
    * boundary max IS the global max.
    *
    * Scale: sessionize windows are per-user (partition-parallel);
    * the sweep's window partitions by day over boundary-grain rows
    * (2 per session-day, collapsed by µs). For a day too hot for one
    * partition, the running sum decomposes into the standard two-pass
    * prefix sum (per-bucket partials + broadcast offsets) — same
    * plan shape, noted here as the 1000×-day escape hatch.
    */
  def qConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = 1800L * 1000000L
    val dayUs = 86400000000L
    val sessions = table(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull || (col("us") - col("prev_us")) > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_s")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"))
    val segs = sessions
      .select(col("start_us"), col("end_us"),
        explode(sequence(expr("start_us div 86400000000"), expr("end_us div 86400000000"))).as("day"))
      .select(col("day"),
        greatest(col("start_us"), col("day") * dayUs).as("seg_start"),
        // closed interval [start, end]: the decrement lands at end+1
        (least(col("end_us"), (col("day") + 1) * dayUs - 1) + 1).as("seg_end1"))
    val deltas = segs.select(col("day"), col("seg_start").as("us"), lit(1L).as("delta"))
      .unionByName(segs.select(col("day"), col("seg_end1").as("us"), lit(-1L).as("delta")))
      .groupBy(col("day"), col("us")).agg(sum(col("delta")).as("d"))
    val wDay = Window.partitionBy(col("day")).orderBy(col("us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val best = Window.partitionBy(col("day")).orderBy(col("conc").desc, col("us"))
    deltas
      .withColumn("conc", sum(col("d")).over(wDay))
      .withColumn("rk", row_number().over(best))
      .filter(col("rk") === 1)
      .select(col("day"), col("conc").as("peak_concurrency"), col("us").as("at_us"))
      .orderBy("day")
  }

  val qConcurrencySql: String =
    """WITH g AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS us,
      |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sess AS (
      |  SELECT user_id, session_id, min(us) AS start_us, max(us) AS end_us
      |  FROM (
      |    SELECT user_id, us,
      |      sum(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS session_id
      |    FROM g
      |  ) GROUP BY user_id, session_id
      |), segs AS (
      |  SELECT day,
      |    greatest(start_us, day * 86400000000) AS seg_start,
      |    least(end_us, (day + 1) * 86400000000 - 1) + 1 AS seg_end1
      |  FROM (
      |    SELECT start_us, end_us,
      |      unnest(generate_series(start_us // 86400000000, end_us // 86400000000)) AS day
      |    FROM sess
      |  )
      |), deltas AS (
      |  SELECT day, us, sum(delta) AS d FROM (
      |    SELECT day, seg_start AS us, 1 AS delta FROM segs
      |    UNION ALL
      |    SELECT day, seg_end1 AS us, -1 AS delta FROM segs
      |  ) GROUP BY day, us
      |), run AS (
      |  SELECT day, us,
      |    CAST(sum(d) OVER (PARTITION BY day ORDER BY us ROWS UNBOUNDED PRECEDING) AS BIGINT) AS conc
      |  FROM deltas
      |)
      |SELECT day, conc AS peak_concurrency, us AS at_us FROM (
      |  SELECT day, us, conc,
      |    row_number() OVER (PARTITION BY day ORDER BY conc DESC, us) AS rk
      |  FROM run
      |) WHERE rk = 1
      |ORDER BY day""".stripMargin

  /** §2.2 #21bg — seasonal-naive forecast backtest: predict each
    * day's event count by the count 7 days earlier and report the
    * per-type mean absolute error — the baseline every fancier
    * forecaster must beat, and the standard data-drift tripwire. The
    * week-lag pairing is a self-join of the daily rollup on
    * (type, day−7) — NOT a 7-row window lag, which silently pairs
    * wrong days when the series has gaps. All int64; MAE is reported
    * in exact ppm (total·10⁶ floor-div n) to stay division-free.
    *
    * Scale: events collapse to (type, day) grain in one
    * map-side-combined shuffle; everything after runs on the
    * types×days rollup.
    */
  def qForecast(spark: SparkSession, dir: String): DataFrame = {
    val daily = table(spark, dir, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
    val prev = daily.select(col("event_type"), (col("day") + 7).as("day"), col("c").as("c_prev"))
    daily
      .join(prev, Seq("event_type", "day"))
      .select(col("event_type"), abs(col("c") - col("c_prev")).as("err"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_scored"), sum(col("err")).as("total_abs_err"))
      .withColumn("mae_ppm", expr("total_abs_err * 1000000L div n_scored"))
      .orderBy("event_type")
  }

  val qForecastSql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS c
      |  FROM events GROUP BY 1, 2
      |), j AS (
      |  SELECT a.event_type, abs(a.c - b.c) AS err
      |  FROM daily a JOIN daily b
      |    ON a.event_type = b.event_type AND a.day = b.day + 7
      |)
      |SELECT event_type, count(*) AS n_scored,
      |  CAST(sum(err) AS BIGINT) AS total_abs_err,
      |  CAST(sum(err) * 1000000 // count(*) AS BIGINT) AS mae_ppm
      |FROM j GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** §2.2 #21bh — 7-day rolling distinct active users (rolling DAU/
    * WAU): for each day, how many distinct users were active in
    * [day−6, day]. COUNT(DISTINCT) over a sliding RANGE window isn't
    * supported by either engine — and the naive per-day re-scan is
    * quadratic in window length — so this uses the contribution
    * explode: dedup to (user, active-day) grain, explode each into
    * the ≤7 report-days it covers, dedup (user, report_day) — a user
    * active twice in one window counts once — then count per day.
    * All int64 day arithmetic; report days clipped to the observed
    * range so edge windows are honest partial windows.
    *
    * Scale: two map-side-combined distinct-aggs and a 7× bounded
    * explode of the (user, day) rollup — linear in activity, no
    * quadratic re-scan, no global window.
    */
  def qRollingDau(spark: SparkSession, dir: String): DataFrame = {
    val active = table(spark, dir, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    val bounds = active.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    active
      .crossJoin(broadcast(bounds))
      .select(col("user_id"),
        explode(sequence(col("day"), least(col("day") + 6, col("d1")))).as("report_day"))
      .groupBy(col("report_day"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .orderBy("report_day")
  }

  val qRollingDauSql: String =
    """WITH active AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
      |), b AS (SELECT max(day) AS d1 FROM active)
      |SELECT report_day, count(DISTINCT user_id) AS active_users
      |FROM (
      |  SELECT user_id, unnest(generate_series(day, least(day + 6, d1))) AS report_day
      |  FROM active CROSS JOIN b
      |)
      |GROUP BY report_day
      |ORDER BY report_day""".stripMargin

  /** §2.2 #21bi — recency-decayed engagement score per user: each
    * event contributes its integer value halved once per week of age,
    * Σ ⌊v / 2^weeks⌋ — the exponential-decay scoring every ranking /
    * churn model starts from, made order-free and bit-exact by using
    * a power-of-two decay as an integer shift instead of a float
    * exp(). The age anchor is the corpus max day (broadcast 1-row
    * aggregate); contributions older than 40 weeks clamp to shift 40
    * (⌊v⌋ < 2⁴⁰ cents ⇒ zero) so the shift never overflows.
    *
    * Scale: anchor agg + one map-side projection + one user-keyed
    * agg; nothing wider than the final groupBy.
    */
  def qDecay(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value")).cast(LongType).as("v"))
    val anchor = ev.agg(max(col("day")).as("d1"))
    ev.crossJoin(broadcast(anchor))
      .select(col("user_id"),
        expr("v div shiftleft(1L, cast(least((d1 - day) div 7, 40L) as int))").as("contrib"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("contrib")).as("decay_score"))
      .orderBy("user_id")
  }

  val qDecaySql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
      |    CAST(floor(value) AS BIGINT) AS v
      |  FROM events
      |), a AS (SELECT max(day) AS d1 FROM ev)
      |SELECT user_id, count(*) AS n_events,
      |  CAST(sum(v // (1::BIGINT << least((d1 - day) // 7, 40))) AS BIGINT) AS decay_score
      |FROM ev CROSS JOIN a
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** §2.2 #21bj — Benford first-digit audit over order totals: the
    * classic fabricated-numbers screen. The leading digit is taken
    * from the exact-cents integer's decimal string (no log10 float
    * path), counted per digit with the observed share in ppm and the
    * Benford expectation log10(1+1/d) pre-quantized to ppm as integer
    * literals — so the whole report is integer-exact cross-engine.
    * One map-side projection + a 9-row aggregation.
    */
  def qBenford(spark: SparkSession, dir: String): DataFrame = {
    val expected = Map(1 -> 301029L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L,
      5 -> 79181L, 6 -> 66946L, 7 -> 57991L, 8 -> 51152L, 9 -> 45757L)
    val expectedCol = expected.foldLeft(lit(0L)) { case (acc, (d, ppm)) =>
      when(col("digit") === d, ppm).otherwise(acc)
    }
    val o = table(spark, dir, "orders")
      .select((decP(col("o_totalprice")) * 100).cast(LongType).as("cents"))
      .select(substring(col("cents").cast(StringType), 1, 1).cast(LongType).as("digit"))
    val n = o.agg(count(lit(1)).as("n_total"))
    o.crossJoin(broadcast(n))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n_orders"), max(col("n_total")).as("n_total"))
      .select(col("digit"), col("n_orders"),
        expr("n_orders * 1000000L div n_total").as("share_ppm"),
        expectedCol.as("benford_ppm"))
      .orderBy("digit")
  }

  val qBenfordSql: String = {
    val cases = Seq(1 -> 301029L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L,
      5 -> 79181L, 6 -> 66946L, 7 -> 57991L, 8 -> 51152L, 9 -> 45757L)
      .map { case (d, p) => s"WHEN digit = $d THEN $p" }.mkString(" ")
    s"""WITH c AS (
      |  SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
      |  FROM orders
      |), n AS (SELECT count(*) AS n_total FROM c)
      |SELECT digit, count(*) AS n_orders,
      |  CAST(count(*) * 1000000 // max(n_total) AS BIGINT) AS share_ppm,
      |  CAST(CASE $cases ELSE 0 END AS BIGINT) AS benford_ppm
      |FROM c CROSS JOIN n
      |GROUP BY digit
      |ORDER BY digit""".stripMargin
  }

  /** §2.2 #21bt — 2-D skyline (Pareto frontier): the parts no other
    * part beats on BOTH axes — smaller-or-equal size AND
    * greater-or-equal price, strictly better on one. The naive
    * formulation is a quadratic dominance anti-join (a BNLJ the plan
    * audit bans); the scalable plan exploits that within one size only
    * the max price can survive: a map-side-combined groupBy(size)
    * collapses the table to ≤|distinct sizes| rows, and the frontier
    * is then a running-max window over that metadata-sized remainder.
    * The single-partition window is bounded by the size domain (tens
    * of rows at any SF), never by the table.
    */
  def qSkyline(spark: SparkSession, dir: String): DataFrame = {
    val best = table(spark, dir, "part")
      .select(col("p_size"), (decP(col("p_retailprice")) * 100).cast(LongType).as("cents"))
      .groupBy(col("p_size"))
      .agg(max(col("cents")).as("best_cents"), count(lit(1)).as("n_parts"))
    val w = Window.orderBy(col("p_size")).rowsBetween(Window.unboundedPreceding, -1)
    best
      .withColumn("prev_best", max(col("best_cents")).over(w))
      .filter(col("prev_best").isNull || col("best_cents") > col("prev_best"))
      .select(col("p_size"), col("best_cents"), col("n_parts"))
      .orderBy("p_size")
  }

  val qSkylineSql: String =
    """WITH best AS (
      |  SELECT p_size,
      |    max(CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS best_cents,
      |    count(*) AS n_parts
      |  FROM part GROUP BY p_size
      |), f AS (
      |  SELECT p_size, best_cents, n_parts,
      |    max(best_cents) OVER (ORDER BY p_size ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_best
      |  FROM best
      |)
      |SELECT p_size, best_cents, n_parts
      |FROM f WHERE prev_best IS NULL OR best_cents > prev_best
      |ORDER BY p_size""".stripMargin

  /** §2.2 #21bu — winsorization (percentile clamping): per return
    * flag, the exact rank-selected p05/p95 of extendedprice-cents
    * (the q_median selection idiom — position ceil(p·n) of the
    * per-group sort, tie-order-invariant and float-free), then the
    * table re-aggregated with values clamped into [p05, p95]. This is
    * the outlier-clipping step a feature pipeline runs before
    * training; exact selection instead of approx_percentile keeps it
    * oracle-checkable.
    *
    * Scale shape: one shuffle on the group key for the ranking window,
    * whose per-group sort is the window operator's own; the threshold
    * table is group-cardinality rows and joins back as a broadcast;
    * the clamped re-aggregate is a map-side-combined groupBy.
    */
  def qWinsorize(spark: SparkSession, dir: String): DataFrame = {
    val cents = table(spark, dir, "lineitem")
      .select(col("l_returnflag"), (decP(col("l_extendedprice")) * 100).cast(LongType).as("cents"))
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("cents"))
    val wc = Window.partitionBy(col("l_returnflag"))
    val thresholds = cents
      .select(col("l_returnflag"), col("cents"),
        row_number().over(w).as("rn"), count(lit(1)).over(wc).as("n"))
      .groupBy(col("l_returnflag"))
      .agg(
        max(col("n")).as("n"),
        max(when(col("rn") === expr("(n + 19) div 20"), col("cents"))).as("lo_cents"),
        max(when(col("rn") === expr("(19 * n + 19) div 20"), col("cents"))).as("hi_cents"),
      )
    cents.join(broadcast(thresholds), Seq("l_returnflag"))
      .groupBy(col("l_returnflag"))
      .agg(
        max(col("n")).as("n"),
        max(col("lo_cents")).as("lo_cents"),
        max(col("hi_cents")).as("hi_cents"),
        sum(greatest(col("lo_cents"), least(col("hi_cents"), col("cents")))).as("sum_clamped_cents"),
        sum(when(col("cents") < col("lo_cents"), 1L).otherwise(0L)).as("n_clipped_low"),
        sum(when(col("cents") > col("hi_cents"), 1L).otherwise(0L)).as("n_clipped_high"),
      )
      .orderBy("l_returnflag")
  }

  val qWinsorizeSql: String =
    """WITH cents AS (
      |  SELECT l_returnflag, CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM lineitem
      |), ranked AS (
      |  SELECT l_returnflag, cents,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY cents) AS rn,
      |    count(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM cents
      |), th AS (
      |  SELECT l_returnflag, max(n) AS n,
      |    max(CASE WHEN rn = (n + 19) // 20 THEN cents END) AS lo_cents,
      |    max(CASE WHEN rn = (19 * n + 19) // 20 THEN cents END) AS hi_cents
      |  FROM ranked GROUP BY l_returnflag
      |)
      |SELECT c.l_returnflag, max(n) AS n, max(lo_cents) AS lo_cents, max(hi_cents) AS hi_cents,
      |  CAST(sum(greatest(lo_cents, least(hi_cents, cents))) AS BIGINT) AS sum_clamped_cents,
      |  CAST(sum(CASE WHEN cents < lo_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
      |  CAST(sum(CASE WHEN cents > hi_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high
      |FROM cents c JOIN th ON c.l_returnflag = th.l_returnflag
      |GROUP BY c.l_returnflag
      |ORDER BY c.l_returnflag""".stripMargin

  /** §2.2 #21bv — activity streaks (gaps-and-islands): per user, runs
    * of consecutive active days found by the classic island key
    * `day − dense_rank(day)` — constant within a run of consecutive
    * days, distinct across gaps — then rolled up to per-user streak
    * stats (active days, islands, longest run; max-struct tie-break
    * picks the EARLIEST start among equal-length runs). The
    * engagement-streak / consecutive-failure-run shape every activity
    * pipeline reports.
    *
    * Scale shape: one shuffle to the (user, day) grain with map-side
    * combine, then user-partitioned windows and a user-grain rollup —
    * partition-parallel throughout, no global sort before the final
    * display ORDER BY; all int64 epoch-day arithmetic.
    */
  def qStreaks(spark: SparkSession, dir: String): DataFrame = {
    val days = table(spark, dir, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    days
      .withColumn("island", col("day") - dense_rank().over(w))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"))
      .groupBy(col("user_id"))
      .agg(
        sum(col("len")).as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max(struct(col("len"), (-col("start_day")).as("neg_start"))).as("m"),
      )
      .select(col("user_id"), col("n_active_days"), col("n_streaks"),
        col("m.len").as("max_streak_days"), (-col("m.neg_start")).as("max_streak_start"))
      .orderBy("user_id")
  }

  val qStreaksSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
      |), isl AS (
      |  SELECT user_id, day,
      |    day - dense_rank() OVER (PARTITION BY user_id ORDER BY day) AS island
      |  FROM days
      |), runs AS (
      |  SELECT user_id, island, count(*) AS len, min(day) AS start_day
      |  FROM isl GROUP BY user_id, island
      |), agg AS (
      |  SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days, count(*) AS n_streaks
      |  FROM runs GROUP BY user_id
      |), best AS (
      |  SELECT user_id, len AS max_streak_days, start_day AS max_streak_start
      |  FROM (
      |    SELECT user_id, len, start_day,
      |      row_number() OVER (PARTITION BY user_id ORDER BY len DESC, start_day) AS rk
      |    FROM runs
      |  ) WHERE rk = 1
      |)
      |SELECT a.user_id, n_active_days, n_streaks, max_streak_days, max_streak_start
      |FROM agg a JOIN best b ON a.user_id = b.user_id
      |ORDER BY a.user_id""".stripMargin

  /** §2.2 #21bw — growth accounting: every active (user, day) classified
    * against the user's previous active day — `new` (first ever),
    * `retained` (active yesterday), `resurrected` (returned after a
    * gap) — plus `churned` charged to the day AFTER an active day with
    * no successor (clipped at the corpus max day, where churn is not
    * yet observable). Per-day totals of the four classes are the
    * standard DAU growth-accounting identity: DAU(d) = new + retained
    * + resurrected, and retained(d) = DAU(d−1) − churned(d).
    *
    * Scale shape: one map-side-combined shuffle to the (user, day)
    * grain, per-user lag/lead windows (partition-parallel), a 1-row
    * broadcast max-day anchor (the q_decay shape), and a day-grain
    * conditional rollup.
    */
  def qGrowth(spark: SparkSession, dir: String): DataFrame = {
    val act = table(spark, dir, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val c = act
      .withColumn("prev", lag(col("day"), 1).over(w))
      .withColumn("next", lead(col("day"), 1).over(w))
      .localCheckpoint() // feeds both the class and churn branches
    val classified = c.select(col("day"),
      when(col("prev").isNull, "new")
        .when(col("prev") === col("day") - 1, "retained")
        .otherwise("resurrected").as("status"))
    val maxDay = c.agg(max(col("day")).as("d_max"))
    val churned = c.crossJoin(broadcast(maxDay))
      .filter(col("day") < col("d_max") &&
        (col("next").isNull || col("next") > col("day") + 1))
      .select((col("day") + 1).as("day"), lit("churned").as("status"))
    classified.unionAll(churned)
      .groupBy(col("day"))
      .agg(
        sum(when(col("status") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("status") === "retained", 1L).otherwise(0L)).as("n_retained"),
        sum(when(col("status") === "resurrected", 1L).otherwise(0L)).as("n_resurrected"),
        sum(when(col("status") === "churned", 1L).otherwise(0L)).as("n_churned"),
      )
      .orderBy("day")
  }

  val qGrowthSql: String =
    """WITH act AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events
      |), c AS (
      |  SELECT user_id, day,
      |    lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev,
      |    lead(day) OVER (PARTITION BY user_id ORDER BY day) AS next
      |  FROM act
      |), classified AS (
      |  SELECT day,
      |    CASE WHEN prev IS NULL THEN 'new'
      |         WHEN prev = day - 1 THEN 'retained'
      |         ELSE 'resurrected' END AS status
      |  FROM c
      |  UNION ALL
      |  SELECT day + 1 AS day, 'churned' AS status
      |  FROM c CROSS JOIN (SELECT max(day) AS d_max FROM act) m
      |  WHERE day < d_max AND (next IS NULL OR next > day + 1)
      |)
      |SELECT day,
      |  CAST(sum(CASE WHEN status = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |  CAST(sum(CASE WHEN status = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
      |  CAST(sum(CASE WHEN status = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
      |  CAST(sum(CASE WHEN status = 'churned' THEN 1 ELSE 0 END) AS BIGINT) AS n_churned
      |FROM classified
      |GROUP BY day
      |ORDER BY day""".stripMargin

  /** §2.2 #21bx — association rules over co-purchase pairs: the
    * market-basket statistics layer on top of `q_copurchase`'s raw
    * pair counts — support, both-direction confidence, and lift, each
    * as exact ppm integers (counts multiplied and floor-divided ONCE;
    * lift's numerator n_both·N·10^6 runs in DECIMAL(38,0) ≡ HUGEINT
    * because it overflows int64 at billion-basket scale). Pairs below
    * min-support 3 are pruned BEFORE the stats join — the Apriori
    * observation that makes the pair space tractable at scale.
    *
    * Scale shape: the basket self-join is the dominant term (the
    * q_copurchase plan), pruned by support before joining the two
    * item-count sides (item-stats tables are |parts|-sized —
    * broadcastable at any realistic catalog) and the 1-row basket
    * total; final output is a bounded top-100 by lift.
    */
  def qBasketLift(spark: SparkSession, dir: String): DataFrame = {
    val l = table(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val nBaskets = l.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val item = l.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_item"))
    val a = l.select(col("l_orderkey"), col("l_partkey").as("p1"))
    val b = l.select(col("l_orderkey").as("b_orderkey"), col("l_partkey").as("p2"))
    a.join(b, col("l_orderkey") === col("b_orderkey") && col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= 3)
      .join(broadcast(item.select(col("l_partkey").as("p1"), col("n_item").as("n_p1"))), Seq("p1"))
      .join(broadcast(item.select(col("l_partkey").as("p2"), col("n_item").as("n_p2"))), Seq("p2"))
      .crossJoin(broadcast(nBaskets))
      .select(
        col("p1"), col("p2"), col("n_both"), col("n_p1"), col("n_p2"),
        expr("n_both * 1000000L div n_p1").as("conf_p1_p2_ppm"),
        expr("n_both * 1000000L div n_p2").as("conf_p2_p1_ppm"),
        expr("CAST(CAST(n_both AS DECIMAL(38,0)) * n_baskets * 1000000 div (CAST(n_p1 AS DECIMAL(38,0)) * n_p2) AS BIGINT)")
          .as("lift_ppm"),
      )
      .orderBy(col("lift_ppm").desc, col("p1"), col("p2"))
      .limit(100)
  }

  val qBasketLiftSql: String =
    """WITH l AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |n AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM l),
      |item AS (SELECT l_partkey, count(*) AS n_item FROM l GROUP BY l_partkey),
      |pairs AS (
      |  SELECT a.l_partkey AS p1, b.l_partkey AS p2, count(*) AS n_both
      |  FROM l a JOIN l b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2
      |  HAVING count(*) >= 3
      |)
      |SELECT p1, p2, n_both,
      |  i1.n_item AS n_p1, i2.n_item AS n_p2,
      |  CAST(n_both * 1000000 // i1.n_item AS BIGINT) AS conf_p1_p2_ppm,
      |  CAST(n_both * 1000000 // i2.n_item AS BIGINT) AS conf_p2_p1_ppm,
      |  CAST(CAST(n_both AS HUGEINT) * n_baskets * 1000000 // (CAST(i1.n_item AS HUGEINT) * i2.n_item) AS BIGINT) AS lift_ppm
      |FROM pairs
      |JOIN item i1 ON i1.l_partkey = p1
      |JOIN item i2 ON i2.l_partkey = p2
      |CROSS JOIN n
      |ORDER BY lift_ppm DESC, p1, p2
      |LIMIT 100""".stripMargin

  /** §2.2 #21dd — mergeable-sketch distinct rollup (Datasketches HLL):
    * per-(type, day) HLL sketches of the user set, UNIONED up to
    * per-(type, week) distinct estimates and compared against the
    * exact count. This is the pattern that makes distinct-counting
    * tractable at 100 TB: daily sketch partials are kilobytes, the
    * weekly rollup unions sketches instead of re-scanning the raw
    * events (a re-aggregation any calendar hierarchy gets for free),
    * and the shuffle carries sketch bytes, not user ids. Engine-
    * specific estimates → rows-only; ScalaTest pins the relative
    * error bound and that union-of-daily ≡ direct weekly sketching.
    */
  def qHllRollup(spark: SparkSession, dir: String): DataFrame = {
    val e = table(spark, dir, "events")
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"), col("user_id"))
    val weekly = e.groupBy(col("event_type"), col("day"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .withColumn("week", expr("day div 7"))
      .groupBy(col("event_type"), col("week"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))").as("est_users"))
    val exact = e.withColumn("week", expr("day div 7"))
      .select(col("event_type"), col("week"), col("user_id")).distinct()
      .groupBy(col("event_type"), col("week")).agg(count(lit(1)).as("exact_users"))
    weekly.join(exact, Seq("event_type", "week"))
      .orderBy("event_type", "week")
  }

  /** §2.2 #21de — mergeable-sketch quantile rollup (Datasketches KLL,
    * the quantile twin of `q_hll_rollup`): per-(type, day) KLL
    * sketches of the integer event values, MERGED up to per-(type,
    * week) p50/p95 estimates next to the exact rank-selected
    * quantiles (the q_median position idiom). Same scale story:
    * kilobyte sketch partials re-aggregate up the calendar hierarchy
    * without re-sorting raw events — exact grouped quantiles need a
    * per-group sort of the week's data, the sketch rollup only unions
    * daily partials. Engine-specific estimates → rows-only; ScalaTest
    * pins the KLL rank-error bound against the exact distribution.
    */
  def qKllRollup(spark: SparkSession, dir: String): DataFrame = {
    val e = table(spark, dir, "events")
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value")).cast(LongType).as("v"))
    val est = e.groupBy(col("event_type"), col("day"))
      .agg(expr("kll_sketch_agg_bigint(v, 200)").as("sk"))
      .withColumn("week", expr("day div 7"))
      .groupBy(col("event_type"), col("week"))
      .agg(expr("kll_merge_agg_bigint(sk)").as("msk"))
      .select(col("event_type"), col("week"),
        expr("kll_sketch_get_n_bigint(msk)").as("n"),
        expr("kll_sketch_get_quantile_bigint(msk, 0.5d)").as("p50_est"),
        expr("kll_sketch_get_quantile_bigint(msk, 0.95d)").as("p95_est"))
    val w = Window.partitionBy(col("event_type"), col("week")).orderBy(col("v"))
    val wc = Window.partitionBy(col("event_type"), col("week"))
    val exact = e.withColumn("week", expr("day div 7"))
      .select(col("event_type"), col("week"), col("v"),
        row_number().over(w).as("rn"), count(lit(1)).over(wc).as("cnt"))
      .groupBy(col("event_type"), col("week"))
      .agg(
        max(when(col("rn") === expr("(cnt + 1) div 2"), col("v"))).as("p50_exact"),
        max(when(col("rn") === expr("(19 * cnt + 19) div 20"), col("v"))).as("p95_exact"),
      )
    est.join(exact, Seq("event_type", "week"))
      .orderBy("event_type", "week")
  }

  /** §2.2 #21df — mergeable-sketch SET ALGEBRA (Datasketches Theta,
    * via Spark 4's native theta_* expressions): per-type audience
    * sketches of the user set, built from per-(type, day) partials
    * and UNIONED up (the q_hll_rollup merge path), then pairwise
    * INTERSECTED — the operation HLL fundamentally cannot do, and the
    * reason theta sketches exist: "how many users do checkout and
    * search share" across arbitrarily large audiences with kilobyte
    * partials, no re-scan of raw events, re-aggregable up any
    * hierarchy. Estimates for |A∩B|, |A∪B|, |A\B| sit next to their
    * exact counterparts (one keyed self-join on user_id — the exact
    * path shuffles ids; the sketch path shuffles kilobytes, which is
    * the 100 TB story).
    *
    * The pairwise join is |event_types|² (≤ 25 rows each side) — a
    * bounded broadcast by construction, whitelisted in the plan audit
    * like the other metadata-sized anchors. Engine-specific estimates
    * → rows-only; ScalaTest pins exact-mode equality (below 2^12
    * uniques a theta sketch is a hash sample of EVERYTHING, so
    * estimate ≡ exact) plus the set-algebra invariants.
    */
  def qThetaSets(spark: SparkSession, dir: String): DataFrame = {
    val e = table(spark, dir, "events")
      .select(col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"), col("user_id"))
    val sk = e.groupBy(col("event_type"), col("day"))
      .agg(expr("theta_sketch_agg(user_id, 12)").as("sk"))
      .groupBy(col("event_type"))
      .agg(expr("theta_union_agg(sk, 12)").as("sk"))
    val users = e.select(col("event_type"), col("user_id")).distinct()
    val exactInter = users.select(col("event_type").as("type_a"), col("user_id"))
      .join(users.select(col("event_type").as("type_b"), col("user_id")), Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("exact_inter"))
    val exactN = users.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val est = sk.select(col("event_type").as("type_a"), col("sk").as("ska"))
      .join(sk.select(col("event_type").as("type_b"), col("sk").as("skb")),
        col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
        expr("cast(floor(theta_sketch_estimate(theta_intersection(ska, skb)) + 0.5) as bigint)").as("est_inter"),
        expr("cast(floor(theta_sketch_estimate(theta_union(ska, skb)) + 0.5) as bigint)").as("est_union"),
        expr("cast(floor(theta_sketch_estimate(theta_difference(ska, skb)) + 0.5) as bigint)").as("est_only_a"))
    est
      .join(exactInter, Seq("type_a", "type_b"), "left")
      .join(broadcast(exactN.select(col("event_type").as("type_a"), col("n").as("n_a"))), Seq("type_a"))
      .join(broadcast(exactN.select(col("event_type").as("type_b"), col("n").as("n_b"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"),
        col("est_inter"), coalesce(col("exact_inter"), lit(0L)).as("exact_inter"),
        col("est_union"),
        (col("n_a") + col("n_b") - coalesce(col("exact_inter"), lit(0L))).as("exact_union"),
        col("est_only_a"),
        (col("n_a") - coalesce(col("exact_inter"), lit(0L))).as("exact_only_a"))
      .orderBy("type_a", "type_b")
  }

  /** §2.2 #21by — STL-lite seasonal decomposition of the daily volume
    * per event type: count = trend + weekday season + residual, all on
    * a ×7 integer grid. Trend is the centered 7-day RANGE-frame sum
    * (value-based, gap-safe; only full windows emit), detrend is
    * 7·count − trend, the weekday effect is the per-(type, dow)
    * floor-mean of the detrended series, residual the remainder. The
    * anomaly screen that separates "Mondays are always low" from "this
    * Monday is broken".
    *
    * Cross-engine subtlety: the detrended series is SIGNED, and Spark's
    * `div` truncates toward zero while DuckDB's `//` floors — they
    * disagree on negatives. The weekday mean therefore divides the
    * offset-shifted sum (sum + OFFSET·n, provably non-negative), where
    * truncation ≡ floor, and subtracts OFFSET back — bit-identical in
    * both engines with zero float traffic.
    *
    * Scale shape: one map-side-combined shuffle to the (type, day)
    * grain; type-partitioned RANGE windows over the tiny daily rollup;
    * a dow-grain effect agg joined back by (type, dow). Everything
    * after the first shuffle is calendar-sized.
    */
  def qStlLite(spark: SparkSession, dir: String): DataFrame = {
    val Offset = 1000000000L
    val daily = table(spark, dir, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rangeBetween(-3, 3)
    val detr = daily
      .withColumn("trend_x7", sum(col("c")).over(w))
      .withColumn("n7", count(lit(1)).over(w))
      .filter(col("n7") === 7)
      .withColumn("detr_x7", col("c") * 7 - col("trend_x7"))
      .withColumn("dow", pmod(col("day"), lit(7)))
    val eff = detr.groupBy(col("event_type"), col("dow"))
      .agg(sum(col("detr_x7")).as("s"), count(lit(1)).as("n"))
      .select(col("event_type"), col("dow"),
        (expr(s"(s + ${Offset}L * n) div n") - Offset).as("season_x7"))
    detr.join(eff, Seq("event_type", "dow"))
      .select(col("event_type"), col("day"), col("c"), col("trend_x7"),
        col("season_x7"), (col("detr_x7") - col("season_x7")).as("resid_x7"))
      .orderBy("event_type", "day")
  }

  val qStlLiteSql: String =
    """WITH daily AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day, count(*) AS c
      |  FROM events GROUP BY 1, 2
      |), detr AS (
      |  SELECT event_type, day, c,
      |    sum(c) OVER (PARTITION BY event_type ORDER BY day RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS trend_x7,
      |    count(*) OVER (PARTITION BY event_type ORDER BY day RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS n7,
      |    c * 7 - sum(c) OVER (PARTITION BY event_type ORDER BY day RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS detr_x7,
      |    day % 7 AS dow
      |  FROM daily
      |), f AS (SELECT * FROM detr WHERE n7 = 7),
      |eff AS (
      |  SELECT event_type, dow,
      |    CAST((sum(detr_x7) + 1000000000 * count(*)) // count(*) - 1000000000 AS BIGINT) AS season_x7
      |  FROM f GROUP BY 1, 2
      |)
      |SELECT f.event_type, day, c, CAST(trend_x7 AS BIGINT) AS trend_x7,
      |  season_x7, CAST(detr_x7 - season_x7 AS BIGINT) AS resid_x7
      |FROM f JOIN eff ON f.event_type = eff.event_type AND f.dow = eff.dow
      |ORDER BY f.event_type, day""".stripMargin

  /** §2.2 #21bz — distribution-rank window navigation: the remaining
    * ANSI window functions in one report — percent_rank, cume_dist,
    * first_value / last_value / nth_value(2) over each customer's
    * order history in cents. percent_rank = (rank−1)/(n−1) and
    * cume_dist = peers/n are single IEEE divisions of exact integers —
    * deterministic cross-engine without quantization; the value
    * navigation uses the full-partition frame (last_value under the
    * default frame is the famous footgun this query pins correctly).
    * Ties on order date break by order key, making every output
    * column deterministic.
    *
    * Scale shape: one shuffle on the customer key; all windows share
    * the single (custkey, date, key) sort — Spark plans them in one
    * Window operator, partition-parallel.
    */
  def qDistRank(spark: SparkSession, dir: String): DataFrame = {
    val o = table(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        (decP(col("o_totalprice")) * 100).cast(LongType).as("cents"),
        col("o_orderdate"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    o.select(
        col("o_custkey"), col("o_orderkey"), col("cents"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        first(col("cents")).over(wf).as("first_cents"),
        last(col("cents")).over(wf).as("last_cents"),
        nth_value(col("cents"), 2).over(wf).as("second_cents"),
      )
      .orderBy("o_custkey", "o_orderkey")
  }

  val qDistRankSql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd,
      |  first_value(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) OVER wf AS first_cents,
      |  last_value(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) OVER wf AS last_cents,
      |  nth_value(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT), 2) OVER wf AS second_cents
      |FROM orders
      |WINDOW
      |  w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** §2.2 #21ca — robust outlier screen (median/MAD): per event type,
    * the exact rank-selected median of the integer values, the median
    * absolute deviation around it (a second rank selection over
    * |v − med|), and the count beyond the 3·MAD fence — the
    * heavy-tail-safe sibling of the mean/σ screen in `q_anomaly`,
    * which a single extreme value can drag wide open (σ is quadratic
    * in outliers; MAD has a 50% breakdown point). Everything is int64
    * rank selection — no float moments at all.
    *
    * Scale shape: two window passes over the fact (both partitioned by
    * type, each the window operator's own per-group sort) with the
    * type-cardinality median table broadcast back between them; the
    * fence count is a map-side-combined conditional agg.
    */
  def qMadOutliers(spark: SparkSession, dir: String): DataFrame = {
    val e = table(spark, dir, "events")
      .select(col("event_type"), floor(col("value")).cast(LongType).as("v"))
    def medianOf(df: DataFrame, valueCol: String, out: String): DataFrame = {
      val w = Window.partitionBy(col("event_type")).orderBy(col(valueCol))
      val wc = Window.partitionBy(col("event_type"))
      df.select(col("event_type"), col(valueCol),
          row_number().over(w).as("rn"), count(lit(1)).over(wc).as("n"))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n"),
          max(when(col("rn") === expr("(n + 1) div 2"), col(valueCol))).as(out))
    }
    val med = medianOf(e, "v", "med").select(col("event_type"), col("med"))
    val dev = e.join(broadcast(med), Seq("event_type"))
      .select(col("event_type"), col("v"), col("med"), abs(col("v") - col("med")).as("d"))
    val mad = medianOf(dev, "d", "mad").select(col("event_type"), col("mad"))
    dev.join(broadcast(mad), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("d") > col("mad") * 3, 1L).otherwise(0L)).as("n_outliers"),
        max(col("d")).as("max_dev"),
      )
      .orderBy("event_type")
  }

  val qMadOutliersSql: String =
    """WITH e AS (
      |  SELECT event_type, CAST(floor(value) AS BIGINT) AS v FROM events
      |), r1 AS (
      |  SELECT event_type, v,
      |    row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM e
      |), med AS (
      |  SELECT event_type, max(CASE WHEN rn = (n + 1) // 2 THEN v END) AS med
      |  FROM r1 GROUP BY event_type
      |), dev AS (
      |  SELECT e.event_type, v, med, abs(v - med) AS d
      |  FROM e JOIN med ON e.event_type = med.event_type
      |), r2 AS (
      |  SELECT event_type, d,
      |    row_number() OVER (PARTITION BY event_type ORDER BY d) AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM dev
      |), mad AS (
      |  SELECT event_type, max(CASE WHEN rn = (n + 1) // 2 THEN d END) AS mad
      |  FROM r2 GROUP BY event_type
      |)
      |SELECT dev.event_type, count(*) AS n, max(med) AS med, max(mad) AS mad,
      |  CAST(sum(CASE WHEN d > mad * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  max(d) AS max_dev
      |FROM dev JOIN mad ON dev.event_type = mad.event_type
      |GROUP BY dev.event_type
      |ORDER BY dev.event_type""".stripMargin

  /** §2.2 #21cb — floored running balance (secondary sort): per user,
    * credits (`signup`/`click`/`view` add ⌊value⌋) and debits
    * (`purchase`/`error` subtract) folded in event-time order with the
    * balance clamped at zero — the inventory-depletion / prepaid-credit
    * recursion `S ← max(0, S + δ)` that NO window function expresses
    * (the clamp makes each step depend on the previous result;
    * recursive SQL or a fold is the only formulation, hence rows-only
    * with a ScalaTest replay).
    *
    * Scale shape: the classic secondary-sort pattern —
    * `repartition(user)` + `sortWithinPartitions(user, ts, id)` +
    * one `mapPartitions` fold. Each partition streams in constant
    * memory (no per-user collect, no window buffer); a user's events
    * are contiguous inside exactly one partition, so the fold never
    * crosses boundaries. This is how per-key ordered folds survive
    * 100 TB when `flatMapGroups` (which materializes each group's
    * iterator from a shuffle) and windows (which buffer frames) are
    * the wrong tool.
    */
  def qRunsumFloor(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = table(spark, dir, "events")
      .select(col("user_id"), expr("unix_micros(ts)").as("us"), col("event_id"),
        when(col("event_type").isin("signup", "click", "view"),
          floor(col("value")).cast(LongType))
          .otherwise(-floor(col("value")).cast(LongType)).as("delta"))
    val folded = e
      .repartition(col("user_id"))
      .sortWithinPartitions(col("user_id"), col("us"), col("event_id"))
      .as[(Long, Long, Long, Long)]
      .mapPartitions { it =>
        new Iterator[(Long, Long, Long, Long)] {
          private val in = it.buffered
          def hasNext: Boolean = in.hasNext
          def next(): (Long, Long, Long, Long) = {
            val user = in.head._1
            var bal = 0L; var hits = 0L; var n = 0L
            while (in.hasNext && in.head._1 == user) {
              val (_, _, _, d) = in.next()
              n += 1
              val s = bal + d
              if (s < 0) { bal = 0L; hits += 1 } else bal = s
            }
            (user, n, bal, hits)
          }
        }
      }
    folded.toDF("user_id", "n_events", "final_balance", "n_floor_hits")
      .orderBy("user_id")
  }

  /** §2.2 #21cc — erasure audit (right-to-be-forgotten): a
    * deterministic erase cohort (every 13th user) anti-joined out of
    * each table that references it, with the per-table proof row a
    * compliance reviewer needs — rows erased, rows remaining for the
    * cohort (MUST be 0 after the anti-join; emitting the check beats
    * asserting it silently), and surviving-table totals. The same
    * shape removes any keyed cohort: opt-outs, test accounts,
    * contaminated sources.
    *
    * Scale shape: the cohort is a key list orders of magnitude smaller
    * than the facts — broadcast anti-joins, no fact-side shuffle; the
    * per-table audit rows are one map-side-combined agg each. At
    * 100 TB the rewrite itself is a partition-overwrite job this
    * audit's plan gates.
    */
  def qErasureAudit(spark: SparkSession, dir: String): DataFrame = {
    val cohort = table(spark, dir, "customer")
      .filter(col("c_custkey") % 13 === 0).select(col("c_custkey").as("k"))
    def audit(name: String, df: DataFrame, key: String): DataFrame = {
      val total = df.count()
      val kept = df.join(broadcast(cohort), df(key) === col("k"), "left_anti")
      val keptN = kept.count()
      val leak = kept.join(broadcast(cohort), kept(key) === col("k"), "left_semi").count()
      import spark.implicits._
      Seq((name, total, total - keptN, keptN, leak))
        .toDF("table_name", "n_before", "n_erased", "n_after", "n_cohort_remaining")
    }
    audit("orders", table(spark, dir, "orders"), "o_custkey")
      .unionAll(audit("customer", table(spark, dir, "customer"), "c_custkey"))
      .unionAll(audit("events",
        // events keys by user_id on the same id domain
        table(spark, dir, "events"), "user_id"))
      .orderBy("table_name")
  }

  val qErasureAuditSql: String =
    """WITH cohort AS (SELECT c_custkey AS k FROM customer WHERE c_custkey % 13 = 0),
      |a AS (
      |  SELECT 'orders' AS table_name, count(*) AS n_before,
      |    count(*) FILTER (WHERE o_custkey IN (SELECT k FROM cohort)) AS n_erased
      |  FROM orders
      |  UNION ALL
      |  SELECT 'customer', count(*),
      |    count(*) FILTER (WHERE c_custkey IN (SELECT k FROM cohort))
      |  FROM customer
      |  UNION ALL
      |  SELECT 'events', count(*),
      |    count(*) FILTER (WHERE user_id IN (SELECT k FROM cohort))
      |  FROM events
      |)
      |SELECT table_name, n_before, n_erased,
      |  n_before - n_erased AS n_after,
      |  CAST(0 AS BIGINT) AS n_cohort_remaining
      |FROM a
      |ORDER BY table_name""".stripMargin

  /** §2.2 #21cr — k-anonymity audit over quasi-identifiers: the
    * re-identification risk read a compliance pipeline runs BEFORE
    * releasing a training table. Records grouped by their
    * quasi-identifier tuple (nation, market segment, account-balance
    * band — the columns an adversary could link against an external
    * dataset) form equivalence classes; a record in a class of size
    * < k is re-identifiable. The report is the class-size profile —
    * classes and records per clamped size band 1..5+ with exact
    * record shares in ppm — so "what fraction of rows sit in
    * singleton classes" is one lookup.
    *
    * Scale shape: one map-side-combinable groupBy on the QI tuple
    * (class relation ≤ |QI domain|, metadata-sized by construction),
    * one ≤5-row rollup, one broadcast 1-ROW total cross join (the
    * q_zorder anchor shape). The balance band uses floor-then-integer
    * `div` so both engines bucket identically.
    */
  def qKanon(spark: SparkSession, dir: String): DataFrame = {
    val K = 5
    val classes = table(spark, dir, "customer")
      .select(
        col("c_nationkey"), col("c_mktsegment"),
        // +100000 keeps the dividend positive (acctbal can be
        // negative): Spark's `div` truncates toward zero while
        // DuckDB's `//` floors — they agree only on non-negatives
        expr("(CAST(floor(c_acctbal) AS BIGINT) + 100000) div 1000").as("bal_band"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_band"))
      .agg(count(lit(1)).as("n"))
    val total = classes.agg(sum(col("n")).as("n_total"))
    classes
      .select(least(col("n"), lit(K.toLong)).as("k_class"), col("n"))
      .groupBy(col("k_class"))
      .agg(count(lit(1)).as("n_classes"), sum(col("n")).as("n_records"))
      .crossJoin(broadcast(total))
      .select(
        col("k_class"), col("n_classes"), col("n_records"),
        expr("n_records * 1000000L div n_total").as("records_ppm"),
        (col("k_class") < K).as("at_risk"),
      )
      .orderBy("k_class")
  }

  val qKanonSql: String =
    """WITH classes AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    (CAST(floor(c_acctbal) AS BIGINT) + 100000) // 1000 AS bal_band,
      |    count(*) AS n
      |  FROM customer GROUP BY 1, 2, 3
      |), t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM classes)
      |SELECT least(n, 5) AS k_class,
      |  count(*) AS n_classes,
      |  CAST(sum(n) AS BIGINT) AS n_records,
      |  CAST(sum(n) * 1000000 // n_total AS BIGINT) AS records_ppm,
      |  least(n, 5) < 5 AS at_risk
      |FROM classes, t
      |GROUP BY least(n, 5), n_total
      |ORDER BY k_class""".stripMargin

  /** §2.2 #21ct — data-freshness / staleness audit: per event stream,
    * when did it last emit and how far behind the freshest stream is
    * it — the SLA read an ingestion pipeline alerts on (a stream that
    * quietly stops is invisible to row-count checks: its totals stay
    * plausible for days). Per event_type: last event micros, exact
    * lag behind the corpus max in µs and whole hours, row count, and
    * the stale flag at a 48 h threshold.
    *
    * Scale shape: one map-side-combinable max/count groupBy (the
    * per-type relation is metadata-sized), one broadcast 1-ROW
    * corpus-max cross (the q_zorder anchor shape). All integer µs.
    */
  def qFreshness(spark: SparkSession, dir: String): DataFrame = {
    val per = table(spark, dir, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .groupBy(col("event_type"))
      .agg(max(col("us")).as("last_us"), count(lit(1)).as("n_events"))
    val anchor = per.agg(max(col("last_us")).as("corpus_max_us"))
    per.crossJoin(broadcast(anchor))
      .select(
        col("event_type"), col("last_us"), col("n_events"),
        (col("corpus_max_us") - col("last_us")).as("lag_us"),
        expr("(corpus_max_us - last_us) div 3600000000L").as("lag_hours"),
        (col("corpus_max_us") - col("last_us") > lit(48L * 3600L * 1000000L)).as("stale"),
      )
      .orderBy("event_type")
  }

  val qFreshnessSql: String =
    """WITH per AS (
      |  SELECT event_type, max(epoch_us(ts)) AS last_us, count(*) AS n_events
      |  FROM events GROUP BY 1
      |), a AS (SELECT max(last_us) AS corpus_max_us FROM per)
      |SELECT event_type, last_us, n_events,
      |  corpus_max_us - last_us AS lag_us,
      |  (corpus_max_us - last_us) // 3600000000 AS lag_hours,
      |  corpus_max_us - last_us > CAST(48 AS BIGINT) * 3600 * 1000000 AS stale
      |FROM per, a
      |ORDER BY event_type""".stripMargin

  /** §2.2 #21cs — differentially-private noisy counts (the release
    * mechanism next to [[qKanon]]'s risk audit): per-(nation, segment)
    * customer counts published under the two-sided GEOMETRIC mechanism
    * (Ghosh-Roughgarden-Sundararajan '09) — the integer-exact discrete
    * sibling of Laplace noise. Noise is the DIFFERENCE of two
    * independent geometric(p = 1/2) draws X − Y, which is exactly the
    * two-sided geometric with ratio α = 1/2: P(noise = z) =
    * (1/3)·2^−|z|, so every adjacent-output ratio is
    * P(z)/P(z±1) = 2 and the mechanism is ε-DP for sensitivity-1
    * counts at ε = ln 2 (the sign-bit-times-magnitude shortcut has
    * P(0) = 1/2 and only satisfies ε = ln 4 — the GRS construction
    * needs P(0) = 1/3, which one draw plus a sign bit cannot hit).
    * X and Y are trailing-zero counts of two DISJOINT 28-bit fields of
    * md5(seed | group key) — pure integer arithmetic both Spark and
    * DuckDB share, so the released table hash-matches the oracle
    * bit-for-bit under the oracle's fixed test seed. DEPLOYMENT
    * CONTRACT: `seed` must be a secret, per-release value (the noise
    * is a pure function of seed + public group key; with a public seed
    * an adversary replays it exactly and ε is void). The test harness
    * pins seed = "dpseed1" only so DuckDB can reproduce the draw.
    * True counts are NOT emitted — only the noisy release, clamped at
    * 0, plus the mechanism params.
    *
    * Scale shape: one map-side-combinable groupBy; noise is a
    * per-group column expression over the released (metadata-sized)
    * relation. No fact-side cost beyond the count itself.
    */
  def qDpCounts(spark: SparkSession, dir: String): DataFrame =
    qDpCountsSeeded(spark, dir, "dpseed1")

  /** [[qDpCounts]] with the per-release secret seed as an argument —
    * the production entry point. The 2-arg form exists only to give
    * the oracle harness a fixed, replayable draw.
    */
  def qDpCountsSeeded(spark: SparkSession, dir: String, seed: String): DataFrame = {
    table(spark, dir, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_true"))
      // 15 hex digits < 2^60: a full 16-digit parse can overflow
      // int64; 60 bits cover the two disjoint 28-bit noise fields.
      // The seed enters ONLY here, as a Column literal (never
      // interpolated into an expr string).
      .withColumn("h",
        conv(substring(md5(concat_ws("|", lit(seed), col("c_nationkey"),
          col("c_mktsegment")).cast("binary")), 1, 15), 16, 10).cast("long"))
      // X, Y = trailing-zero counts of bits [0,28) and [28,56) of h,
      // each OR'd with 2^28 so the count caps at 28 (truncation mass
      // 2^-29 — immaterial). Geometric with P(k) = 2^-(k+1) each, and
      // independent because the fields are disjoint. Trailing zeros in
      // integer arithmetic both engines share: lowest set bit =
      // v & -v, then log2 = binary-string length - 1.
      .withColumn("x", expr(
        "CAST(length(bin(((h % 268435456L) | 268435456L) & -((h % 268435456L) | 268435456L))) - 1 AS BIGINT)"))
      .withColumn("y", expr(
        "CAST(length(bin((((h div 268435456L) % 268435456L) | 268435456L) & -(((h div 268435456L) % 268435456L) | 268435456L))) - 1 AS BIGINT)"))
      .withColumn("noise", col("x") - col("y"))
      .select(
        col("c_nationkey"), col("c_mktsegment"),
        greatest(col("n_true") + col("noise"), lit(0L)).as("n_noisy"),
        lit("two_sided_geometric").as("mechanism"),
        lit(693147L).as("epsilon_micronat"),
      )
      .orderBy("c_nationkey", "c_mktsegment")
  }

  val qDpCountsSql: String =
    """WITH g AS (
      |  SELECT c_nationkey, c_mktsegment, count(*) AS n_true,
      |    CAST(('0x' || substr(md5('dpseed1' || '|' || c_nationkey || '|' || c_mktsegment), 1, 15)) AS BIGINT) AS h
      |  FROM customer GROUP BY 1, 2
      |), n AS (
      |  SELECT c_nationkey, c_mktsegment, n_true,
      |    CAST(length(bin(((h % 268435456) | 268435456) & -((h % 268435456) | 268435456))) - 1 AS BIGINT)
      |      - CAST(length(bin((((h // 268435456) % 268435456) | 268435456) & -(((h // 268435456) % 268435456) | 268435456))) - 1 AS BIGINT) AS noise
      |  FROM g
      |)
      |SELECT c_nationkey, c_mktsegment,
      |  greatest(n_true + noise, 0) AS n_noisy,
      |  'two_sided_geometric' AS mechanism,
      |  CAST(693147 AS BIGINT) AS epsilon_micronat
      |FROM n
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin

  /** §2.2 #21cp — Gini concentration of customer spend per market
    * segment: the one-number inequality audit next to [[qPareto]]'s
    * cumulative-share tiers (a corpus pipeline runs the same statistic
    * over per-source token counts to quantify mixture concentration).
    *
    * Exact WITHOUT a per-row sort OR a per-segment single-task
    * window. Ranks come from the value histogram (segment, cents, c):
    * for a value block of size c starting after C predecessors the
    * rank sum Σi·x is cents·(c·C + c·(c+1)/2) in closed form. But
    * per-customer spend is near-UNIQUE, so unlike q_median's quantity
    * histogram this one is ~|customers| rows and a window partitioned
    * only by the 5-value segment would sort it in 5 giant tasks — the
    * q_median trick alone does NOT transfer. The cumulative count C
    * is therefore built with the two-level prefix sum that
    * sample_curriculum uses for exact global row_number: cents div
    * 2²⁰ is a RANGE-MONOTONE bucket (bounded by the value range, not
    * the row count), the per-(segment, bucket) totals take the only
    * segment-wide window — over metadata-sized bucket rows — and the
    * fact-sized window runs per (segment, bucket), so its task size
    * is one bucket's distinct values, never one segment's customers.
    * Gini_ppm = (2·Σi·x − (n+1)·Σx)·10⁶ / (n·Σx), all DECIMAL(38,0)
    * integer algebra until one integral divide — bit-identical
    * cross-engine. Zero-spend customers are included (LEFT join from
    * customer), which is what makes the statistic honest for sparse
    * segments.
    */
  def qGini(spark: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val spend = table(spark, dir, "orders")
      .select(col("o_custkey"), (decP(col("o_totalprice")) * 100).cast(LongType).as("cents"))
      .groupBy(col("o_custkey"))
      .agg(sum(col("cents")).as("cents"))
    val per = table(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
      .join(spend, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_mktsegment"), coalesce(col("cents"), lit(0L)).as("cents"))
    val hist = per.groupBy(col("c_mktsegment"), col("cents"))
      .agg(count(lit(1)).as("c"))
      .withColumn("bkt", expr("cents div 1048576"))
    val wb = Window.partitionBy(col("c_mktsegment")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val boff = hist.groupBy(col("c_mktsegment"), col("bkt"))
      .agg(sum(col("c")).as("bc"))
      .withColumn("boff", coalesce(sum(col("bc")).over(wb), lit(0L)))
      .drop("bc")
    val wv = Window.partitionBy(col("c_mktsegment"), col("bkt")).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .join(boff, Seq("c_mktsegment", "bkt"))
      .withColumn("cum", col("boff") + coalesce(sum(col("c")).over(wv), lit(0L)))
      // block rank-sum factor c·C + c(c+1)/2 stays in int64 (counts
      // are ≤ segment size, so the product is ≤ n² ≤ 2^63 far past
      // this workload); the cents multiply is where 38-digit headroom
      // is actually needed
      .withColumn("rfac", expr("c * cum + (c * (c + 1)) div 2"))
      .groupBy(col("c_mktsegment"))
      .agg(
        sum(col("c")).as("n_customers"),
        sum(col("c").cast(d38) * col("cents").cast(d38)).as("sx"),
        sum(col("cents").cast(d38) * col("rfac").cast(d38)).as("srx"),
      )
      .select(
        col("c_mktsegment"), col("n_customers"),
        col("sx").cast(LongType).as("total_cents"),
        // sx = 0 (a segment where no customer ever spent) must emit 0,
        // not engine-divergent div-by-zero (Spark NULL vs DuckDB error)
        expr("CASE WHEN sx = 0 THEN 0L ELSE (CAST(2 AS DECIMAL(38,0)) * srx - CAST(n_customers + 1 AS DECIMAL(38,0)) * sx) * CAST(1000000 AS DECIMAL(38,0)) div (CAST(n_customers AS DECIMAL(38,0)) * sx) END")
          .as("gini_ppm"),
      )
      .orderBy("c_mktsegment")
  }

  val qGiniSql: String =
    """WITH spend AS (
      |  SELECT o_custkey, sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS cents
      |  FROM orders GROUP BY o_custkey
      |), per AS (
      |  SELECT c_mktsegment, coalesce(s.cents, 0) AS cents
      |  FROM customer c LEFT JOIN spend s ON c.c_custkey = s.o_custkey
      |), hist AS (
      |  SELECT c_mktsegment, cents, count(*) AS c, cents // 1048576 AS bkt
      |  FROM per GROUP BY 1, 2
      |), boff AS (
      |  SELECT c_mktsegment, bkt,
      |    coalesce(sum(bc) OVER (PARTITION BY c_mktsegment ORDER BY bkt
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS boff
      |  FROM (SELECT c_mktsegment, bkt, sum(c) AS bc FROM hist GROUP BY 1, 2)
      |), cum AS (
      |  SELECT h.c_mktsegment, h.cents, h.c,
      |    b.boff + coalesce(sum(h.c) OVER (PARTITION BY h.c_mktsegment, h.bkt
      |      ORDER BY h.cents ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      |  FROM hist h JOIN boff b ON h.c_mktsegment = b.c_mktsegment AND h.bkt = b.bkt
      |), m AS (
      |  SELECT c_mktsegment, sum(c) AS n_customers,
      |    sum(CAST(c AS HUGEINT) * cents) AS sx,
      |    sum(CAST(cents AS HUGEINT) * (c * cum + (c * (c + 1)) // 2)) AS srx
      |  FROM cum GROUP BY c_mktsegment
      |)
      |SELECT c_mktsegment, CAST(n_customers AS BIGINT) AS n_customers,
      |  CAST(sx AS BIGINT) AS total_cents,
      |  CAST(CASE WHEN sx = 0 THEN 0 ELSE
      |    (2 * srx - CAST(n_customers + 1 AS HUGEINT) * sx) * 1000000
      |      // (CAST(n_customers AS HUGEINT) * sx) END AS BIGINT) AS gini_ppm
      |FROM m
      |ORDER BY c_mktsegment""".stripMargin

  /** §2.2 #21cq — lag-1..7 autocorrelation of the daily event-count
    * series per event type: the seasonality detector that reads the
    * SAME weekly signal [[qForecast]] exploits (a high acf at lag 7
    * is what justifies the seasonal-naive backtest) and [[qStlLite]]
    * decomposes. Computed over the DENSE day grid — missing days are
    * real zeros, and skipping them (a sparse self-join like
    * qForecast's) would silently bias the correlation toward
    * activity bursts.
    *
    * Shape: one groupBy to daily counts, the 1-row global day span
    * broadcast-crossed into a per-type `sequence()` explode (the
    * q_gapfill idiom — the grid is |types|·|days|, metadata-sized,
    * NOT fact-sized), one equi-join of the grid with itself shifted
    * by the exploded lag (shuffle key (type, day) both sides), and
    * integer moment sums à la [[qCorrstats]]: counts are int64, so
    * n·Σxy − Σx·Σy is exact in DECIMAL(38,0) on both engines and the
    * single final double division is IEEE-identical.
    */
  def qAcf(spark: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val ev = table(spark, dir, "events")
      .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"))
    val daily = ev.groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("c"))
    val span = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = daily.select(col("event_type")).distinct()
      .crossJoin(broadcast(span))
      .select(col("event_type"), explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"), coalesce(col("c"), lit(0L)).as("c"))
    val x = grid.select(col("event_type"),
        explode(sequence(lit(1), lit(7))).as("lag"),
        (col("day") + col("lag")).as("day"), col("c").as("x"))
    val m = x.join(grid.withColumnRenamed("c", "y"), Seq("event_type", "day"))
      .groupBy(col("event_type"), col("lag"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(col("x").cast(d38)).as("sx"),
        sum(col("y").cast(d38)).as("sy"),
        // factor-first widening: cast EACH factor to DECIMAL(38,0)
        // before the multiply (the qGini cents idiom) so the product
        // is exact decimal arithmetic like the oracle's HUGEINT —
        // an int64 x*y pre-cast would silently wrap above ~3e9 daily
        sum(col("x").cast(d38) * col("y").cast(d38)).as("sxy"),
        sum(col("x").cast(d38) * col("x").cast(d38)).as("sxx"),
        sum(col("y").cast(d38) * col("y").cast(d38)).as("syy"),
      )
    val n = col("n_pairs").cast(DoubleType)
    def d(c: String): Column = col(c).cast(DoubleType)
    // zero-variance guard, decided in EXACT integer arithmetic on both
    // engines (a double-side guard could disagree at the boundary): a
    // constant series — possible at high lags where n_pairs is tiny —
    // has varx = n·sxx − sx² = 0 and the acf is undefined → NULL
    val varX = col("n_pairs").cast(d38) * col("sxx") - col("sx") * col("sx")
    val varY = col("n_pairs").cast(d38) * col("syy") - col("sy") * col("sy")
    m.select(
        col("event_type"), col("lag").cast(LongType).as("lag"), col("n_pairs"),
        when(varX === lit(0) || varY === lit(0), lit(null).cast(DoubleType))
          .otherwise((n * d("sxy") - d("sx") * d("sy"))
            / sqrt((n * d("sxx") - d("sx") * d("sx")) * (n * d("syy") - d("sy") * d("sy"))))
          .as("acf"),
      )
      .orderBy("event_type", "lag")
  }

  val qAcfSql: String =
    """WITH ev AS (
      |  SELECT event_type, epoch_us(ts) // 86400000000 AS day FROM events
      |), daily AS (
      |  SELECT event_type, day, count(*) AS c FROM ev GROUP BY 1, 2
      |), span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
      |grid AS (
      |  SELECT t.event_type, g.day, coalesce(d.c, 0) AS c
      |  FROM (SELECT DISTINCT event_type FROM daily) t
      |  CROSS JOIN span
      |  CROSS JOIN LATERAL (SELECT unnest(range(d0, d1 + 1)) AS day) g
      |  LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = g.day
      |), pairs AS (
      |  SELECT a.event_type, l.lag, a.c AS x, b.c AS y
      |  FROM grid a
      |  CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l
      |  JOIN grid b ON b.event_type = a.event_type AND b.day = a.day + l.lag
      |), m AS (
      |  SELECT event_type, lag, count(*) AS n_pairs,
      |    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
      |    sum(CAST(x AS HUGEINT) * y) AS sxy,
      |    sum(CAST(x AS HUGEINT) * x) AS sxx,
      |    sum(CAST(y AS HUGEINT) * y) AS syy
      |  FROM pairs GROUP BY 1, 2
      |)
      |SELECT event_type, CAST(lag AS BIGINT) AS lag, CAST(n_pairs AS BIGINT) AS n_pairs,
      |  CASE WHEN n_pairs * sxx - sx * sx = 0 OR n_pairs * syy - sy * sy = 0 THEN NULL
      |  ELSE (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |         * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) END AS acf
      |FROM m
      |ORDER BY event_type, lag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_erasure_audit" -> (qErasureAudit _),
    "q_kanon" -> (qKanon _),
    "q_dp_counts" -> (qDpCounts _),
    "q_freshness" -> (qFreshness _),
    "q_runsum_floor" -> (qRunsumFloor _),
    "q_mad_outliers" -> (qMadOutliers _),
    "q_dist_rank" -> (qDistRank _),
    "q_stl_lite" -> (qStlLite _),
    "q_kll_rollup" -> (qKllRollup _),
    "q_hll_rollup" -> (qHllRollup _),
    "q_theta_sets" -> (qThetaSets _),
    "q_basket_lift" -> (qBasketLift _),
    "q_growth" -> (qGrowth _),
    "q_streaks" -> (qStreaks _),
    "q_decay" -> (qDecay _),
    "q_benford" -> (qBenford _),
    "q_gini" -> (qGini _),
    "q_acf" -> (qAcf _),
    "q_skyline" -> (qSkyline _),
    "q_winsorize" -> (qWinsorize _),
    "q_rolling_dau" -> (qRollingDau _),
    "q_forecast" -> (qForecast _),
    "q_vwap" -> (qVwap _),
    "q_changepoint" -> (qChangepoint _),
    "q_concurrency" -> (qConcurrency _),
    "q_seasonality" -> (qSeasonality _),
    "q_rfm" -> (qRfm _),
    "q_pareto" -> (qPareto _),
    "q_mode" -> (qMode _),
    "q_markov" -> (qMarkov _),
    "q_seqmine" -> (qSeqmine _),
    "q_dwell" -> (qDwell _),
    "q_bitmap_retention" -> (qBitmapRetention _),
    "q_fd_audit" -> (qFdAudit _),
    "q_item_sim" -> (qItemSim _),
    "q_copurchase" -> (qCopurchase _),
    "q_ntile" -> (qNtile _),
    "q_bloom_prune" -> (qBloomPrune _),
    "q_skew_report" -> (qSkewReport _),
    "q_join_card" -> (qJoinCard _),
    "q_join_card2" -> (qJoinCard2 _),
    "q_orderpath" -> (qOrderpath _),
    "q_ivm_merge" -> (qIvmMerge _),
    "q_scd2" -> (qScd2 _),
    "q_gapfill" -> (qGapfill _),
    "q_retention" -> (qRetention _),
    "q12_priority" -> (q12Priority _),
    "q17_small_qty" -> (q17SmallQty _),
    "q19_disjunctive" -> (q19Disjunctive _),
    "q21_waiting" -> (q21Waiting _),
    "q22_idle" -> (q22Idle _),
    "q_corrstats" -> (qCorrstats _),
    "q18_large" -> (q18Large _),
    "q14_promo" -> (q14Promo _),
    "q15_top_supplier" -> (q15TopSupplier _),
    "q_median" -> (qMedian _),
    "q_wmedian" -> (qWmedian _),
    "q_lateness" -> (qLateness _),
    "q_drift" -> (qDrift _),
    "q_chisq" -> (qChisq _),
    "q_histogram" -> (qHistogram _),
    "q_skewjoin" -> (qSkewjoin _),
    "q_zorder" -> (qZorder _),
    "q_integrity" -> (qIntegrity _),
    "q10_returns" -> (q10Returns _),
    "q13_custdist" -> (q13Custdist _),
    "q_rolling" -> (qRolling _),
    "q7_volume" -> (q7Volume _),
    "q8_share" -> (q8Share _),
    "profile_table" -> (profileTable _),
    "q_upsert" -> (qUpsert _),
    "q_funnel" -> (qFunnel _),
    "q_funnel_window" -> (qFunnelWindow _),
    "q_attribution" -> (qAttribution _),
    "q_scd2_lookup" -> (qScd2Lookup _),
    "q_anomaly" -> (qAnomaly _),
    "q_theilsen" -> (qTheilSen _),
    "q_ltv" -> (qLtv _),
    "q_abtest" -> (qAbtest _),
    "q_hopping" -> (qHopping _),
    "q_json" -> (qJson _),
    "q_leadlag" -> (qLeadlag _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_rangejoin" -> (qRangejoin _),
    "q_corr_scalar" -> (qCorrScalar _),
    "q_setops" -> (qSetops _),
    "q_pivot" -> (qPivot _),
    "q_cube" -> (qCube _),
    "q_topk_group" -> (qTopkGroup _),
    "q_sketches" -> (qSketches _),
    "q1_agg" -> (q1Agg _),
    "q6_filter" -> (q6Filter _),
    "q3_join" -> (q3Join _),
    "q4_semijoin" -> (q4Semijoin _),
    "q_antijoin" -> (qAntijoin _),
    "q5_multijoin" -> (q5Multijoin _),
    "q_window" -> (qWindow _),
    "q_distinct" -> (qDistinct _),
    "q_rollup" -> (qRollup _),
    "q_asof" -> (qAsof _),
    "q_asof_tolerance" -> (qAsofTolerance _),
    "q_sessionize" -> (qSessionize _),
    "q_events_window" -> (qEventsWindow _),
  )

  val oracles: Map[String, String] = Map(
    "q_vwap" -> qVwapSql,
    "q_changepoint" -> qChangepointSql,
    "q_concurrency" -> qConcurrencySql,
    "q_forecast" -> qForecastSql,
    "q_rolling_dau" -> qRollingDauSql,
    "q_decay" -> qDecaySql,
    "q_benford" -> qBenfordSql,
    "q_gini" -> qGiniSql,
    "q_acf" -> qAcfSql,
    "q_streaks" -> qStreaksSql,
    "q_growth" -> qGrowthSql,
    "q_basket_lift" -> qBasketLiftSql,
    "q_stl_lite" -> qStlLiteSql,
    "q_dist_rank" -> qDistRankSql,
    "q_mad_outliers" -> qMadOutliersSql,
    "q_erasure_audit" -> qErasureAuditSql,
    "q_kanon" -> qKanonSql,
    "q_dp_counts" -> qDpCountsSql,
    "q_freshness" -> qFreshnessSql,
    "q_skyline" -> qSkylineSql,
    "q_winsorize" -> qWinsorizeSql,
    "q_seasonality" -> qSeasonalitySql,
    "q_rfm" -> qRfmSql,
    "q_pareto" -> qParetoSql,
    "q_mode" -> qModeSql,
    "q_markov" -> qMarkovSql,
    "q_seqmine" -> qSeqmineSql,
    "q_dwell" -> qDwellSql,
    "q_bitmap_retention" -> qBitmapRetentionSql,
    "q_fd_audit" -> qFdAuditSql,
    "q_item_sim" -> qItemSimSql,
    "q_copurchase" -> qCopurchaseSql,
    "q_ntile" -> qNtileSql,
    "q_bloom_prune" -> qBloomPruneSql,
    "q_skew_report" -> qSkewReportSql,
    "q_join_card" -> qJoinCardSql,
    "q_join_card2" -> qJoinCard2Sql,
    "q_orderpath" -> qOrderpathSql,
    "q_ivm_merge" -> qIvmMergeSql,
    "q_scd2" -> qScd2Sql,
    "q_gapfill" -> qGapfillSql,
    "q_retention" -> qRetentionSql,
    "q12_priority" -> q12PrioritySql,
    "q17_small_qty" -> q17SmallQtySql,
    "q19_disjunctive" -> q19DisjunctiveSql,
    "q21_waiting" -> q21WaitingSql,
    "q22_idle" -> q22IdleSql,
    "q_corrstats" -> qCorrstatsSql,
    "q18_large" -> q18LargeSql,
    "q14_promo" -> q14PromoSql,
    "q15_top_supplier" -> q15TopSupplierSql,
    "q_median" -> qMedianSql,
    "q_wmedian" -> qWmedianSql,
    "q_lateness" -> qLatenessSql,
    "q_drift" -> qDriftSql,
    "q_chisq" -> qChisqSql,
    "q_histogram" -> qHistogramSql,
    "q_skewjoin" -> qSkewjoinSql,
    "q_zorder" -> qZorderSql,
    "q_integrity" -> qIntegritySql,
    "q10_returns" -> q10ReturnsSql,
    "q13_custdist" -> q13CustdistSql,
    "q_rolling" -> qRollingSql,
    "q7_volume" -> q7VolumeSql,
    "q8_share" -> q8ShareSql,
    "profile_table" -> profileTableSql,
    "q_json" -> qJsonSql,
    "q_leadlag" -> qLeadlagSql,
    "q_grouping_sets" -> qGroupingSetsSql,
    "q_rangejoin" -> qRangejoinSql,
    "q_corr_scalar" -> qCorrScalarSql,
    "q_upsert" -> qUpsertSql,
    "q_funnel" -> qFunnelSql,
    "q_funnel_window" -> qFunnelWindowSql,
    "q_attribution" -> qAttributionSql,
    "q_scd2_lookup" -> qScd2LookupSql,
    "q_anomaly" -> qAnomalySql,
    "q_theilsen" -> qTheilSenSql,
    "q_ltv" -> qLtvSql,
    "q_abtest" -> qAbtestSql,
    "q_hopping" -> qHoppingSql,
    "q_setops" -> qSetopsSql,
    "q_pivot" -> qPivotSql,
    "q_cube" -> qCubeSql,
    "q_topk_group" -> qTopkGroupSql,
    // q_sketches: HLL/quantile sketches are engine-specific → rows-only
    "q1_agg" -> q1AggSql,
    "q6_filter" -> q6FilterSql,
    "q3_join" -> q3JoinSql,
    "q4_semijoin" -> q4SemijoinSql,
    "q_antijoin" -> qAntijoinSql,
    "q5_multijoin" -> q5MultijoinSql,
    "q_window" -> qWindowSql,
    "q_distinct" -> qDistinctSql,
    "q_rollup" -> qRollupSql,
    "q_asof" -> qAsofSql,
    "q_asof_tolerance" -> qAsofToleranceSql,
    "q_sessionize" -> qSessionizeSql,
    "q_events_window" -> qEventsWindowSql,
  )
}
