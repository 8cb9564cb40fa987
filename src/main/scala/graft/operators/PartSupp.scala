package graft.operators

import graft.GraftSession.table
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** partsupp-family TPC-H shapes (SURVEY.md §2.2, rows 21ci-21cm).
  *
  * The testdata ships no partsupp table, so the relation is SYNTHESIZED
  * deterministically from part × supplier — the same derivation runs in
  * the DuckDB oracle as a CTE, so both engines query an identical input
  * without touching the read-only testdata:
  *
  *  - membership: supplier s supplies part p iff p_partkey ≡ s_suppkey
  *    (mod 25). Expressed as an EQUI-join on the 25-valued bucket key
  *    (never a filtered cross join — the plan audit forbids cartesians);
  *    each part gets |supplier|/25 suppliers (4 at sf0.01), matching
  *    TPC-H's 4-suppliers-per-part density at the test SF.
  *  - ps_availqty   = 1 + md5-u32("aq:p:s") % 9999        (BIGINT)
  *  - ps_supplycost = 1 + md5-u32("sc:p:s") % 1000        (BIGINT, whole
  *    dollars — keeps every cost term integer-exact so engine float
  *    semantics can never diverge; cents-scale money math stays on the
  *    lineitem side in DECIMAL as per the §6 parity rules)
  *
  * where md5-u32(x) = first 8 hex chars of md5(x) as an unsigned int —
  * the repo-wide deterministic-uniform convention (Pipeline.scala).
  *
  * Scale shape: partsupp is |part|·|supplier|/25 rows of 4 narrow
  * columns — dimension-scale next to lineitem at any SF (TPC-H itself
  * keeps partsupp ~4× part). The fact-side joins below shuffle lineitem
  * once on its join key and broadcast every filtered dimension.
  */
object PartSupp {

  private def decP(c: Column): Column = c.cast(DecimalType(12, 2))
  private def decR(c: Column): Column = c.cast(DecimalType(4, 2))
  private val one = lit(1).cast(DecimalType(3, 2))
  private def dbl(c: Column): Column = c.cast(DoubleType)

  /** md5-derived uniform u32 keyed on (tag, partkey, suppkey). */
  private def u32(tag: String): Column =
    conv(
      substring(
        md5(concat_ws(":", lit(tag), col("ps_partkey").cast(StringType), col("ps_suppkey").cast(StringType))),
        1, 8),
      16, 10
    ).cast(LongType)

  /** The synthesized partsupp relation: (ps_partkey BIGINT, ps_suppkey
    * BIGINT, ps_availqty BIGINT, ps_supplycost BIGINT).
    */
  def partsupp(spark: SparkSession, dir: String): DataFrame = {
    val p = table(spark, dir, "part")
      .select(col("p_partkey").as("ps_partkey"), pmod(col("p_partkey"), lit(25L)).as("bk_p"))
    val s = table(spark, dir, "supplier")
      .select(col("s_suppkey").cast(LongType).as("ps_suppkey"),
        pmod(col("s_suppkey").cast(LongType), lit(25L)).as("bk_s"))
    p.join(broadcast(s), col("bk_p") === col("bk_s"))
      .select(
        col("ps_partkey"),
        col("ps_suppkey"),
        (lit(1L) + pmod(u32("aq"), lit(9999L))).as("ps_availqty"),
        (lit(1L) + pmod(u32("sc"), lit(1000L))).as("ps_supplycost"),
      )
  }

  /** The identical derivation as a DuckDB CTE body (prepend WITH). */
  private val psCte: String =
    """partsupp AS (
      |  SELECT p_partkey AS ps_partkey, CAST(s_suppkey AS BIGINT) AS ps_suppkey,
      |    1 + ('0x' || substr(md5('aq:' || CAST(p_partkey AS VARCHAR) || ':' || CAST(s_suppkey AS VARCHAR)),1,8))::BIGINT % 9999 AS ps_availqty,
      |    1 + ('0x' || substr(md5('sc:' || CAST(p_partkey AS VARCHAR) || ':' || CAST(s_suppkey AS VARCHAR)),1,8))::BIGINT % 1000 AS ps_supplycost
      |  FROM part JOIN supplier ON (p_partkey % 25) = (s_suppkey % 25)
      |)""".stripMargin

  /** §2.2 #21ci — product-type profit by nation and year, TPC-H Q9
    * shape. The only big-big shuffle is lineitem ⋈ orders on orderkey;
    * partsupp, part, supplier, nation are all broadcast dims. Profit is
    * decimal-exact: disc-price in DECIMAL minus an integer cost term
    * (whole-dollar supplycost × integral quantity), summed before one
    * cast to DOUBLE.
    */
  def q9Profit(spark: SparkSession, dir: String): DataFrame = {
    val ps = partsupp(spark, dir)
    val p = table(spark, dir, "part").filter(col("p_name").like("%widget%")).select(col("p_partkey"))
    val s = table(spark, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
    val n = table(spark, dir, "nation").select(col("n_nationkey"), col("n_name"))
    val o = table(spark, dir, "orders").select(col("o_orderkey"), col("o_orderdate"))
    val l = table(spark, dir, "lineitem")
    val profit =
      decP(col("l_extendedprice")) * (one - decR(col("l_discount"))) -
        (col("ps_supplycost") * col("l_quantity").cast(LongType)).cast(DecimalType(14, 2))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(ps.join(broadcast(p), col("ps_partkey") === col("p_partkey"))),
        col("l_partkey") === col("ps_partkey") && col("l_suppkey") === col("ps_suppkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast(LongType).as("o_year"))
      .agg(dbl(sum(profit)).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9ProfitSql: String =
    s"""WITH $psCte
      |SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
      |       - CAST(ps_supplycost * CAST(l_quantity AS BIGINT) AS DECIMAL(14,2))) AS DOUBLE) AS sum_profit
      |FROM lineitem
      |JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%widget%'
      |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  /** §2.2 #21cj — supplier selection by stock-vs-shipped ratio, TPC-H
    * Q20 shape. The correlated "availqty exceeds what this supplier
    * shipped of this part" subquery is decorrelated: one lineitem
    * groupBy on (partkey, suppkey) → INNER join onto the part-filtered
    * partsupp (the Q20 EXISTS-on-lineitem semantics) → integer-exact
    * availqty > qty comparison → distinct suppkeys → LEFT SEMI join
    * onto the region-filtered supplier dim. Region-level (not
    * nation-level) so the dim filter is non-empty at every test SF.
    */
  def q20Potential(spark: SparkSession, dir: String): DataFrame = {
    val ps = partsupp(spark, dir)
    val p = table(spark, dir, "part").filter(col("p_size") <= 25).select(col("p_partkey"))
    val shipped = table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1998-01-01").cast(TimestampType))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast(LongType)).as("qty"))
    val cand = ps
      .join(broadcast(p), col("ps_partkey") === col("p_partkey"))
      .join(shipped, col("ps_partkey") === col("l_partkey") && col("ps_suppkey") === col("l_suppkey"))
      .filter(col("ps_availqty") > col("qty"))
      .select(col("ps_suppkey")).distinct()
    val n = table(spark, dir, "nation").select(col("n_nationkey"), col("n_regionkey"))
    val r = table(spark, dir, "region").filter(col("r_name") === "EUROPE").select(col("r_regionkey"))
    table(spark, dir, "supplier")
      .join(broadcast(n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      // cand is a distinct-suppkey set (≤ |supplier|): broadcast it so
      // the semi join never exchanges the supplier dim
      .join(broadcast(cand), col("s_suppkey").cast(LongType) === col("ps_suppkey"), "left_semi")
      .select(col("s_name"), col("s_suppkey").cast(LongType).as("suppkey"))
      .orderBy("s_name")
  }

  val q20PotentialSql: String =
    s"""WITH $psCte,
      |shipped AS (
      |  SELECT l_partkey, l_suppkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
      |  FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      |  GROUP BY 1, 2
      |),
      |cand AS (
      |  SELECT DISTINCT ps_suppkey FROM partsupp
      |  JOIN part ON ps_partkey = p_partkey
      |  JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
      |  WHERE p_size <= 25 AND ps_availqty > qty
      |)
      |SELECT s_name, CAST(s_suppkey AS BIGINT) AS suppkey
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE' AND s_suppkey IN (SELECT ps_suppkey FROM cand)
      |ORDER BY s_name""".stripMargin

  /** §2.2 #21ck — minimum-cost supplier per part in a region, TPC-H Q2
    * shape. The correlated MIN(ps_supplycost) subquery is decorrelated
    * to a per-part min aggregate joined back on (partkey, mincost); the
    * region restriction prunes partsupp once, before both branches.
    * Total ORDER BY: (s_name, ps_partkey) is unique per row, so the
    * LIMIT boundary is deterministic.
    */
  def q2Mincost(spark: SparkSession, dir: String): DataFrame = {
    val ps = partsupp(spark, dir)
    val n = table(spark, dir, "nation").select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val r = table(spark, dir, "region").filter(col("r_name") === "EUROPE").select(col("r_regionkey"))
    val s = table(spark, dir, "supplier")
    val eu = ps
      .join(broadcast(s.join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey").cast(LongType).as("eu_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))),
        col("ps_suppkey") === col("eu_suppkey"))
    val mn = eu.groupBy(col("ps_partkey").as("mk")).agg(min(col("ps_supplycost")).as("mincost"))
    val p = table(spark, dir, "part")
      .filter(col("p_size") <= 15 && col("p_type") === "STANDARD")
      .select(col("p_partkey"), col("p_name"))
    eu.join(mn, col("ps_partkey") === col("mk") && col("ps_supplycost") === col("mincost"))
      .join(broadcast(p), col("ps_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"), col("ps_partkey"), col("p_name"), col("ps_supplycost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("ps_partkey"))
      .limit(100)
  }

  val q2MincostSql: String =
    s"""WITH $psCte,
      |eu AS (
      |  SELECT ps_partkey, ps_suppkey, ps_supplycost, s_name, s_acctbal, n_name
      |  FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'
      |),
      |mn AS (SELECT ps_partkey AS mk, min(ps_supplycost) AS mincost FROM eu GROUP BY 1)
      |SELECT s_acctbal, s_name, n_name, ps_partkey, p_name, ps_supplycost
      |FROM eu JOIN mn ON ps_partkey = mk AND ps_supplycost = mincost
      |JOIN part ON ps_partkey = p_partkey
      |WHERE p_size <= 15 AND p_type = 'STANDARD'
      |ORDER BY s_acctbal DESC, n_name, s_name, ps_partkey LIMIT 100""".stripMargin

  /** §2.2 #21cl — important-stock identification, TPC-H Q11 shape: each
    * part's stock value across one region's suppliers vs a share
    * threshold of the region total (region-level so the supplier dim
    * filter is non-empty at every test SF).
    * The total is a 1-ROW aggregate broadcast-crossed
    * into the per-part rollup (the q22_idle shape — whitelisted in the
    * plan audit). The threshold is RELATIVE to the mean per-part value
    * (2·value·n_parts > 3·total, i.e. value > 1.5× mean) — TPC-H's
    * fixed-fraction form degenerates to the empty set as the part count
    * grows, which is exactly why the spec scales its fraction by 1/SF;
    * a mean-relative cut is SF-invariant. All-BIGINT math, exact on
    * both engines.
    */
  def q11Important(spark: SparkSession, dir: String): DataFrame = {
    val ps = partsupp(spark, dir)
    val n = table(spark, dir, "nation").select(col("n_nationkey"), col("n_regionkey"))
    val r = table(spark, dir, "region").filter(col("r_name") === "EUROPE").select(col("r_regionkey"))
    val s = table(spark, dir, "supplier")
      .join(broadcast(n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").cast(LongType).as("nat_suppkey"))
    val nat = ps.join(broadcast(s), col("ps_suppkey") === col("nat_suppkey"))
      .select(col("ps_partkey"), (col("ps_supplycost") * col("ps_availqty")).as("val"))
    val grp = nat.groupBy(col("ps_partkey")).agg(sum(col("val")).as("value"))
    val tot = nat.agg(sum(col("val")).as("total"), countDistinct(col("ps_partkey")).as("n_parts"))
    grp.crossJoin(broadcast(tot))
      // 2·value·n_parts > 3·total, divide-before-multiply: the triple
      // product overflows int64 near total ~ 2^63/n_parts, while
      // value > (3·total) div (2·n_parts) is the EXACT same predicate
      // (v·2n > 3t ⟺ v > floor(3t/2n) for positive integers) and only
      // needs 3·total ≤ 2^63 (safe input bound: total < 3.07e18 cents)
      .filter(col("value") > expr("(3 * total) div (2 * n_parts)"))
      .select(col("ps_partkey"), col("value"))
      .orderBy(col("value").desc, col("ps_partkey"))
  }

  val q11ImportantSql: String =
    s"""WITH $psCte,
      |nat AS (
      |  SELECT ps_partkey, ps_supplycost * ps_availqty AS val
      |  FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'
      |),
      |grp AS (SELECT ps_partkey, CAST(sum(val) AS BIGINT) AS value FROM nat GROUP BY 1),
      |tot AS (SELECT CAST(sum(val) AS BIGINT) AS total, CAST(count(DISTINCT ps_partkey) AS BIGINT) AS n_parts FROM nat)
      |SELECT ps_partkey, value FROM grp, tot
      |WHERE value > (3 * total) // (2 * n_parts)
      |ORDER BY value DESC, ps_partkey""".stripMargin

  /** §2.2 #21cm — supplier-count-by-part-attributes, TPC-H Q16 shape:
    * distinct suppliers per (brand, type, size) bucket, excluding
    * negative-balance suppliers via a broadcast LEFT ANTI join (the
    * NOT IN subquery, decorrelated).
    */
  def q16Suppcnt(spark: SparkSession, dir: String): DataFrame = {
    val ps = partsupp(spark, dir)
    val p = table(spark, dir, "part")
      .filter(col("p_brand") =!= "Brand#3" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    val bad = table(spark, dir, "supplier").filter(col("s_acctbal") < 0)
      .select(col("s_suppkey").cast(LongType).as("bad_suppkey"))
    ps.join(broadcast(p), col("ps_partkey") === col("p_partkey"))
      .join(broadcast(bad), col("ps_suppkey") === col("bad_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size").cast(LongType).as("p_size"))
      .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  val q16SuppcntSql: String =
    s"""WITH $psCte
      |SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size, CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
      |FROM partsupp
      |JOIN part ON ps_partkey = p_partkey
      |WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO' AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      |  AND ps_suppkey NOT IN (SELECT CAST(s_suppkey AS BIGINT) FROM supplier WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q9_profit" -> (q9Profit _),
    "q20_potential" -> (q20Potential _),
    "q2_mincost" -> (q2Mincost _),
    "q11_important" -> (q11Important _),
    "q16_suppcnt" -> (q16Suppcnt _),
  )

  val oracles: Map[String, String] = Map(
    "q9_profit" -> q9ProfitSql,
    "q20_potential" -> q20PotentialSql,
    "q2_mincost" -> q2MincostSql,
    "q11_important" -> q11ImportantSql,
    "q16_suppcnt" -> q16SuppcntSql,
  )
}
