package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryDef, Num, Tables}

/** Relational query catalog over the TPC-H-ish driver tables — the breadth
  * layer of SURVEY.md §7.2 step 3. Each query is the idiomatic declarative
  * Spark plan (Catalyst handles pushdown/pruning/join selection; AQE the
  * runtime re-plan) with a DuckDB oracle.
  *
  * Determinism rules (see [[graft.Num]]): decimal-exact money arithmetic,
  * full-tie-break ORDER BY everywhere, explicit casts where Spark and DuckDB
  * result types diverge (e.g. year() is INT in Spark, BIGINT in DuckDB).
  */
object Relational {
  import Num._

  def all: Seq[QueryDef] = Seq(q1, q2, q3, q4, q5, q6, q7, q8, q9, q10,
    q11, q12, q13, q14, q15, q16, q17, q18, q19, q20, q21)

  /** TPC-H Q1 shape: pricing summary report (agg breadth: sum/avg/count). */
  val q1 = QueryDef("q1_pricing_summary",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2001-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumd(dec(col("l_quantity"))).as("sum_qty"),
        sumd(dec(col("l_extendedprice"))).as("sum_base_price"),
        sumd(revenue(col("l_extendedprice"), col("l_discount"))).as("sum_disc_price"),
        avgd(dec(col("l_quantity"))).as("avg_qty"),
        avgd(dec(col("l_extendedprice"))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(""" + sqlRevenue + """) AS DOUBLE) AS sum_disc_price,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      COUNT(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** Filter + projection (predicate/column pushdown exemplar). */
  val q2 = QueryDef("q2_filter_project",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1998-01-01") &&
        col("l_shipdate") < lit("1999-01-01") && col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber")),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate < TIMESTAMP '1999-01-01' AND l_quantity > 45
      ORDER BY l_orderkey, l_linenumber"""))

  /** 3-way join + agg + top-k: highest-revenue customers. */
  val q3 = QueryDef("q3_top_customers",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(c("c_custkey"), c("c_name"))
        .agg(sumd(revenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name,
      CAST(SUM(""" + sqlRevenue + """) AS DOUBLE) AS revenue
      FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY c_custkey, c_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  /** EXISTS / left-semi join: orders with a lineitem shipped after order date. */
  val q4 = QueryDef("q4_order_priority",
    (s, d) => {
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      o.join(l, o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** TPC-H Q5 shape: 6-way join, revenue by nation within a region.
    * region/nation are tiny at every scale factor → explicit broadcast. */
  val q5 = QueryDef("q5_region_revenue",
    (s, d) => {
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val n = Tables.nation(s, d)
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      val sup = Tables.supplier(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey") &&
          sup("s_nationkey") === c("c_nationkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(o("o_orderdate") >= lit("1998-01-01") &&
          o("o_orderdate") < lit("1999-01-01"))
        .groupBy(col("n_name"))
        .agg(sumd(revenue(col("l_extendedprice"), col("l_discount"))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name,
      CAST(SUM(""" + sqlRevenue + """) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1998-01-01'
        AND o_orderdate < TIMESTAMP '1999-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name"""))

  /** TPC-H Q6 shape: single-table conditional aggregate. */
  val q6 = QueryDef("q6_forecast_revenue",
    (s, d) => Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1999-01-01") &&
        col("l_shipdate") < lit("2000-01-01") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sumd((dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("decimal(18,4)")).as("revenue")),
    Some("""SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
        CAST(l_discount AS DECIMAL(12,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1999-01-01'
        AND l_shipdate < TIMESTAMP '2000-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""))

  /** GROUP BY + HAVING. */
  val q7 = QueryDef("q7_having",
    (s, d) => Tables.customer(s, d)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"),
        sumd(dec(col("c_acctbal"))).as("total_bal"))
      .filter(col("n_customers") > 40)
      .orderBy(col("c_nationkey")),
    Some("""SELECT c_nationkey, COUNT(*) AS n_customers,
      CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
      FROM customer GROUP BY c_nationkey HAVING COUNT(*) > 40
      ORDER BY c_nationkey"""))

  /** Global sort + limit (top-k). */
  val q8 = QueryDef("q8_top_orders",
    (s, d) => Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(15),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 15"""))

  /** DISTINCT. */
  val q9 = QueryDef("q9_distinct_flags",
    (s, d) => Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus")).distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus"""))

  /** Window: top-3 customers by balance per nation (row_number). */
  val q10 = QueryDef("q10_rank_customers",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("c_nationkey"), col("rn"), col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_nationkey"), col("rn"))
    },
    Some("""SELECT c_nationkey, CAST(rn AS INT) AS rn, c_custkey, c_acctbal FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
          ROW_NUMBER() OVER (PARTITION BY c_nationkey
            ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer) t
      WHERE rn <= 3 ORDER BY c_nationkey, rn"""))

  /** Window: running revenue per supplier (frame = ROWS, exact decimal). */
  val q11 = QueryDef("q11_running_revenue",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .filter(col("l_suppkey") < 5)
        .withColumn("running_qty",
          sum(dec(col("l_quantity"))).over(w).cast("double"))
        .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"), col("running_qty"))
        .orderBy(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"))
    },
    Some("""SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER (
        PARTITION BY l_suppkey
        ORDER BY l_shipdate, l_orderkey, l_linenumber
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS running_qty
      FROM lineitem WHERE l_suppkey < 5
      ORDER BY l_suppkey, l_shipdate, l_orderkey, l_linenumber"""))

  /** Set operation: customers ordering in both 1998 and 1999 (INTERSECT). */
  val q12 = QueryDef("q12_intersect",
    (s, d) => {
      val o = Tables.orders(s, d)
      val y98 = o.filter(col("o_orderdate") >= lit("1998-01-01") &&
        col("o_orderdate") < lit("1999-01-01")).select(col("o_custkey"))
      val y99 = o.filter(col("o_orderdate") >= lit("1999-01-01") &&
        col("o_orderdate") < lit("2000-01-01")).select(col("o_custkey"))
      y98.intersect(y99).orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-01-01'
          AND o_orderdate < TIMESTAMP '1999-01-01'
      INTERSECT
      SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1999-01-01'
          AND o_orderdate < TIMESTAMP '2000-01-01'
      ORDER BY o_custkey"""))

  /** CASE/string functions: balance buckets per market segment. */
  val q13 = QueryDef("q13_case_buckets",
    (s, d) => Tables.customer(s, d)
      .withColumn("bucket",
        when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 5000, "low").otherwise("high"))
      .groupBy(col("c_mktsegment"), col("bucket"))
      .agg(count(lit(1)).as("n"),
        max(upper(substring(col("c_name"), 1, 8))).as("max_prefix"))
      .orderBy(col("c_mktsegment"), col("bucket")),
    Some("""SELECT c_mktsegment,
      CASE WHEN c_acctbal < 0 THEN 'negative'
           WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bucket,
      COUNT(*) AS n,
      MAX(UPPER(SUBSTR(c_name, 1, 8))) AS max_prefix
      FROM customer GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Date truncation: monthly order volume. */
  val q14 = QueryDef("q14_monthly_orders",
    (s, d) => Tables.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_orders"),
        sumd(dec(col("o_totalprice"))).as("total"))
      .orderBy(col("month")),
    Some("""SELECT date_trunc('month', o_orderdate) AS month,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      FROM orders GROUP BY 1 ORDER BY 1"""))

  /** Anti join: customers with no orders. */
  val q15 = QueryDef("q15_customers_no_orders",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey"""))

  /** ROLLUP (grouping-set aggregate). NULLS FIRST in the oracle to match
    * Spark's asc null ordering. */
  val q16 = QueryDef("q16_rollup",
    (s, d) => Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sumd(dec(col("l_quantity"))).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first),
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  /** Window: top-2 parts per brand by retail price (dense_rank). */
  val q17 = QueryDef("q17_top_parts_per_brand",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
      Tables.part(s, d)
        .withColumn("rk", dense_rank().over(w))
        .filter(col("rk") <= 2)
        .select(col("p_brand"), col("rk"), col("p_partkey"),
          col("p_retailprice"))
        .orderBy(col("p_brand"), col("rk"), col("p_partkey"))
    },
    Some("""SELECT p_brand, CAST(rk AS INT) AS rk, p_partkey, p_retailprice FROM (
        SELECT p_brand, p_partkey, p_retailprice,
          DENSE_RANK() OVER (PARTITION BY p_brand
            ORDER BY p_retailprice DESC, p_partkey) AS rk
        FROM part) t
      WHERE rk <= 2 ORDER BY p_brand, rk, p_partkey"""))

  /** Scalar subquery: orders 50% above the mean price (exact-avg variant). */
  val q18 = QueryDef("q18_above_avg_orders",
    (s, d) => {
      val o = Tables.orders(s, d)
      val stats = o.agg(
        (sum(dec(col("o_totalprice"))).cast("double") / count(lit(1)))
          .as("avg_price"))
      o.crossJoin(broadcast(stats))
        .filter(col("o_totalprice") > col("avg_price") * 1.5)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_totalprice > 1.5 * (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
          / COUNT(*) FROM orders)
      ORDER BY o_orderkey"""))

  /** NOT EXISTS with predicate: orders having no high-quantity lineitem. */
  val q19 = QueryDef("q19_no_bulk_lines",
    (s, d) => {
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d).filter(col("l_quantity") >= 48)
      o.join(l, o("o_orderkey") === l("l_orderkey"), "left_anti")
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus, COUNT(*) AS n FROM orders
      WHERE NOT EXISTS (SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Exact COUNT(DISTINCT) per group. */
  val q20 = QueryDef("q20_count_distinct",
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
      .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
      COUNT(DISTINCT l_suppkey) AS n_supps
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Left outer join + count of non-null: orders per customer incl. zero. */
  val q21 = QueryDef("q21_left_join_counts",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(c("c_custkey"))
        .agg(count(o("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    },
    Some("""SELECT c_custkey, COUNT(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey"""))
}
