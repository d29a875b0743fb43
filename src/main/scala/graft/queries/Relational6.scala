package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Num, Tables}

/** Round-3 relational breadth: the three classic TPC-H shapes the catalog
  * did not yet exercise — min-per-group JOIN-BACK (Q2's physical pattern,
  * distinct from the window top-1 in q17/q44), the double-EXISTS
  * wait-analysis (Q21: semi join AND anti join against the same relation),
  * and conditional-aggregate market share (Q8's ratio-of-sums). */
object Relational6 {
  import Num._

  def all: Seq[QueryDef] =
    Seq(minCostSupplier, waitingSuppliers, marketShare, sqlTextSurface,
      percentRank, rangeIntervalWindow)

  /** RANGE-interval frame — the one window-frame family the catalog's
    * window surface (rank/ntile/percent_rank, first/last, lag, moving
    * ROWS frames) did not yet exercise: each order's trailing-7-day
    * revenue within its customer, `RANGE BETWEEN INTERVAL 7 DAYS
    * PRECEDING AND CURRENT ROW` over the order DATE. Unlike a ROWS
    * frame the bound is a VALUE predicate on the order key, so
    * same-date peers share one frame (and one result — deterministic
    * under date ties by construction; output order pins o_orderkey).
    * The sum is exact decimal, cast to double once at the end.
    *
    * Scale: one shuffle on o_custkey + per-partition sort by date;
    * Spark evaluates the interval bound incrementally with two
    * sliding frame pointers per partition — O(rows), never
    * re-scanning the frame per row (the [[graft.operators.Events]]
    * quadratic-trap lesson does not apply to value-bounded frames
    * with monotone bounds). */
  val rangeIntervalWindow = QueryDef("q54_range_interval_window",
    (s, d) => Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        dec(col("o_totalprice")).as("p"))
      .withColumn("trailing_7d_revenue", expr(
        """CAST(SUM(p) OVER (PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
           AS DOUBLE)"""))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("trailing_7d_revenue"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey")),
    Some("""SELECT o_custkey, o_orderkey, o_orderdate,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
          PARTITION BY o_custkey ORDER BY o_orderdate
          RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW)
          AS DOUBLE) AS trailing_7d_revenue
      FROM orders
      ORDER BY o_custkey, o_orderdate, o_orderkey"""))

  /** percent_rank + cume_dist — the two relative-rank window functions
    * the catalog's window surface (rank q10, ntile q37, row_number
    * everywhere) did not yet exercise: each customer's order-count
    * standing within its market segment as a [0, 1] percentile.
    * The window orders by (n_orders, c_custkey) — tie-free, so
    * percent_rank is exactly (rank−1)/(N−1) and cume_dist rank/N, each
    * ONE IEEE division of exact longs (bit-equal cross-engine; with
    * ties both engines share SQL-standard semantics anyway, the unique
    * ordering just removes the need to reason about it). Partitioned
    * by segment → parallel; map-side partial agg feeds the counts. */
  val percentRank = QueryDef("q53_percent_rank",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val n = Tables.orders(s, d)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("n_orders"), col("c_custkey"))
      Tables.customer(s, d)
        .join(n, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(col("c_mktsegment"), col("c_custkey"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .orderBy(col("c_mktsegment"), col("c_custkey"))
    },
    Some("""SELECT c_mktsegment, c_custkey,
        COALESCE(n.n_orders, 0) AS n_orders,
        percent_rank() OVER (PARTITION BY c_mktsegment
          ORDER BY COALESCE(n.n_orders, 0), c_custkey) AS pr,
        cume_dist() OVER (PARTITION BY c_mktsegment
          ORDER BY COALESCE(n.n_orders, 0), c_custkey) AS cd
      FROM customer c LEFT JOIN (SELECT o_custkey,
          CAST(COUNT(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1) n
        ON c.c_custkey = n.o_custkey
      ORDER BY c_mktsegment, c_custkey"""))

  /** The SQL-text surface proof: this entry is executed as LITERAL SQL
    * via `spark.sql` over `Tables.registerAll` temp views — not the
    * DataFrame API — and the ORACLE is the character-identical statement
    * run by DuckDB. One query text, two engines, hash-equal results:
    * the demonstration that a user of this engine can bring plain ANSI
    * SQL (joins, windows, aggregates) and the Catalyst pipeline treats
    * it exactly like the typed API (same optimizer, same plans —
    * `spark.sql` and the DataFrame builders converge on the same
    * LogicalPlan). */
  val sqlTextSurface = {
    val sqlText = """SELECT n_name,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
        CAST(RANK() OVER (ORDER BY
          CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) DESC,
          n_name) AS INT) AS rnk
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE o_orderstatus = 'F'
      GROUP BY n_name
      ORDER BY rnk, n_name"""
    QueryDef("sql_text_surface",
      (s, d) => { Tables.registerAll(s, d); s.sql(sqlText) },
      Some(sqlText))
  }

  /** TPC-H Q2 shape: cheapest supplier per part via aggregate + join-back
    * on the (group, min) equality — at scale this is two shuffles on
    * partkey and no per-group sort, the alternative plan family to the
    * window top-1 (the join-back wins when groups are huge and only the
    * minima survive). Equality on the min price is exact: the joined
    * value IS an input value, no arithmetic. */
  val minCostSupplier = QueryDef("q50_min_cost_supplier",
    (s, d) => {
      val l = Tables.lineitem(s, d)
      val minp = l.groupBy(col("l_partkey"))
        .agg(min(col("l_extendedprice")).as("min_price"))
      val atMin = l.join(minp, Seq("l_partkey"))
        .where(col("l_extendedprice") === col("min_price"))
        .groupBy(col("l_partkey"), col("min_price"))
        .agg(min(col("l_suppkey")).as("s_suppkey"))
      atMin.join(Tables.supplier(s, d), Seq("s_suppkey"))
        .select(col("l_partkey"), col("min_price"), col("s_suppkey"),
          col("s_name"))
        .orderBy(col("l_partkey"))
    },
    Some("""WITH minp AS (
        SELECT l_partkey, MIN(l_extendedprice) AS min_price
        FROM lineitem GROUP BY l_partkey),
      at_min AS (
        SELECT l.l_partkey, m.min_price, MIN(l.l_suppkey) AS s_suppkey
        FROM lineitem l JOIN minp m ON l.l_partkey = m.l_partkey
          AND l.l_extendedprice = m.min_price
        GROUP BY l.l_partkey, m.min_price)
      SELECT a.l_partkey, a.min_price, a.s_suppkey, s.s_name
      FROM at_min a JOIN supplier s ON a.s_suppkey = s.s_suppkey
      ORDER BY a.l_partkey"""))

  /** TPC-H Q21 shape: suppliers who were the ONLY late shipper in a
    * multi-supplier order — a semi join (some other supplier shipped the
    * order) AND an anti join (no other supplier shipped late) against the
    * same relation. Late = shipped more than 25 days after the order
    * date. Both existence checks plan as broadcast/shuffled hash joins at
    * scale; nothing is correlated row-at-a-time. */
  val waitingSuppliers = QueryDef("q51_waiting_suppliers",
    (s, d) => {
      val l = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val o = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderdate"))
      val late = l.join(o, col("l_orderkey") === col("o_orderkey"))
        .where(col("l_shipdate") > col("o_orderdate") + expr("interval 25 days"))
        .select(col("l_orderkey"), col("l_suppkey")).distinct()
      // no distinct: semi/anti join right sides tolerate duplicates, and
      // the dedup shuffle would cost more than it saves
      val others = l.select(col("l_orderkey").as("x_orderkey"),
        col("l_suppkey").as("x_suppkey"))
      val lateOthers = late.select(col("l_orderkey").as("x_orderkey"),
        col("l_suppkey").as("x_suppkey"))
      val waiting = late
        .join(others,
          col("l_orderkey") === col("x_orderkey") &&
            col("l_suppkey") =!= col("x_suppkey"), "left_semi")
        .join(lateOthers,
          col("l_orderkey") === col("x_orderkey") &&
            col("l_suppkey") =!= col("x_suppkey"), "left_anti")
      waiting.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(10)
    },
    Some("""WITH late AS (
        SELECT DISTINCT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate > o_orderdate + INTERVAL 25 DAY),
      waiting AS (
        SELECT w.l_orderkey, w.l_suppkey FROM late w
        WHERE EXISTS (SELECT 1 FROM lineitem x
            WHERE x.l_orderkey = w.l_orderkey AND x.l_suppkey <> w.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late y
            WHERE y.l_orderkey = w.l_orderkey AND y.l_suppkey <> w.l_suppkey))
      SELECT s_name, numwait FROM (
        SELECT l_suppkey, COUNT(*) AS numwait FROM waiting GROUP BY l_suppkey)
      JOIN supplier ON l_suppkey = s_suppkey
      ORDER BY numwait DESC, s_name LIMIT 10"""))

  /** TPC-H Q8 shape: one brand's revenue share per order year — ratio of
    * two conditional decimal-exact sums, one IEEE division at the end.
    * Map-side combinable all the way; the ratio never touches decimal
    * width rules (both sums convert to double once). */
  val marketShare = QueryDef("q52_market_share",
    (s, d) => {
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val p = Tables.part(s, d)
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          sum(when(col("p_brand") === "Brand#1",
            revenue(col("l_extendedprice"), col("l_discount")))
            .otherwise(lit(0).cast("decimal(18,4)"))).cast("double")
            .as("brand_revenue"),
          sumd(revenue(col("l_extendedprice"), col("l_discount")))
            .as("total_revenue"))
        .select(col("o_year"),
          (col("brand_revenue") / col("total_revenue")).as("mkt_share"),
          col("brand_revenue"), col("total_revenue"))
        .orderBy(col("o_year"))
    },
    Some(s"""SELECT o_year, brand_revenue / total_revenue AS mkt_share,
        brand_revenue, total_revenue
      FROM (SELECT CAST(year(o_orderdate) AS INT) AS o_year,
          CAST(SUM(CASE WHEN p_brand = 'Brand#1' THEN ${Num.sqlRevenue}
            ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS brand_revenue,
          CAST(SUM(${Num.sqlRevenue}) AS DOUBLE) AS total_revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        GROUP BY year(o_orderdate))
      ORDER BY o_year"""))
}
