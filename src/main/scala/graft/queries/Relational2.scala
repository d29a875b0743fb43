package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Num, Tables}

/** Second tranche of relational breadth: pattern matching, correlated
  * aggregate subqueries (TPC-H Q17 shape), UNION ALL / EXCEPT, date
  * interval range predicates, and null-handling with outer joins. */
object Relational2 {
  import Num._

  def all: Seq[QueryDef] = Seq(q25, q26, q27, q28, q29, q30)

  /** LIKE / NOT LIKE pattern filters. */
  val q25 = QueryDef("q25_like_filter",
    (s, d) => Tables.part(s, d)
      .filter(col("p_name").like("%widget%") && !col("p_type").like("SMALL%"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), max(col("p_retailprice")).as("max_price"))
      .orderBy(col("p_brand")),
    Some("""SELECT p_brand, COUNT(*) AS n, MAX(p_retailprice) AS max_price
      FROM part WHERE p_name LIKE '%widget%' AND p_type NOT LIKE 'SMALL%'
      GROUP BY p_brand ORDER BY p_brand"""))

  /** TPC-H Q17 shape: correlated aggregate subquery — lineitems below 20%
    * of their part's average quantity. Decimal-exact per-part average. */
  val q26 = QueryDef("q26_small_qty_revenue",
    (s, d) => {
      val l = Tables.lineitem(s, d)
      val perPart = l.groupBy(col("l_partkey").as("pk"))
        .agg((sum(dec(col("l_quantity"))).cast("double") / count(lit(1)))
          .as("avg_qty"))
      l.join(perPart, l("l_partkey") === col("pk"))
        .filter(col("l_quantity") < col("avg_qty") * 0.2)
        .agg(sumd(dec(col("l_extendedprice"))).as("revenue"),
          count(lit(1)).as("n_lines"))
    },
    Some("""SELECT
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_lines
      FROM lineitem l1 WHERE l_quantity < 0.2 * (
        SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
          / COUNT(*)
        FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)"""))

  /** UNION ALL with provenance tag. */
  val q27 = QueryDef("q27_union_all",
    (s, d) => {
      val hi = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
        .select(col("o_orderkey"), lit("high").as("src"))
      val lo = Tables.orders(s, d).filter(col("o_totalprice") < 5000)
        .select(col("o_orderkey"), lit("low").as("src"))
      hi.unionAll(lo)
        .groupBy(col("src")).agg(count(lit(1)).as("n"))
        .orderBy(col("src"))
    },
    Some("""SELECT src, COUNT(*) AS n FROM (
        SELECT o_orderkey, 'high' AS src FROM orders WHERE o_totalprice > 400000
        UNION ALL
        SELECT o_orderkey, 'low' AS src FROM orders WHERE o_totalprice < 5000)
      GROUP BY src ORDER BY src"""))

  /** EXCEPT (set difference, distinct semantics). */
  val q28 = QueryDef("q28_except",
    (s, d) => {
      val o = Tables.orders(s, d)
      val y98 = o.filter(col("o_orderdate") >= lit("1998-01-01") &&
        col("o_orderdate") < lit("1999-01-01")).select(col("o_custkey"))
      val y99 = o.filter(col("o_orderdate") >= lit("1999-01-01") &&
        col("o_orderdate") < lit("2000-01-01")).select(col("o_custkey"))
      y98.except(y99).orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1998-01-01'
          AND o_orderdate < TIMESTAMP '1999-01-01'
      EXCEPT
      SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1999-01-01'
          AND o_orderdate < TIMESTAMP '2000-01-01'
      ORDER BY o_custkey"""))

  /** Date-interval range predicate: lineitems shipped within 30 days of
    * their order date (band join on the join key + range filter). */
  val q29 = QueryDef("q29_ship_within_30d",
    (s, d) => {
      val o = Tables.orders(s, d)
      val l = Tables.lineitem(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey") &&
          l("l_shipdate") >= o("o_orderdate") &&
          l("l_shipdate") < o("o_orderdate") + expr("interval 30 days"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_lines"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n_lines
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        AND l_shipdate >= o_orderdate
        AND l_shipdate < o_orderdate + INTERVAL 30 DAY
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Outer join + COALESCE: revenue per part including zero-sale parts. */
  val q30 = QueryDef("q30_part_revenue_with_zeros",
    (s, d) => {
      val p = Tables.part(s, d)
      val l = Tables.lineitem(s, d)
      val rev = l.groupBy(col("l_partkey"))
        .agg(sumd(revenue(col("l_extendedprice"), col("l_discount")))
          .as("rev"))
      p.join(rev, p("p_partkey") === col("l_partkey"), "left_outer")
        .select(col("p_partkey"), coalesce(col("rev"), lit(0.0)).as("revenue"))
        .orderBy(col("p_partkey"))
    },
    Some("""SELECT p_partkey, COALESCE(rev, 0.0) AS revenue
      FROM part LEFT JOIN (
        SELECT l_partkey,
          CAST(SUM(""" + sqlRevenue + """) AS DOUBLE) AS rev
        FROM lineitem GROUP BY l_partkey) r ON p_partkey = l_partkey
      ORDER BY p_partkey"""))
}
