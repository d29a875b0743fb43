package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Num, QueryDef, Tables}

/** Round-2 relational breadth: explicit GROUPING SETS, left-semi join,
  * RANGE-frame windows, and a non-equi band (range) join.
  *
  * Scale stance: grouping sets plan as a single expand+hash-agg pass (one
  * shuffle); the semi join broadcasts nothing here but at 100 TB the orders
  * side is the probe and Catalyst plans a shuffled semi-hash-join that
  * never materializes matched rows; the band join broadcasts a 10-row
  * bound table so the scan side streams through a nested-loop probe with
  * no shuffle at all.
  */
object Relational5 {

  def all: Seq[QueryDef] =
    Seq(groupingSetsQ, semiJoin, movingRange, bandJoin, fullOuter, unpivot)

  /** GROUPING SETS ((flag,status),(flag),()) — finer-than-rollup control
    * over which aggregate combinations materialize. */
  val groupingSetsQ = QueryDef("q40_grouping_sets",
    (s, d) => Tables.lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_returnflag")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        Num.sumd(Num.dec(col("l_quantity"))).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first),
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""))

  /** Left-semi join: customers with at least one 1995 order, counted per
    * market segment. Semi joins stream the probe side and keep no payload
    * from the build side — the cheapest existence check at scale. */
  val semiJoin = QueryDef("q41_semi_join",
    (s, d) => {
      val cust = Tables.customer(s, d)
      val o95 = Tables.orders(s, d)
        .filter(col("o_orderdate").between("1995-01-01", "1995-12-31"))
      cust.join(o95, cust("c_custkey") === o95("o_custkey"), "left_semi")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_active"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment, COUNT(*) AS n_active FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31')
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** Trailing-7-day revenue via a true RANGE frame over a day index —
    * unlike a ROWS frame this is correct across calendar gaps. */
  val movingRange = QueryDef("q42_moving_range",
    (s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(col("o_orderdate"))
        .agg(Num.sumd(Num.dec(col("o_totalprice"))).as("day_rev"))
        .withColumn("day_idx",
          datediff(col("o_orderdate"), lit("1992-01-01")).cast("long"))
      // The frame runs over DAILY aggregates — bounded by the calendar
      // (~2.4 k rows for 1992–98) regardless of data volume, so a single
      // partition is correct at any scale (declared in
      // CatalogPlanSweepSpec's serial-window allowlist).
      val w = Window.orderBy(col("day_idx")).rangeBetween(-6, 0)
      daily.withColumn("rev_7d", sum(col("day_rev")).over(w))
        .select(col("o_orderdate"), col("day_rev"), col("rev_7d"))
        .orderBy(col("o_orderdate"))
    },
    Some("""WITH daily AS (SELECT o_orderdate,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS day_rev,
        datediff('day', DATE '1992-01-01', o_orderdate) AS day_idx
      FROM orders GROUP BY o_orderdate)
      SELECT o_orderdate, day_rev,
        SUM(day_rev) OVER (ORDER BY day_idx
          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS rev_7d
      FROM daily ORDER BY o_orderdate"""))

  /** Full-outer join of two independent daily aggregates (orders placed
    * vs lineitems shipped) — days present on either side survive with
    * zeroed gaps. */
  val fullOuter = QueryDef("q46_full_outer",
    (s, d) => {
      val placed = Tables.orders(s, d)
        .groupBy(col("o_orderdate").as("day"))
        .agg(count(lit(1)).as("n_placed"))
      val shipped = Tables.lineitem(s, d)
        .groupBy(col("l_shipdate").as("day"))
        .agg(count(lit(1)).as("n_shipped"))
      placed.join(shipped, Seq("day"), "full_outer")
        .select(col("day"),
          coalesce(col("n_placed"), lit(0L)).as("n_placed"),
          coalesce(col("n_shipped"), lit(0L)).as("n_shipped"))
        .orderBy(col("day"))
    },
    Some("""SELECT COALESCE(p.day, s.day) AS day,
        COALESCE(n_placed, 0) AS n_placed,
        COALESCE(n_shipped, 0) AS n_shipped
      FROM (SELECT o_orderdate AS day, COUNT(*) AS n_placed
            FROM orders GROUP BY 1) p
      FULL OUTER JOIN (SELECT l_shipdate AS day, COUNT(*) AS n_shipped
            FROM lineitem GROUP BY 1) s
      ON p.day = s.day ORDER BY day"""))

  /** Unpivot (wide→long): per-returnflag quantity sums by status columns,
    * melted back to rows with stack(). */
  val unpivot = QueryDef("q47_unpivot",
    (s, d) => Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        Num.sumd(when(col("l_linestatus") === "F", Num.dec(col("l_quantity"))))
          .as("qty_f"),
        Num.sumd(when(col("l_linestatus") === "O", Num.dec(col("l_quantity"))))
          .as("qty_o"))
      .selectExpr("l_returnflag",
        "stack(2, 'F', qty_f, 'O', qty_o) AS (l_linestatus, qty)")
      .filter(col("qty").isNotNull)
      .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""WITH wide AS (SELECT l_returnflag,
        CAST(SUM(CASE WHEN l_linestatus = 'F'
          THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_f,
        CAST(SUM(CASE WHEN l_linestatus = 'O'
          THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_o
      FROM lineitem GROUP BY 1)
      SELECT l_returnflag, l_linestatus, qty FROM (
        SELECT l_returnflag, 'F' AS l_linestatus, qty_f AS qty FROM wide
        UNION ALL
        SELECT l_returnflag, 'O' AS l_linestatus, qty_o AS qty FROM wide)
      WHERE qty IS NOT NULL
      ORDER BY l_returnflag, l_linestatus"""))

  /** Non-equi band join: lineitems classified into price bands by a
    * broadcast interval table (the range-join shape; with a 10-row bound
    * side it plans as broadcast nested loop — zero shuffle on the fact
    * side). Summing the banded revenue in decimal keeps the oracle exact. */
  val bandJoin = QueryDef("q43_band_join",
    (s, d) => {
      val bands = s.range(0, 12).select(
        col("id").cast("int").as("band"),
        (col("id") * 10000).cast("double").as("lo"),
        ((col("id") + 1) * 10000).cast("double").as("hi"))
      Tables.lineitem(s, d)
        .join(broadcast(bands),
          col("l_extendedprice") >= col("lo") &&
            col("l_extendedprice") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n"),
          Num.sumd(Num.revenue(col("l_extendedprice"), col("l_discount")))
            .as("revenue"))
        .orderBy(col("band"))
    },
    Some(s"""SELECT band, COUNT(*) AS n,
      CAST(SUM(${Num.sqlRevenue}) AS DOUBLE) AS revenue
      FROM lineitem JOIN (SELECT CAST(i AS INT) AS band, i*10000.0 AS lo,
        (i+1)*10000.0 AS hi FROM range(0,12) r(i)) b
      ON l_extendedprice >= lo AND l_extendedprice < hi
      GROUP BY band ORDER BY band"""))
}
