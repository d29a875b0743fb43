package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables}

/** Fourth tranche: remaining window-function surface — lag/lead,
  * first/last over frames, ntile bucketing, and ordered string
  * aggregation. */
object Relational4 {

  def all: Seq[QueryDef] = Seq(q35, q36, q37, q38)

  /** lag/lead: gap in days between a customer's consecutive orders. */
  val q35 = QueryDef("q35_order_gaps",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .filter(col("o_custkey") < 100)
        .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
        .withColumn("gap_days",
          datediff(col("o_orderdate"), col("prev_date")))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("gap_days"))
        .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_orderdate,
      CAST(date_diff('day', lag(o_orderdate) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        o_orderdate) AS INT) AS gap_days
      FROM orders WHERE o_custkey < 100
      ORDER BY o_custkey, o_orderdate, o_orderkey"""))

  /** first/last over an explicit frame: each order vs its customer's
    * first and latest order price. */
  val q36 = QueryDef("q36_first_last",
    (s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .filter(col("o_custkey") < 100)
        .withColumn("first_price", first(col("o_totalprice")).over(w))
        .withColumn("last_price", last(col("o_totalprice")).over(w))
        .select(col("o_custkey"), col("o_orderkey"), col("first_price"),
          col("last_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },
    Some("""SELECT o_custkey, o_orderkey,
      first_value(o_totalprice) OVER w AS first_price,
      last_value(o_totalprice) OVER w AS last_price
      FROM orders WHERE o_custkey < 100
      WINDOW w AS (PARTITION BY o_custkey
        ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey"""))

  /** ntile quartiles of customers by balance. */
  val q37 = QueryDef("q37_ntile",
    (s, d) => {
      val w = Window.orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d)
        .withColumn("quartile", ntile(4).over(w))
        .groupBy(col("quartile"))
        .agg(count(lit(1)).as("n"),
          min(col("c_acctbal")).as("min_bal"),
          max(col("c_acctbal")).as("max_bal"))
        .orderBy(col("quartile"))
    },
    Some("""SELECT CAST(quartile AS INT) AS quartile, COUNT(*) AS n,
      MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
      FROM (SELECT c_acctbal, ntile(4) OVER (
        ORDER BY c_acctbal DESC, c_custkey) AS quartile FROM customer)
      GROUP BY 1 ORDER BY 1"""))

  /** Ordered string aggregation: nation names per region. */
  val q38 = QueryDef("q38_string_agg",
    (s, d) => {
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d)
      n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(array_join(sort_array(collect_list(col("n_name"))), ",")
          .as("nations"))
        .orderBy(col("r_name"))
    },
    Some("""SELECT r_name,
      string_agg(n_name, ',' ORDER BY n_name) AS nations
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name ORDER BY r_name"""))
}
