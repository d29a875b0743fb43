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

  /** ntile quartiles of customers by balance — WITHOUT the global
    * unpartitioned window `ntile(4)` implies (one task sorting the whole
    * customer table at scale). Instead the global 0-based rank under
    * (c_acctbal DESC, c_custkey) is computed with the same two-level
    * prefix-sum decomposition as [[graft.operators.Packing]]:
    * fixed-width buckets on the sort key, per-bucket counts whose
    * running offsets take the only serial window (a ~110-row relation —
    * the balance range / 100, never the base table), and an intra-bucket
    * `row_number` PARTITIONED by bucket. The ntile bucket then follows
    * arithmetically from (rank, n): the first `n % 4` quartiles hold
    * `n DIV 4 + 1` rows, the rest `n DIV 4` — exactly Spark's and
    * DuckDB's ntile sizing, ties included (value-boundary comparison
    * alone could not split duplicate balances across a quartile edge). */
  val q37 = QueryDef("q37_ntile",
    (s, d) => {
      // ascending bucket key = descending balance; equal balances share
      // a bucket, so the custkey tie-break stays intra-bucket.
      val cust = Tables.customer(s, d)
        .select(col("c_custkey"), col("c_acctbal"))
        .withColumn("bkt",
          floor(col("c_acctbal").cast("double") / lit(-100.0)).cast("long"))
      // Bucket offsets via a broadcast non-equi self-join over the
      // ~110-row bucket relation — O(B²) on a tiny B beats even a
      // single-partition serial window here, and q37's plan ends up with
      // zero unpartitioned windows of any size.
      val bcounts = cust.groupBy(col("bkt"))
        .agg(count(lit(1)).as("bc"))
      val bucketOffsets = bcounts.as("a")
        .join(broadcast(bcounts.as("b")),
          col("a.bkt") > col("b.bkt"), "left_outer")
        .groupBy(col("a.bkt").as("bkt"))
        .agg(coalesce(sum(col("b.bc")), lit(0L)).as("boff"))
      val tot = cust.agg(count(lit(1)).as("n"))
      val wIntra = Window.partitionBy(col("bkt"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      cust.join(broadcast(bucketOffsets), "bkt")
        .withColumn("r", col("boff") + row_number().over(wIntra) - lit(1L))
        .crossJoin(broadcast(tot))
        .withColumn("qs", expr("n DIV 4"))
        .withColumn("rem", col("n") % 4)
        .withColumn("quartile",
          (when(col("r") < col("rem") * (col("qs") + 1),
            expr("r DIV (qs + 1)"))
            .otherwise(col("rem") +
              expr("(r - rem * (qs + 1)) DIV greatest(qs, 1L)"))
            + 1).cast("int"))
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
