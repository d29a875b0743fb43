package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Num, Tables}

/** Third tranche: grouping sets (CUBE), portable math functions, array
  * aggregation over embedding vectors, and a pivot-style crosstab. */
object Relational3 {
  import Num._

  def all: Seq[QueryDef] = Seq(q31, q32, q33, q34)

  /** CUBE over two dimensions (all four grouping sets). */
  val q31 = QueryDef("q31_cube",
    (s, d) => Tables.lineitem(s, d)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), sumd(dec(col("l_quantity"))).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first),
    Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  /** Portable math functions (IEEE-exact only: abs/floor/ceil/sqrt/round). */
  val q32 = QueryDef("q32_math_funcs",
    (s, d) => Tables.customer(s, d)
      .select(col("c_custkey"),
        abs(col("c_acctbal")).as("abs_bal"),
        floor(col("c_acctbal")).cast("double").as("floor_bal"),
        ceil(col("c_acctbal")).cast("double").as("ceil_bal"),
        sqrt(abs(col("c_acctbal"))).as("sqrt_bal"),
        pow(col("c_nationkey").cast("double"), 2).as("nk_sq"))
      .orderBy(col("c_custkey")),
    Some("""SELECT c_custkey, abs(c_acctbal) AS abs_bal,
      CAST(floor(c_acctbal) AS DOUBLE) AS floor_bal,
      CAST(ceil(c_acctbal) AS DOUBLE) AS ceil_bal,
      sqrt(abs(c_acctbal)) AS sqrt_bal,
      pow(CAST(c_nationkey AS DOUBLE), 2) AS nk_sq
      FROM customer ORDER BY c_custkey"""))

  /** Array functions over embeddings: per-vector min/max/mean (exact fold
    * in double, index order). */
  val q33 = QueryDef("q33_array_stats",
    (s, d) => Tables.embeddings(s, d)
      .select(col("vec_id"),
        array_min(col("embedding")).cast("double").as("vmin"),
        array_max(col("embedding")).cast("double").as("vmax"),
        (expr("aggregate(embedding, cast(0.0 as double), (a, x) -> a + cast(x as double))")
          / size(col("embedding"))).as("vmean"))
      .orderBy(col("vec_id")),
    Some("""SELECT vec_id,
      CAST(list_min(embedding) AS DOUBLE) AS vmin,
      CAST(list_max(embedding) AS DOUBLE) AS vmax,
      list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))
        / len(embedding) AS vmean
      FROM embeddings ORDER BY vec_id"""))

  /** Pivot-style crosstab: events per user bucket × event type. */
  val q34 = QueryDef("q34_pivot_counts",
    (s, d) => Tables.events(s, d)
      .withColumn("bucket", (col("user_id") % 10).cast("int"))
      .groupBy(col("bucket"))
      .agg(
        count(when(col("event_type") === "click", 1)).as("clicks"),
        count(when(col("event_type") === "view", 1)).as("views"),
        count(when(col("event_type") === "purchase", 1)).as("purchases"),
        count(when(col("event_type") === "signup", 1)).as("signups"),
        count(when(col("event_type") === "error", 1)).as("errors"))
      .orderBy(col("bucket")),
    Some("""SELECT CAST(user_id % 10 AS INT) AS bucket,
      COUNT(*) FILTER (event_type = 'click') AS clicks,
      COUNT(*) FILTER (event_type = 'view') AS views,
      COUNT(*) FILTER (event_type = 'purchase') AS purchases,
      COUNT(*) FILTER (event_type = 'signup') AS signups,
      COUNT(*) FILTER (event_type = 'error') AS errors
      FROM events GROUP BY 1 ORDER BY 1"""))
}
