package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Corpus/table management operators: one-pass column profiling (the
  * schema-drift check every ingestion pipeline runs before accepting a
  * batch) and the deterministic epoch shuffle that fixes a reproducible
  * global training order.
  *
  * Scale stance: profiling unpivots first (`stack`) so the whole profile
  * is ONE shuffle keyed by column name — no per-column jobs, no
  * multi-count-distinct Expand blowup; the epoch shuffle is a
  * range-partitioned global sort on a hash key (Spark samples range
  * boundaries, every partition sorts independently — no single-task
  * bottleneck, unlike a global row_number window).
  */
object Profiling {

  def all: Seq[QueryDef] = Seq(profileColumns, shuffleEpoch, dqChecks)

  /** Data-quality constraint suite (the Deequ/dbt-test shape): the
    * acceptance checks an ingestion pipeline runs on every batch before
    * publishing it — null keys, key uniqueness, referential integrity,
    * and value-range rules — evaluated as ONE row of violation counts so
    * the gate is a single cheap assert (all zeros ⇒ publish).
    *
    * Plan shape: the null/range rules fold into one aggregate over one
    * scan; uniqueness is a count-vs-distinct-count on the composite key
    * (no self-join); referential integrity is a left-anti join against
    * the parent's key set — each the cheapest spelling of its rule, and
    * every one map-side combinable or semi-join-shaped at 100 TB. */
  val dqChecks = QueryDef("dq_checks",
    (s, d) => {
      val li = Tables.lineitem(s, d)
      val base = li.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("l_orderkey").isNull, 1L).otherwise(0L))
          .as("null_orderkey"),
        sum(when(col("l_quantity") <= 0 || col("l_quantity") > 50, 1L)
          .otherwise(0L)).as("bad_quantity"),
        sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L))
          .as("bad_price"),
        sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L)
          .otherwise(0L)).as("bad_discount"),
        (count(lit(1)) - countDistinct(col("l_orderkey"), col("l_linenumber")))
          .as("dup_keys"))
      val orphans = li.select(col("l_orderkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey").as("l_orderkey")),
          Seq("l_orderkey"), "left_anti")
        .agg(count(lit(1)).as("orphan_lineitems"))
      base.crossJoin(orphans)
    },
    Some("""SELECT
        (SELECT COUNT(*) FROM lineitem) AS n_rows,
        (SELECT CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END)
          AS BIGINT) FROM lineitem) AS null_orderkey,
        (SELECT CAST(SUM(CASE WHEN l_quantity <= 0 OR l_quantity > 50
          THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem) AS bad_quantity,
        (SELECT CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
          AS BIGINT) FROM lineitem) AS bad_price,
        (SELECT CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1
          THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem) AS bad_discount,
        (SELECT COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
          FROM lineitem) AS dup_keys,
        (SELECT COUNT(*) FROM lineitem l
          WHERE NOT EXISTS (SELECT 1 FROM orders o
            WHERE o.o_orderkey = l.l_orderkey)) AS orphan_lineitems"""))

  private val ProfiledCols = Seq(
    "l_orderkey", "l_partkey", "l_suppkey",
    "l_quantity", "l_extendedprice", "l_discount")

  /** Numeric column profile of `lineitem`: per column, row/non-null/
    * distinct counts and min/max, all from one unpivoted pass. Values are
    * cast to double before profiling — exact for every profiled column
    * (integer keys ≪ 2^53; money columns carry ≤ 2 decimals), so distinct
    * counts equal the source-typed ones. */
  val profileColumns = QueryDef("profile_columns",
    (s, d) => {
      val stackArgs = ProfiledCols
        .map(c => s"'$c', CAST($c AS DOUBLE)").mkString(", ")
      Tables.lineitem(s, d)
        .select(expr(
          s"stack(${ProfiledCols.length}, $stackArgs) AS (col_name, value)"))
        .groupBy(col("col_name"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("value")).as("n_nonnull"),
          countDistinct(col("value")).as("n_distinct"),
          min(col("value")).as("min_value"),
          max(col("value")).as("max_value"))
        .orderBy(col("col_name"))
    },
    Some {
      val branches = ProfiledCols.map(c =>
        s"SELECT '$c' AS col_name, CAST($c AS DOUBLE) AS value FROM lineitem")
        .mkString("\n        UNION ALL ")
      s"""WITH u AS (
        $branches)
      SELECT col_name, COUNT(*) AS n_rows, COUNT(value) AS n_nonnull,
        COUNT(DISTINCT value) AS n_distinct,
        MIN(value) AS min_value, MAX(value) AS max_value
      FROM u GROUP BY col_name ORDER BY col_name"""
    })

  /** Deterministic epoch shuffle: the corpus in the reproducible
    * pseudo-random order training epoch 42 would read it. The shuffle key
    * is a multiplicative hash of doc_id (reduced mod 1e9+7 BEFORE the
    * multiply, so the product stays ≤ ~2.7e18 < 2^63 for any doc_id —
    * overflow-free in both engines); ordering by it is a range-partitioned
    * distributed sort, and the (key, doc_id) pair is a total order, so
    * the emitted permutation is identical on any cluster layout. */
  val shuffleEpoch = QueryDef("shuffle_epoch",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"),
        expr("((doc_id % 1000000007) * 2654435761 + 42) % 1000000007")
          .as("shuffle_key"))
      .orderBy(col("shuffle_key"), col("doc_id")),
    Some("""SELECT doc_id,
        ((doc_id % 1000000007) * 2654435761 + 42) % 1000000007 AS shuffle_key
      FROM documents ORDER BY shuffle_key, doc_id"""))
}
