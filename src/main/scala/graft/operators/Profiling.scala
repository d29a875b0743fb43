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

  def all: Seq[QueryDef] =
    Seq(profileColumns, shuffleEpoch, dqChecks, profileDrift)

  /** Snapshot drift report (PSI — population stability index, the
    * standard ingestion-monitoring statistic): compare the distribution
    * of two corpus snapshots (even doc_ids standing in for yesterday's
    * ingest, odd for today's) over two document features — token-length
    * bucket and language — and emit one add-1-smoothed PSI term per
    * (feature, value). The monitor alerts when Σ psi_term per feature
    * crosses its threshold; terms are emitted unaggregated so the report
    * also names WHICH values drifted (the actionable part).
    *
    * Plan shape: one scan, a two-branch union of (feature, value) rows,
    * one hash aggregation, and a feature-level totals join AQE broadcasts
    * (≤ #features rows) — linear at any corpus size. Float discipline:
    * p_old/p_new are single divisions of exact integers; the term is one
    * subtract, one divide, one `math_ln`, one multiply — deterministic,
    * hash-exact vs the oracle. */
  /** The drift report over any docs frame carrying (text, lang, is_old)
    * — factored out so the zero-drift property (identical snapshots ⇒
    * every psi_term exactly 0.0) is testable on a constructed corpus. */
  private[graft] def driftOf(docsIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      graft.functions.HashExpressions.register(docsIn.sparkSession)
      import graft.functions.TextFunctions.tokens
      val docs = docsIn
        .withColumn("n", size(tokens(col("text"))).cast("long"))
        .withColumn("len_b", expr("CAST(least(n DIV 32, 19) AS STRING)"))
      val feats = docs
        .select(col("is_old"), lit("len_bucket").as("feature"),
          col("len_b").as("fval"))
        .unionAll(docs.select(col("is_old"), lit("lang").as("feature"),
          col("lang").as("fval")))
      val counts = feats.groupBy(col("feature"), col("fval"))
        .agg(sum(when(col("is_old"), 1L).otherwise(0L)).as("c_old"),
          sum(when(col("is_old"), 0L).otherwise(1L)).as("c_new"))
      val totals = counts.groupBy(col("feature"))
        .agg(sum(col("c_old")).as("n_old"), sum(col("c_new")).as("n_new"),
          count(lit(1)).as("k"))
      counts.join(totals, "feature")
        .withColumn("p_old",
          expr("CAST(c_old + 1 AS DOUBLE) / CAST(n_old + k AS DOUBLE)"))
        .withColumn("p_new",
          expr("CAST(c_new + 1 AS DOUBLE) / CAST(n_new + k AS DOUBLE)"))
        .withColumn("psi_term",
          (col("p_old") - col("p_new")) * expr("math_ln(p_old / p_new)"))
        .select(col("feature"), col("fval"), col("c_old"), col("c_new"),
          col("p_old"), col("p_new"), col("psi_term"))
        .orderBy(col("feature"), col("fval"))
  }

  val profileDrift = QueryDef("profile_drift",
    (s, d) => driftOf(Tables.documents(s, d)
      .withColumn("is_old", col("doc_id") % 2 === 0)),
    Some("""WITH docs AS (SELECT doc_id, doc_id % 2 = 0 AS is_old,
          CAST(LEAST(len(string_split(text, ' ')) // 32, 19) AS VARCHAR)
            AS len_b,
          lang FROM documents),
      feats AS (
        SELECT is_old, 'len_bucket' AS feature, len_b AS fval FROM docs
        UNION ALL SELECT is_old, 'lang', lang FROM docs),
      counts AS (SELECT feature, fval,
          CAST(SUM(CASE WHEN is_old THEN 1 ELSE 0 END) AS BIGINT) AS c_old,
          CAST(SUM(CASE WHEN is_old THEN 0 ELSE 1 END) AS BIGINT) AS c_new
        FROM feats GROUP BY feature, fval),
      totals AS (SELECT feature, CAST(SUM(c_old) AS BIGINT) AS n_old,
          CAST(SUM(c_new) AS BIGINT) AS n_new, COUNT(*) AS k
        FROM counts GROUP BY feature)
      SELECT feature, fval, c_old, c_new,
        CAST(c_old + 1 AS DOUBLE) / CAST(n_old + k AS DOUBLE) AS p_old,
        CAST(c_new + 1 AS DOUBLE) / CAST(n_new + k AS DOUBLE) AS p_new,
        (CAST(c_old + 1 AS DOUBLE) / CAST(n_old + k AS DOUBLE) -
          CAST(c_new + 1 AS DOUBLE) / CAST(n_new + k AS DOUBLE)) *
          ln((CAST(c_old + 1 AS DOUBLE) / CAST(n_old + k AS DOUBLE)) /
            (CAST(c_new + 1 AS DOUBLE) / CAST(n_new + k AS DOUBLE)))
          AS psi_term
      FROM counts JOIN totals USING (feature)
      ORDER BY feature, fval"""))

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
