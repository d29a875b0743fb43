package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Tables}

/** As-of join — the canonical "operator Spark lacks" (time-series point
  * lookup: for each left row, the latest right row with `right.ts <=
  * left.ts` within a key). Implemented by composition (preference (a) in
  * the engine's design rules) rather than a custom SparkPlan: union both
  * sides tagged, sort within key by (ts, side), and carry the last seen
  * right value forward with `last(..., ignoreNulls)` over a running
  * window. One shuffle on the key, no range-condition join explosion —
  * the plan a hand-written AsOfJoinExec would produce anyway.
  *
  * DuckDB's native ASOF JOIN provides the oracle.
  */
object AsOfJoin {

  def all: Seq[QueryDef] = Seq(evAsofBusyHour, pitFeatures)

  /** Point-in-time feature join — the feature-store primitive behind
    * every leakage-safe training set: for each LABEL event (a
    * `purchase`), attach the latest value of each feature stream
    * (`click`, `view`) for the SAME user from STRICTLY BEFORE the label
    * timestamp. Strictness is the whole point: an observation at the
    * label's exact instant is information the model would not have had
    * at decision time, so the sort order (ts, then labels BEFORE
    * same-instant observations) excludes it from the running carry —
    * train/serve skew by construction zero.
    *
    * Shape: one union of tagged label + deduped observation rows, one
    * window partitioned by user carrying each feature column with
    * `last(..., ignoreNulls)` — the [[evAsofBusyHour]] composition
    * widened to multiple feature columns in a single pass (one shuffle
    * keyed by user regardless of feature count; at 100 TB the user key
    * gives millions-wide parallelism and each partition is one user's
    * short history). Observations are pre-deduped per
    * (user, type, ts) with MAX so both engines carry identical values.
    *
    * DuckDB oracle: the identical union + IGNORE NULLS window spelling
    * (its native ASOF JOIN is inclusive — the strict-before tie-break
    * is exactly what the explicit spelling pins down). */
  val pitFeatures = QueryDef("ev_pit_features",
    (s, d) => pitFeaturesOf(Tables.events(s, d)),
    Some(pitOracleSql))

  /** [[pitFeatures]]'s core over an arbitrary events frame — the library
    * entry point StreamingSpec-style fixtures drive. */
  def pitFeaturesOf(ev: DataFrame): DataFrame = {
      val obs = ev
        .filter(col("event_type").isInCollection(Seq("click", "view")) &&
          col("value").isNotNull)
        .groupBy(col("user_id"), col("event_type"), col("ts"))
        .agg(max(col("value")).as("v"))
      val labels = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val series = labels
        .select(col("user_id"), col("ts"), lit(0).as("is_label"),
          col("event_id"),
          lit(null).cast("double").as("cv"), lit(null).cast("double").as("vv"))
        .unionByName(obs.select(col("user_id"), col("ts"),
          lit(1).as("is_label"), lit(-1L).as("event_id"),
          when(col("event_type") === "click", col("v")).as("cv"),
          when(col("event_type") === "view", col("v")).as("vv")))
      val wl = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("is_label"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      series
        .withColumn("last_click", last(col("cv"), ignoreNulls = true).over(wl))
        .withColumn("last_view", last(col("vv"), ignoreNulls = true).over(wl))
        .filter(col("is_label") === 0)
        .select(col("event_id"), col("user_id"), col("ts").as("label_ts"),
          col("last_click"), col("last_view"))
        .orderBy(col("event_id"))
  }

  // def, not val: referenced by pitFeatures above its definition point
  private def pitOracleSql = """WITH obs AS (SELECT user_id, event_type, ts, MAX(value) AS v
        FROM events
        WHERE event_type IN ('click', 'view') AND value IS NOT NULL
        GROUP BY 1, 2, 3),
      labels AS (SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'purchase'),
      series AS (
        SELECT user_id, ts, 0 AS is_label, event_id,
          CAST(NULL AS DOUBLE) AS cv, CAST(NULL AS DOUBLE) AS vv
        FROM labels
        UNION ALL
        SELECT user_id, ts, 1 AS is_label, CAST(-1 AS BIGINT) AS event_id,
          CASE WHEN event_type = 'click' THEN v END AS cv,
          CASE WHEN event_type = 'view' THEN v END AS vv
        FROM obs),
      w AS (SELECT user_id, ts, is_label, event_id,
          LAST_VALUE(cv IGNORE NULLS) OVER (PARTITION BY user_id
            ORDER BY ts, is_label, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click,
          LAST_VALUE(vv IGNORE NULLS) OVER (PARTITION BY user_id
            ORDER BY ts, is_label, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_view
        FROM series)
      SELECT event_id, user_id, ts AS label_ts, last_click, last_view
      FROM w WHERE is_label = 0 ORDER BY event_id"""

  /** For each left row, attach `valCol` from the latest right row with
    * rightTs <= leftTs, matching on `key`. Left rows with no prior right
    * row get null. */
  def asof(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, valCol: String): DataFrame = {
    val l = left
      .withColumn("_ts", col(leftTs))
      .withColumn("_side", lit(1))
      .withColumn("_val", lit(null).cast(right.schema(valCol).dataType))
    val r = right.select(col(key), col(rightTs).as("_ts"),
      lit(0).as("_side"), col(valCol).as("_val"))
    // right rows sort before left rows at equal ts (side 0 < 1) → `<=`
    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true) // right fills left cols with null
      .withColumn("_asof", last(col("_val"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_ts", "_side", "_val")
      .withColumnRenamed("_asof", s"asof_$valCol")
  }

  /** Events as-of joined to the most recent prior "busy hour" (hours with
    * >= 30 events of that type): for each event, how many events its
    * type's last busy hour had. */
  val evAsofBusyHour = QueryDef("ev_asof_busy_hour",
    (s, d) => {
      val ev = Tables.events(s, d)
      val busy = ev.groupBy(date_trunc("hour", col("ts")).as("hts"),
          col("event_type"))
        .agg(count(lit(1)).as("busy_n"))
        .filter(col("busy_n") >= 30)
      val joined = asof(
        ev.select(col("event_id"), col("event_type"), col("ts")),
        busy, key = "event_type", leftTs = "ts", rightTs = "hts",
        valCol = "busy_n")
      joined
        .groupBy(col("event_type"))
        .agg(count(col("asof_busy_n")).as("n_with_prior_busy"),
          sum(col("asof_busy_n")).as("sum_busy_n"))
        .orderBy(col("event_type"))
    },
    Some("""WITH busy AS (
        SELECT date_trunc('hour', ts) AS hts, event_type, COUNT(*) AS busy_n
        FROM events GROUP BY 1, 2 HAVING COUNT(*) >= 30)
      SELECT e.event_type,
        COUNT(b.busy_n) AS n_with_prior_busy,
        CAST(SUM(b.busy_n) AS BIGINT) AS sum_busy_n
      FROM events e
      ASOF LEFT JOIN busy b
        ON e.event_type = b.event_type AND e.ts >= b.hts
      GROUP BY e.event_type ORDER BY e.event_type"""))
}
