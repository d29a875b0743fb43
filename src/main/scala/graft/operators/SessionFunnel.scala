package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Session-scoped funnel — the composition of two individually-proven
  * stages ([[Events]]' gap-sessionization recipe and the funnel's
  * ordered-stage logic) into the metric product teams actually read:
  * WITHIN a browsing session, how often does a view lead to a purchase?
  * The global funnel (`ev_funnel`) credits a purchase days after the
  * view; the session funnel only counts conversion inside one
  * uninterrupted visit — the difference IS the metric (deferred vs
  * immediate intent).
  *
  * Stage semantics: a session converts iff its first purchase is
  * STRICTLY after its first view (same instant excluded — the
  * `ev_funnel` rule at session granularity; first-per-type via `min`
  * over exact timestamps).
  *
  * Plan shape: the sessionize recipe's lag → boundary-flag → running
  * sum (two O(1)-frame windows per user), then one (user, session)
  * aggregation and a global rollup — session count is bounded by event
  * count, every stage key-partitioned; integer counts end to end, the
  * conversion rate is the ONE IEEE division. */
object SessionFunnel {

  def all: Seq[QueryDef] = Seq(sessionFunnel)

  val sessionFunnel = QueryDef("ev_session_funnel",
    (s, d) => {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val sess = Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1L)
            .otherwise(0L))
        .withColumn("session_id", sum(col("new_sess")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val perSession = sess.groupBy(col("user_id"), col("session_id"))
        .agg(min(when(col("event_type") === "view", col("ts"))).as("fv"),
          min(when(col("event_type") === "purchase", col("ts"))).as("fp"))
      perSession.agg(
        count(lit(1)).as("n_sessions"),
        sum(when(col("fv").isNotNull, 1L).otherwise(0L)).as("n_with_view"),
        sum(when(col("fp") > col("fv"), 1L).otherwise(0L)).as("n_converted"))
        .select(col("n_sessions"), col("n_with_view"), col("n_converted"),
          // no-view corpora yield NULL, not a zero division
          when(col("n_with_view") > 0L,
            col("n_converted").cast("double") /
              col("n_with_view").cast("double")).as("session_cvr"))
    },
    Some("""WITH marked AS (SELECT user_id, event_id, ts, event_type,
        CASE WHEN lag(ts) OVER w IS NULL
          OR date_diff('second', lag(ts) OVER w, ts) > 1800
          THEN 1 ELSE 0 END AS new_sess
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (SELECT user_id, event_type, ts,
        SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked),
      per_session AS (SELECT user_id, session_id,
        MIN(CASE WHEN event_type = 'view' THEN ts END) AS fv,
        MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
        FROM sess GROUP BY 1, 2)
      SELECT COUNT(*) AS n_sessions,
        CAST(SUM(CASE WHEN fv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_with_view,
        CAST(SUM(CASE WHEN fp > fv THEN 1 ELSE 0 END) AS BIGINT)
          AS n_converted,
        CASE WHEN SUM(CASE WHEN fv IS NOT NULL THEN 1 ELSE 0 END) > 0 THEN
          CAST(SUM(CASE WHEN fp > fv THEN 1 ELSE 0 END) AS DOUBLE) /
            CAST(SUM(CASE WHEN fv IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        END AS session_cvr
      FROM per_session"""))
}
