package graft.queries

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.streaming.EventStreams

/** Batch/stream unification exemplar: the *same* transformation
  * (EventStreams.windowedCounts) that runs under `readStream` in
  * StreamingSpec runs here over the batch events table and is
  * oracle-checked. `window('1 hour')` starts are epoch-aligned, i.e.
  * identical to date_trunc('hour'). */
object StreamingQueries {

  def all: Seq[QueryDef] = Seq(windowedCounts, streamDedup)

  /** Streaming-shaped dedup (earliest event per user/type) run over the
    * batch table — same transformation a readStream would run; the DuckDB
    * oracle spells the identical struct-min as a window top-1. */
  val streamDedup = QueryDef("stream_dedup",
    (s, d) => EventStreams.earliestPerKey(Tables.events(s, d))
      .orderBy(col("user_id"), col("event_type")),
    Some("""SELECT user_id, event_type, ts AS first_ts,
        event_id AS first_event_id FROM (
        SELECT user_id, event_type, ts, event_id, ROW_NUMBER() OVER (
          PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
        FROM events)
      WHERE rn = 1 ORDER BY user_id, event_type"""))

  val windowedCounts = QueryDef("stream_windowed_counts",
    (s, d) => EventStreams.windowedCounts(Tables.events(s, d))
      .orderBy(col("window_start"), col("event_type")),
    Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))
}
