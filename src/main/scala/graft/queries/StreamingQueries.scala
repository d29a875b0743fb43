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

  def all: Seq[QueryDef] = Seq(windowedCounts, streamDedup, streamPathTrigrams)

  /** The stateful-stream journey miner run over the batch table — the
    * SAME `flatMapGroupsWithState` transformation StreamingSpec drives
    * under MemoryStream microbatches executes here in batch mode (state
    * lives for the single batch), so the oracle hash-checks the exact
    * code path production streaming runs. In-batch processing order is
    * (ts-millis, event_id); per-user same-millisecond collisions don't
    * exist in the corpus (checked through sf0.1), so this equals the
    * batch window's (ts, event_id) order. The rollup over emitted
    * trigram rows is the \|types\|³-bounded aggregation, full relation
    * (no top-20) so every emitted row is oracle-visible. */
  val streamPathTrigrams = QueryDef("stream_path_trigrams",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[EventStreams.EvId]
      EventStreams.pathTrigrams(ev)
        .groupBy(col("step1"), col("step2"), col("step3"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("step1"), col("step2"), col("step3"))
    },
    Some("""WITH p AS (SELECT
        event_type AS step1,
        lead(event_type, 1) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS step2,
        lead(event_type, 2) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS step3
        FROM events)
      SELECT step1, step2, step3, COUNT(*) AS n
      FROM p WHERE step3 IS NOT NULL
      GROUP BY 1, 2, 3 ORDER BY step1, step2, step3"""))

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
