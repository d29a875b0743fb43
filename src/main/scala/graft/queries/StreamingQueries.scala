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

  def all: Seq[QueryDef] = Seq(windowedCounts)

  val windowedCounts = QueryDef("stream_windowed_counts",
    (s, d) => EventStreams.windowedCounts(Tables.events(s, d))
      .orderBy(col("window_start"), col("event_type")),
    Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))
}
