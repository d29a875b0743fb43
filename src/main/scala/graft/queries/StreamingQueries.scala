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

  def all: Seq[QueryDef] = Seq(windowedCounts, streamDedup, streamPathTrigrams,
    streamAttribution, streamLastTouch, streamHeavyHitters, streamCusum)

  /** The GroupState CUSUM monitor run over the batch table (r14 verdict
    * item 8 — the sixth streaming twin behind the oracle gate): the SAME
    * `EventStreams.cusumMonitor` recurrence StreamingSpec proves across
    * a microbatch split executes here in batch mode, per-minute rows and
    * all. A monitor takes its calibration from a training window, not
    * the future; the batch-cataloged twin feeds it the full series'
    * exact integer power sums (nRef, s1Ref, s2Ref — THREE scalars of
    * bounded driver state, the k×D-centroid class), which makes the
    * emitted S_i relation deterministic and lets the oracle spell the
    * identical linearized recurrence (prefix sum + running min —
    * `ev_cusum_changepoint`'s machinery with the per-type stats replaced
    * by the monitor's shared reference triple). S stays in BIGINT
    * (|P| ≤ 21·nRef·Σcnt ≪ 2^63 at any bench SF); the alarm square is
    * HUGEINT/BigInt on the respective engines, emitted as the 0/1
    * BIGINT flag convention (`in_core` precedent). s2Ref = Σcnt² is
    * summed in DECIMAL(38,0) and gated back to BIGINT with a loud
    * raise_error (the Unigram `costed` pattern, r15 ADVICE): Spark's
    * non-ANSI Long multiply/sum would wrap silently at extreme
    * per-minute counts where the DuckDB oracle's BIGINT multiply
    * errors loudly — the envelope must fail loudly on BOTH engines. */
  val streamCusum = QueryDef("stream_cusum",
    (s, d) => {
      import s.implicits._
      val byMin = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("m"))
        .agg(count(lit(1)).as("cnt"))
      val ref = byMin.agg(count(lit(1)).as("n"), sum(col("cnt")).as("s1"),
          sum(col("cnt").cast("decimal(38,0)") * col("cnt")).as("s2d"))
        .withColumn("s2", expr(
          s"""CASE WHEN s2d > CAST(${Long.MaxValue} AS DECIMAL(38,0)) THEN
            CAST(raise_error(
              'stream_cusum: sum(cnt^2) exceeds BIGINT - rescale minute counts')
              AS BIGINT)
          ELSE CAST(s2d AS BIGINT) END"""))
        .select(col("n"), col("s1"), col("s2")).head()
      // sums are NULL on an empty events table (EmptyInputSweepSpec):
      // zero stats make the monitor a no-op over zero minutes
      def lv(i: Int): Long = if (ref.isNullAt(i)) 0L else ref.getLong(i)
      val (nRef, s1Ref, s2Ref) = (lv(0), lv(1), lv(2))
      val minutes = byMin
        .select(col("event_type"), col("m"), col("cnt"))
        .as[EventStreams.MinuteCount]
      EventStreams.cusumMonitor(minutes, nRef, s1Ref, s2Ref).toDF()
        .withColumn("alarm", col("alarm").cast("long"))
        .orderBy(col("event_type"), col("m"))
    },
    Some("""WITH c AS (SELECT event_type, date_trunc('minute', ts) AS m,
          CAST(COUNT(*) AS BIGINT) AS cnt
        FROM events GROUP BY 1, 2),
      ref AS (SELECT CAST(COUNT(*) AS BIGINT) AS nref,
          CAST(SUM(cnt) AS BIGINT) AS s1ref,
          CAST(SUM(cnt * cnt) AS BIGINT) AS s2ref
        FROM c),
      dev AS (SELECT c.event_type, c.m, c.cnt, r.nref, r.s1ref, r.s2ref,
          20 * r.nref * c.cnt - 21 * r.s1ref AS dv
        FROM c CROSS JOIN ref r),
      pre AS (SELECT event_type, m, cnt, nref, s1ref, s2ref,
          CAST(SUM(dv) OVER w AS BIGINT) AS p
        FROM dev
        WINDOW w AS (PARTITION BY event_type ORDER BY m
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      cus AS (SELECT event_type, m, cnt, nref, s1ref, s2ref,
          p - LEAST(CAST(MIN(p) OVER w2 AS BIGINT),
            CAST(0 AS BIGINT)) AS s
        FROM pre
        WINDOW w2 AS (PARTITION BY event_type ORDER BY m
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      SELECT event_type, m, cnt, s,
        CAST(CASE WHEN s > 0 AND CAST(s AS HUGEINT) * s >
          CAST(10000 AS HUGEINT) *
            (CAST(nref AS HUGEINT) * s2ref - CAST(s1ref AS HUGEINT) * s1ref)
          THEN 1 ELSE 0 END AS BIGINT) AS alarm
      FROM cus ORDER BY event_type, m"""))

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

  /** The stream-stream interval-join attribution run over the batch
    * table — the SAME `EventStreams.attributeToClicks` transformation
    * StreamingSpec drives as two MemoryStreams executes here on static
    * frames (`withWatermark` is a no-op in batch), so the oracle
    * hash-checks the exact join the production streams run: every
    * purchase against the same user's clicks from the preceding hour.
    * Scale: an equi-join on user_id with a range residual — sort-merge
    * on the user key, and in streaming mode the watermark + interval
    * bound lets the state store discard both sides (the doc on the
    * function). Ordered by all four columns; duplicate rows (two
    * identical clicks) are interchangeable under the hash compare. */
  val streamAttribution = QueryDef("stream_attribution",
    (s, d) => {
      val ev = Tables.events(s, d)
      EventStreams.attributeToClicks(
          ev.filter(col("event_type") === "purchase"),
          ev.filter(col("event_type") === "click"))
        .orderBy(col("user_id"), col("p_ts"), col("c_ts"),
          col("value").asc_nulls_first)
    },
    Some("""SELECT p.user_id, p.ts AS p_ts, c.ts AS c_ts, p.value
      FROM events p JOIN events c ON p.user_id = c.user_id
        AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 1 HOUR
      WHERE p.event_type = 'purchase' AND c.event_type = 'click'
      ORDER BY p.user_id, p_ts, c_ts, p.value NULLS FIRST"""))

  /** The stateful last-touch crediter run over the batch table — the
    * SAME `flatMapGroupsWithState` transformation StreamingSpec proves
    * across a microbatch split executes here in batch mode (one group
    * call per user), so the oracle hash-checks the exact code path:
    * every purchase emits one credit row against the latest view/click
    * strictly before it in (ts-micros, event_id) order. The oracle
    * spells the same relation as an IGNORE-NULLS last_value window —
    * hash equality proves the O(1)-state stream machine against the
    * window-shaped batch semantics. */
  val streamLastTouch = QueryDef("stream_last_touch",
    (s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value"))
        .as[EventStreams.EvId]
      EventStreams.lastTouchCredit(ev).toDF()
        .orderBy(col("event_id"))
    },
    Some("""WITH o AS (SELECT event_id, user_id, ts, event_type, value,
        last_value(CASE WHEN event_type IN ('view', 'click')
            THEN event_type END IGNORE NULLS)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
        FROM events)
      SELECT event_id, user_id, ts AS p_ts,
        COALESCE(lt, 'none') AS touch_type, value
      FROM o WHERE event_type = 'purchase' ORDER BY event_id"""))

  /** The streaming Misra–Gries heavy-hitter path run over the batch
    * token stream — `DocStreams.heavyHitterCandidates`' sharded
    * `mapGroupsWithState` sketch (the code StreamingSpec feeds skewed
    * microbatches) produces the candidate superset, then the exact
    * recount + the global n/(K+1) threshold make the OUTPUT exact and
    * order-independent: any token above the threshold provably survives
    * its shard's MG counters (all its occurrences hash to one shard),
    * and the recount discards every false candidate — so the entry is
    * hash-checkable against a plain exact-SQL oracle even though the
    * sketch content itself is arrival-order-dependent (the
    * text_heavy_hitters convention, streaming edition). */
  val streamHeavyHitters = QueryDef("stream_heavy_hitters",
    (s, d) => {
      import s.implicits._
      val toks = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
        .filter(col("tok") =!= "").as[String]
      val k = graft.operators.HeavyHitters.K
      val cand = graft.streaming.DocStreams.heavyHitterCandidates(toks)
        .select(explode(col("candidates")).as("tok")).distinct()
      val total = toks.toDF("tok").agg(count(lit(1)).as("n"))
      toks.toDF("tok").join(broadcast(cand), Seq("tok"), "left_semi")
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(total))
        .where(col("cnt") * (k + 1) > col("n"))
        .select(col("tok"), col("cnt"))
        .orderBy(col("cnt").desc, col("tok"))
    },
    Some(s"""WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS tok FROM documents
        ),
      toks2 AS (SELECT tok FROM toks WHERE tok <> ''),
      tot AS (SELECT COUNT(*) AS n FROM toks2)
      SELECT tok, COUNT(*) AS cnt
      FROM toks2 CROSS JOIN tot
      GROUP BY tok
      HAVING COUNT(*) * ${graft.operators.HeavyHitters.K + 1} > ANY_VALUE(n)
      ORDER BY cnt DESC, tok"""))

  val windowedCounts = QueryDef("stream_windowed_counts",
    (s, d) => EventStreams.windowedCounts(Tables.events(s, d))
      .orderBy(col("window_start"), col("event_type")),
    Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))
}
