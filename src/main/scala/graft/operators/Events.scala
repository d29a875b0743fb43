package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryDef, Num, Tables}

/** Event-stream (batch) operators over the `events` table: time-window
  * aggregation, gap-based sessionization, JSON property extraction, and
  * per-window top-k. The streaming twins live in graft.streaming (same
  * transformations over readStream — Structured Streaming's batch/stream
  * unification makes these definitions shared).
  *
  * Scale: hourly windows shard naturally on (window, type); sessionization
  * shuffles once on user_id — the standard keyed-window shape. Skewed
  * users would be salted (graft docs) but the generator is uniform.
  */
object Events {
  import Num._

  def all: Seq[QueryDef] =
    Seq(hourly, sessionize, sessionizeNative, jsonProps, topMinute, sliding,
      rangeJoin, resample, resampleFat, anomaly, interpolate, ewma, cusum,
      attribution, rollingActive, transitions, twap, streak, cumulative,
      seasonalAnomaly, interArrival, markovSteady)

  /** Fixed-point scale and round count for [[markovSteady]] — shared by
    * the Spark loop and the unrolled oracle. 16 rounds: the chain's
    * spectral gap on any non-pathological event stream makes power
    * iteration geometric; the spec's skewed fixture converges to the
    * analytic stationary vector within truncation tolerance well
    * before 16. */
  val PiScale = 1000000L
  val PiRounds = 16

  /** Restriction-to-fixpoint rounds for [[markovSteady]] (idempotent
    * once converged; each non-final round removes ≥1 state, so any
    * event-type set with ≤16 removal cascades converges — the fn
    * require()s the fixpoint loudly, the Triangles deg < 2^30 envelope
    * convention). */
  val PiRestrictRounds = 16

  /** Markov steady state of the event-type chain — where the observed
    * user process spends its time asymptotically (the one-number-per-
    * type summary next-action models and load forecasts read off
    * [[transitions]]' matrix): π with πP = π, by [[PiRounds]] rounds of
    * fixed-point power iteration.
    *
    * The data-scaled work is exactly the `ev_transition_matrix` plan
    * (one user-keyed O(1)-frame window + a hash agg to ≤|types|² rows);
    * everything after is bounded driver arithmetic on that matrix (the
    * Lloyd-centroid convention — the collected state is |types|²,
    * never corpus-scaled; in the plan sweep's eager skip set like the
    * other superstep drivers, guarded by MarkovSteadySpec instead).
    * The chain is restricted TO A FIXPOINT (r13 verdict item 5): keep
    * only states with at least one out-edge into the kept set,
    * iterated [[PiRestrictRounds]] times (idempotent once converged —
    * the fn require()s convergence loudly). Every kept row is then
    * stochastic over kept targets, so the mass-conservation bound
    * below holds UNCONDITIONALLY over the kept states; types outside
    * the fixpoint (one-step sinks AND the two-step-sink cascade the
    * r12/r13 one-step restriction silently drained) are EXPLICIT in
    * the output — listed with `in_core` = 0 and π = 0, the guard flag
    * the r13 advice asked for, instead of a silently degenerate all-
    * zero π. Arithmetic is exact
    * throughout: q_ij = trunc(n_ij·10⁶/n_i) (BigInt product — n_ij·10⁶
    * is data-scaled; HUGEINT in the oracle), π'_j = Σ_i trunc(π_i·q_ij
    * /10⁶) with all terms ≤ 10¹², truncating division identical in
    * both engines; the only float is the final one-division readout.
    * Truncation loses < |types| units/round (sum ≥ 10⁶ − R·|types|),
    * deterministic and replayed exactly by the unrolled oracle. On the
    * synthetic corpus π is near-uniform (the generator's transitions
    * carry no preference — the honest reading, the graph_modularity
    * convention); the spec's skewed fixture pins the non-trivial case
    * against the analytic stationary vector. */
  val markovSteady = QueryDef("ev_markov_steady",
    (s, d) => {
      import s.implicits._
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val m = Tables.events(s, d)
        .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      val states0 = m.map(_._1).distinct.sorted
      var core = states0.toSet
      for (_ <- 0 until PiRestrictRounds)
        core = m.filter(e => core(e._1) && core(e._2)).map(_._1).toSet
      require(m.filter(e => core(e._1) && core(e._2)).map(_._1).toSet == core,
        s"markov restriction not at fixpoint after $PiRestrictRounds rounds")
      val kept = m.filter(e => core(e._1) && core(e._2))
      val rowSum = kept.groupBy(_._1).map { case (f, es) =>
        f -> es.map(_._3).sum
      }
      val q = kept.map { case (f, t, n) =>
        (f, t, (BigInt(n) * PiScale / rowSum(f)).toLong)
      }
      var pi: Map[String, Long] =
        if (core.isEmpty) Map.empty
        else core.toSeq.map(_ -> PiScale / core.size).toMap
      for (_ <- 0 until PiRounds) {
        val nx = scala.collection.mutable.Map.empty[String, Long]
        q.foreach { case (f, t, qv) =>
          nx(t) = nx.getOrElse(t, 0L) + pi.getOrElse(f, 0L) * qv / PiScale
        }
        pi = core.toSeq.map(t => t -> nx.getOrElse(t, 0L)).toMap
      }
      states0.map(t => (t, pi.getOrElse(t, 0L),
          pi.getOrElse(t, 0L).toDouble / PiScale.toDouble,
          if (core(t)) 1L else 0L))
        .toSeq.toDF("event_type", "pi_fixed", "pi", "in_core")
        .orderBy(col("event_type"))
    },
    Some(markovSteadySqlDuck))

  /** The restriction fixpoint (s1 → s16, each round MATERIALIZED — it
    * references its predecessor twice, and inlined the chain expands
    * 2^16-fold) plus the power-iteration loop (r1 → rR) unrolled into
    * CTEs, generated from the same constants (the qtTrainSqlDuck
    * convention). */
  private def markovSteadySqlDuck: String = {
    val sb = new StringBuilder
    sb ++= s"""WITH pairs AS (SELECT event_type AS from_type,
        lead(event_type) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS to_type
        FROM events),
      m AS MATERIALIZED (SELECT from_type, to_type, COUNT(*) AS n FROM pairs
        WHERE to_type IS NOT NULL GROUP BY 1, 2),
      s0 AS MATERIALIZED (SELECT DISTINCT from_type AS t FROM m)"""
    var prevS = "s0"
    for (r <- 1 to PiRestrictRounds) {
      sb ++= s""",
      s$r AS MATERIALIZED (SELECT DISTINCT m.from_type AS t FROM m
        JOIN $prevS a ON m.from_type = a.t
        JOIN $prevS b ON m.to_type = b.t)"""
      prevS = s"s$r"
    }
    sb ++= s""",
      mk AS (SELECT m.from_type, m.to_type, m.n
        FROM m JOIN $prevS a ON m.from_type = a.t
        JOIN $prevS b ON m.to_type = b.t),
      rs AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS rn
        FROM mk GROUP BY 1),
      q AS (SELECT mk.from_type, mk.to_type,
          CAST(CAST(mk.n AS HUGEINT) * $PiScale // rs.rn AS BIGINT) AS q
        FROM mk JOIN rs USING (from_type)),
      r0 AS (SELECT t, CAST($PiScale // (SELECT COUNT(*) FROM $prevS)
        AS BIGINT) AS pi FROM $prevS)"""
    var prev = "r0"
    for (r <- 1 to PiRounds) {
      sb ++= s""",
      r$r AS (SELECT q.to_type AS t,
          CAST(SUM(p.pi * q.q // $PiScale) AS BIGINT) AS pi
        FROM $prev p JOIN q ON q.from_type = p.t GROUP BY 1)"""
      prev = s"r$r"
    }
    sb ++= s"""
      SELECT s0.t AS event_type, COALESCE(p.pi, 0) AS pi_fixed,
        CAST(COALESCE(p.pi, 0) AS DOUBLE) / $PiScale.0 AS pi,
        CAST(CASE WHEN c.t IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
          AS in_core
      FROM s0 LEFT JOIN $prev p ON s0.t = p.t
      LEFT JOIN $prevS c ON s0.t = c.t ORDER BY s0.t"""
    sb.toString
  }

  /** Inter-arrival time profile per event type — the burstiness
    * statistic behind rate limiting, bot detection, and arrival-process
    * modeling: per user, the microsecond gap between consecutive events
    * (any type, ordered by ts with the event_id tie-break every other
    * user window uses), aggregated by the LATER event's type. Gaps are
    * exact BIGINT micros; they are summed in DecimalType(38,0) (the
    * ev_anomaly convention — DuckDB's side sums in int128 via the
    * VARCHAR route, so both engines are overflow-proof even where
    * total_users × span_us approaches 2⁶³) and the mean is one double
    * division over that exact sum. One user-keyed shuffle for the lag
    * window, one type-keyed aggregate. */
  val interArrival = QueryDef("ev_inter_arrival",
    (s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .filter(col("prev_ts").isNotNull)
        .withColumn("gap_us", expr("unix_micros(ts) - unix_micros(prev_ts)"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_gaps"),
          (sum(col("gap_us").cast("decimal(38,0)")).cast("double") /
            count(lit(1))).as("mean_gap_us"),
          min(col("gap_us")).as("min_gap_us"),
          max(col("gap_us")).as("max_gap_us"))
        .orderBy(col("event_type"))
    },
    Some("""WITH g AS (SELECT event_type,
        epoch_us(ts) - epoch_us(lag(ts) OVER (
          PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
        FROM events)
      SELECT event_type, COUNT(*) AS n_gaps,
        CAST(CAST(SUM(gap_us) AS VARCHAR) AS DOUBLE) / COUNT(*)
          AS mean_gap_us,
        MIN(gap_us) AS min_gap_us, MAX(gap_us) AS max_gap_us
      FROM g WHERE gap_us IS NOT NULL
      GROUP BY event_type ORDER BY event_type"""))

  /** Seasonally-adjusted volume anomalies — [[anomaly]] with the
    * baseline keyed by (type, HOUR-OF-DAY) instead of one global mean
    * per type: a 9am-sized spike is normal at 9am and a 3-sigma event
    * at 3am, which a flat baseline cannot see in either direction (it
    * both misses night anomalies and false-alarms every busy morning
    * when traffic is diurnal). Same all-integer decision discipline:
    * per-cell counts and the (n·x − s1)² > 9·(n·s2 − s1²) compare run
    * entirely in DecimalType(38,0) — no mean, no sqrt, no float ever.
    * Plan shape is [[anomaly]]'s with a finer join key: the baseline
    * relation is ≤ |types|·24 rows, AQE-broadcast onto the hourly
    * cells. */
  val seasonalAnomaly = QueryDef("ev_anomaly_seasonal",
    (s, d) => {
      val hourlyCnt = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("hod", hour(col("hour")))
      val c = col("cnt").cast("decimal(38,0)")
      val stats = hourlyCnt.groupBy(col("event_type"), col("hod"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(c).cast("decimal(38,0)").as("s1"),
          sum(c * c).cast("decimal(38,0)").as("s2"))
      hourlyCnt.join(stats, Seq("event_type", "hod"))
        .filter((col("n") * c - col("s1")) *
          (col("n") * c - col("s1")) >
          lit(9L).cast("decimal(38,0)") *
            (col("n") * col("s2") - col("s1") * col("s1")))
        .select(col("event_type"), col("hour"), col("cnt"))
        .orderBy(col("event_type"), col("hour"))
    },
    Some("""WITH hourly AS (SELECT event_type,
        date_trunc('hour', ts) AS hour, COUNT(*) AS cnt
        FROM events GROUP BY 1, 2),
      h2 AS (SELECT event_type, hour, cnt,
        EXTRACT(HOUR FROM hour) AS hod FROM hourly),
      stats AS (SELECT event_type, hod, COUNT(*) AS n,
        SUM(cnt) AS s1, SUM(cnt*cnt) AS s2 FROM h2 GROUP BY 1, 2)
      SELECT h.event_type, h.hour, h.cnt
      FROM h2 h JOIN stats s USING (event_type, hod)
      WHERE (s.n*h.cnt - s.s1)*(s.n*h.cnt - s.s1)
        > 9*(s.n*s.s2 - s.s1*s.s1)
      ORDER BY h.event_type, h.hour"""))

  /** Cumulative distinct users per day (the growth curve twin of
    * [[rollingActive]]'s trailing window): running DISTINCT decomposed
    * by the FIRST-SEEN trick — a user contributes to every day from
    * their first activity on, so cumulative distinct at day d = count
    * of users whose min(day) ≤ d. One user-keyed agg to first days
    * (data-scaled pass), one count per first-day, then the running sum
    * crosses only the calendar-bounded day relation (~30 rows — the
    * q42 class of serial window, allowlisted by construction); days
    * with no first-timer still appear via the distinct active-day
    * spine, carrying the running total forward. */
  val cumulative = QueryDef("ev_cumulative_users",
    (s, d) => {
      val ud = Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val firstDays = ud.groupBy(col("user_id"))
        .agg(min(col("day")).as("fday"))
        .groupBy(col("fday")).agg(count(lit(1)).as("new_users"))
      val spine = ud.select(col("day")).distinct()
      spine.join(firstDays, col("day") === col("fday"), "left")
        .select(col("day"), coalesce(col("new_users"), lit(0L)).as("new_users"))
        .withColumn("cumulative_users",
          sum(col("new_users")).over(
            org.apache.spark.sql.expressions.Window.orderBy(col("day"))
              .rowsBetween(org.apache.spark.sql.expressions.Window
                .unboundedPreceding, 0)))
        .orderBy(col("day"))
    },
    Some("""WITH ud AS (SELECT user_id,
        CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
      fd AS (SELECT user_id, MIN(day) AS fday FROM ud GROUP BY 1),
      nu AS (SELECT fday, COUNT(*) AS new_users FROM fd GROUP BY 1),
      spine AS (SELECT DISTINCT day FROM ud)
      SELECT s.day,
        CAST(COALESCE(nu.new_users, 0) AS BIGINT) AS new_users,
        CAST(SUM(COALESCE(nu.new_users, 0)) OVER (ORDER BY s.day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cumulative_users
      FROM spine s LEFT JOIN nu ON s.day = nu.fday
      ORDER BY s.day"""))

  /** Time-weighted average value per event type (TWAP — the telemetry /
    * finance convention where an observation holds until the next one
    * replaces it, so each value is weighted by how LONG it was current,
    * not how often it was sampled): Σ value·dur / Σ dur over the LOCF
    * step function. Irregular sampling makes the unweighted mean wrong
    * by construction — a sensor that reports once an hour while idle
    * and every second under load would otherwise be load-biased.
    *
    * Plan: one type-partitioned O(1) `lead` window for each
    * observation's hold duration, then a hash agg; durations are exact
    * whole-second longs (the sessionize cast-long convention, mirrored
    * by DuckDB's date_diff), value·dur products and their sums are
    * exact decimals, and the final TWAP is one IEEE division. */
  val twap = QueryDef("ev_twap",
    (s, d) => {
      val byType = Window.partitionBy(col("event_type"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("next_ts", lead(col("ts"), 1).over(byType))
        .filter(col("next_ts").isNotNull)
        .withColumn("dur",
          col("next_ts").cast("long") - col("ts").cast("long"))
        .groupBy(col("event_type"))
        .agg((sum(dec(col("value")) * col("dur")).cast("double") /
            sum(col("dur")).cast("double")).as("twap"),
          sum(col("dur")).as("total_dur"))
        .orderBy(col("event_type"))
    },
    Some("""WITH w AS (SELECT event_type, value,
        date_diff('second', ts, lead(ts) OVER (PARTITION BY event_type
          ORDER BY ts, event_id)) AS dur
        FROM events)
      SELECT event_type,
        CAST(SUM(CAST(value AS DECIMAL(12,2)) * dur) AS DOUBLE)
          / CAST(SUM(dur) AS DOUBLE) AS twap,
        CAST(SUM(dur) AS BIGINT) AS total_dur
      FROM w WHERE dur IS NOT NULL
      GROUP BY 1 ORDER BY 1"""))

  /** Longest consecutive-day activity streak per user — the canonical
    * gaps-and-islands problem: collapse to (user, day), then `day −
    * row_number` is CONSTANT within a run of consecutive days (both
    * advance by 1/day) and jumps at every gap, so it IS the island key;
    * the streak is the biggest island. Two key-partitioned stages after
    * the distinct — no self-join, no iteration, the island trick turns
    * a sequence problem into a group-by. */
  val streak = QueryDef("ev_streak",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      Tables.events(s, d)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
        .withColumn("island",
          date_sub(col("day"), row_number().over(w)))
        .groupBy(col("user_id"), col("island"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("user_id"))
        .agg(max(col("len")).as("longest_streak"),
          count(lit(1)).as("n_streaks"))
        .orderBy(col("user_id"))
    },
    Some("""WITH ud AS (SELECT DISTINCT user_id,
        CAST(date_trunc('day', ts) AS DATE) AS day FROM events),
      isl AS (SELECT user_id,
        day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
          AS INTEGER) AS island
        FROM ud),
      runs AS (SELECT user_id, island, COUNT(*) AS len FROM isl
        GROUP BY 1, 2)
      SELECT user_id, MAX(len) AS longest_streak,
        COUNT(*) AS n_streaks
      FROM runs GROUP BY 1 ORDER BY 1"""))

  /** First-order Markov transition matrix over user event streams: for
    * every (from, to) event-type pair, the transition count and the
    * row-normalized probability — the behavioral model behind
    * next-action prediction and funnel-drop diagnosis.
    *
    * Plan: one user_id shuffle for the `lead` pairing (each event joins
    * its successor in (ts, event_id) order — a growing-frame-free O(1)
    * window), then a hash agg to the ≤ |types|² relation; the
    * normalizing row sums are a window over THAT 25-row relation,
    * partitioned by from-type (parallel, and trivially small — the raw
    * data never reaches it). Probabilities are one BIGINT/BIGINT IEEE
    * division, identical in both engines. */
  val transitions = QueryDef("ev_transition_matrix",
    (s, d) => {
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val byFrom = Window.partitionBy(col("from_type"))
      Tables.events(s, d)
        .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p",
          col("n").cast("double") / sum(col("n")).over(byFrom).cast("double"))
        .orderBy(col("from_type"), col("to_type"))
    },
    Some("""WITH pairs AS (SELECT event_type AS from_type,
        lead(event_type) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS to_type
        FROM events),
      m AS (SELECT from_type, to_type, COUNT(*) AS n FROM pairs
        WHERE to_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, n,
        CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY from_type)
          AS DOUBLE) AS p
      FROM m ORDER BY from_type, to_type"""))

  /** 7-day rolling active users (the DAU→WAU dashboard series): for each
    * calendar day, the count of DISTINCT users active in the trailing
    * 7-day window. Sliding DISTINCT is the one rolling metric a window
    * function cannot express (count-distinct does not decompose over
    * frames); the scalable spelling is contribute-and-regroup: collapse
    * raw events to (user, day) FIRST — at 100 TB that's the 10⁴×
    * reduction, events per user-day are many — then explode each
    * user-day into the ≤7 window-ends it feeds and count distinct per
    * window. Fan-out is bounded at 7× the collapsed relation, every
    * stage is key-partitioned; the trailing output tail past the last
    * observed day is cut by a broadcast 1-row max. */
  val rollingActive = QueryDef("ev_rolling_active_users",
    (s, d) => {
      val ud = Tables.events(s, d)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .distinct()
      val maxDay = ud.agg(max(col("day")).as("max_day"))
      ud.withColumn("w_end", explode(expr(
          "sequence(day, day + INTERVAL 6 DAYS, INTERVAL 1 DAY)")))
        .crossJoin(broadcast(maxDay))
        .filter(col("w_end") <= col("max_day"))
        .groupBy(col("w_end").as("day"))
        .agg(countDistinct(col("user_id")).as("active_7d"))
        .orderBy(col("day"))
    },
    Some("""WITH ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day
        FROM events),
      mx AS (SELECT max(day) AS max_day FROM ud),
      ex AS (SELECT user_id,
        unnest(generate_series(day, day + INTERVAL 6 DAY, INTERVAL 1 DAY))
          AS w_end FROM ud)
      SELECT w_end AS day, count(DISTINCT user_id) AS active_7d
      FROM ex, mx WHERE w_end <= max_day
      GROUP BY 1 ORDER BY 1"""))

  /** The attribution transformation on any events-shaped frame — shared
    * with the streaming parity spec (`EventStreams.lastTouchCredit`). */
  def attributionOf(events: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("touch",
        when(col("event_type").isin("view", "click"), col("event_type")))
      .withColumn("last_touch",
        last(col("touch"), ignoreNulls = true).over(byUser))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("last_touch"), lit("none")).as("touch_type"))
      .agg(count(lit(1)).as("n_purchases"),
        sumd(dec(col("value"))).as("attributed_revenue"))
      .orderBy(col("touch_type"))
  }

  /** Last-touch attribution: credit each purchase's revenue to the most
    * recent view/click by the same user strictly before it (ties broken
    * by event_id), "none" when no prior touchpoint exists — the standard
    * conversion-credit rollup of clickstream analytics.
    *
    * The per-purchase lookup is ONE growing-frame window
    * (`[unboundedPreceding, -1]`, the incremental
    * UnboundedPrecedingWindowFunctionFrame — the `ev_interpolate_linear`
    * quadratic-trap lesson applied at design time, not discovered at the
    * 8× tier): a running `last(touch, ignoreNulls)` carries the latest
    * touchpoint type down each user's timeline in one pass. Plan: one
    * shuffle on user_id, then a 3-row hash agg; revenue sums in
    * decimal(12,2) per the Num convention. */
  val attribution = QueryDef("ev_attribution",
    (s, d) => attributionOf(Tables.events(s, d)),
    Some("""WITH e AS (SELECT user_id, ts, event_id, event_type, value,
        CASE WHEN event_type IN ('view','click') THEN event_type END AS touch
        FROM events),
      w AS (SELECT event_type, value,
        last_value(touch IGNORE NULLS) OVER (
          PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
        FROM e)
      SELECT COALESCE(last_touch, 'none') AS touch_type,
        COUNT(*) AS n_purchases,
        CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS attributed_revenue
      FROM w WHERE event_type = 'purchase'
      GROUP BY 1 ORDER BY 1"""))

  /** One-sided CUSUM changepoint detection over per-type minute volumes
    * — the sequential drift detector beside [[anomaly]]'s pointwise 3σ
    * gate and [[ewma]]'s smoother: a CUSUM accumulates SMALL sustained
    * shifts that no single-point test sees. Page's recurrence
    * S_i = max(0, S_{i−1} + (x_i − μ − k)) looks serial, but linearizes
    * exactly: with P_i the prefix sum of deviations, S_i = P_i −
    * min(0, min_{j≤i} P_j) — one cumulative sum + one running min, both
    * GROWING window frames (the incremental kind — the
    * `ev_interpolate_linear` quadratic-trap lesson respected by
    * construction).
    *
    * All-integer decision discipline (the [[anomaly]] convention, one
    * step further): deviations are scaled by 20n so slack k = μ/20 stays
    * integral — d_i = 20·n·x_i − 21·s1 — and the 5σ alarm compares
    * S_i² > 25·400·(n·s2 − s1²), all in DecimalType(38,0): no mean, no
    * sqrt, no float cumulative sum (whose accumulation ORDER differs
    * between engines), no drift. The reported `max_cusum` normalizes
    * back to count units with ONE IEEE division of two exact values.
    *
    * Plan: one partial-agg pass to the calendar-bounded (type, minute)
    * relation; per-type stats joined back unhinted (AQE broadcasts the
    * 5-row relation); ONE type-partitioned window evaluates both running
    * frames on a shared sort; the argmax rank runs on the same minute
    * relation. Output is one row per type (always non-empty). */
  val cusum = QueryDef("ev_cusum_changepoint",
    (s, d) => {
      val byMin = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("m"))
        .agg(count(lit(1)).as("cnt"))
      val c = col("cnt").cast("decimal(38,0)")
      val stats = byMin.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(c).cast("decimal(38,0)").as("s1"),
          sum(c * c).cast("decimal(38,0)").as("s2"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("m"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dev = byMin.join(stats, "event_type")
        .withColumn("dv",
          lit(20L).cast("decimal(38,0)") * col("n") * c -
            lit(21L).cast("decimal(38,0)") * col("s1"))
      val cus = dev
        .withColumn("p", sum(col("dv")).over(w))
        .withColumn("mn", least(min(col("p")).over(w),
          lit(0L).cast("decimal(38,0)")))
        .withColumn("s", col("p") - col("mn"))
      val rk = Window.partitionBy(col("event_type"))
        .orderBy(col("s").desc, col("m"))
      cus
        .withColumn("alarm",
          when(col("s") > lit(0L).cast("decimal(38,0)") &&
            col("s") * col("s") > lit(10000L).cast("decimal(38,0)") *
              (col("n") * col("s2") - col("s1") * col("s1")), 1L)
            .otherwise(0L))
        .withColumn("rk", row_number().over(rk))
        .groupBy(col("event_type"))
        .agg(max(col("n")).cast("long").as("n_minutes"),
          sum(col("alarm")).as("n_alarms"),
          (max(when(col("rk") === 1, col("s"))).cast("double") /
            (lit(20.0) * max(col("n")).cast("double"))).as("max_cusum"),
          max(when(col("rk") === 1, col("m"))).as("argmax_minute"))
        .orderBy(col("event_type"))
    },
    Some("""WITH c AS (SELECT event_type, date_trunc('minute', ts) AS m,
          CAST(COUNT(*) AS DECIMAL(38,0)) AS cnt
        FROM events GROUP BY 1, 2),
      st AS (SELECT event_type, CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
          CAST(SUM(cnt) AS DECIMAL(38,0)) AS s1,
          CAST(SUM(cnt*cnt) AS DECIMAL(38,0)) AS s2
        FROM c GROUP BY 1),
      dev AS (SELECT c.event_type, c.m, st.n, st.s1, st.s2,
          CAST(20 AS DECIMAL(38,0)) * st.n * c.cnt -
            CAST(21 AS DECIMAL(38,0)) * st.s1 AS dv
        FROM c JOIN st USING (event_type)),
      pre AS (SELECT event_type, m, n, s1, s2,
          CAST(SUM(dv) OVER w AS DECIMAL(38,0)) AS p
        FROM dev
        WINDOW w AS (PARTITION BY event_type ORDER BY m
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      cus AS (SELECT event_type, m, n, s1, s2,
          p - LEAST(CAST(MIN(p) OVER w2 AS DECIMAL(38,0)),
            CAST(0 AS DECIMAL(38,0))) AS s
        FROM pre
        WINDOW w2 AS (PARTITION BY event_type ORDER BY m
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      rk AS (SELECT event_type, m, n, s1, s2, s,
          ROW_NUMBER() OVER (PARTITION BY event_type
            ORDER BY s DESC, m) AS rk,
          CASE WHEN s > 0 AND s*s > CAST(10000 AS DECIMAL(38,0)) *
            (n*s2 - s1*s1) THEN 1 ELSE 0 END AS alarm
        FROM cus)
      SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_minutes,
        CAST(SUM(alarm) AS BIGINT) AS n_alarms,
        CAST(MAX(CASE WHEN rk = 1 THEN s END) AS DOUBLE) /
          (20.0 * CAST(MAX(n) AS DOUBLE)) AS max_cusum,
        MAX(CASE WHEN rk = 1 THEN m END) AS argmax_minute
      FROM rk GROUP BY event_type ORDER BY event_type"""))

  /** Exponentially-weighted moving average over per-type minute volumes
    * — the time-series smoother ops dashboards run beside
    * [[anomaly]]'s 3σ gate. True EWMA is a serial recurrence
    * (s_t = αx_t + (1−α)s_{t−1}) that neither parallelizes nor
    * cross-engine-reproduces in float; this is the standard truncated
    * form: 16 trailing observations with α = 1/2, i.e. weights
    * 2^−1 … 2^−16, normalized by the weights actually present (series
    * heads have fewer lags). The 2^−k tail beyond 16 lags is below
    * 10^−5 of the signal — the truncation every streaming EWMA with
    * finite state makes implicitly.
    *
    * Bit-portability by construction, no decimal needed: counts are
    * integers, weights are dyadic rationals ≥ 2^−16, so every product
    * and partial sum is EXACT in an IEEE double (lsb 2^−16, magnitude
    * ≪ 2^52) — the "sum of floats is order-dependent" trap has no
    * room to fire — and the single normalizing division is the only
    * rounding step. Plan: one hash agg to the minute relation, ONE
    * window partitioned by type (all 16 lags share its sort), one
    * division per row. */
  val ewma = QueryDef("ev_ewma_smooth",
    (s, d) => {
      val byMin = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("minute", col("ts")).as("m"))
        .agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("m"))
      val weights = (1 to 16).map(k => math.pow(0.5, k))
      val num = weights.zipWithIndex.map { case (wt, i) =>
        coalesce(lag(col("cnt"), i).over(w).cast("double") * lit(wt),
          lit(0.0))
      }.reduce(_ + _)
      val den = weights.zipWithIndex.map { case (wt, i) =>
        when(lag(col("cnt"), i).over(w).isNotNull, lit(wt)).otherwise(lit(0.0))
      }.reduce(_ + _)
      byMin
        .withColumn("ewma", num / den)
        .select(col("event_type"), col("m"), col("cnt"), col("ewma"))
        .orderBy(col("event_type"), col("m"))
    },
    Some {
      val weights = (1 to 16).map(k => math.pow(0.5, k))
      val num = weights.zipWithIndex.map { case (wt, i) =>
        s"COALESCE(CAST(LAG(cnt, $i) OVER w AS DOUBLE) * $wt, 0.0)"
      }.mkString(" + ")
      val den = weights.zipWithIndex.map { case (wt, i) =>
        s"(CASE WHEN LAG(cnt, $i) OVER w IS NOT NULL THEN $wt ELSE 0.0 END)"
      }.mkString(" + ")
      s"""WITH c AS (SELECT event_type, date_trunc('minute', ts) AS m,
          COUNT(*) AS cnt FROM events GROUP BY 1, 2)
        SELECT event_type, m, cnt, ($num) / ($den) AS ewma
        FROM c WINDOW w AS (PARTITION BY event_type ORDER BY m)
        ORDER BY event_type, m"""
    })

  /** Hourly-volume anomaly detection with an ALL-INTEGER 3σ decision —
    * the monitoring query every event pipeline runs, made bit-portable
    * by never computing a float: |x − μ| > 3σ over per-type hourly
    * counts is equivalent to (n·x − Σx)² > 9·(n·Σx² − (Σx)²) — no mean,
    * no sqrt, no epsilon, no engine drift (the same integer-decision
    * discipline as `text_quality_model` and `text_bm25`). The decision
    * arithmetic runs in DecimalType(38,0), not BIGINT: Σx² and (Σx)²
    * silently wrap 64-bit Longs once a type's event total reaches ~3e9
    * (s1² > 2^63), while DuckDB's SUM promotes to HUGEINT and stays
    * exact — decimal keeps both engines exact to 10^38, far past any
    * 100 TB corpus (n ≤ 10^5 hours × x ≤ 10^12 events/hour squares to
    * 10^34).
    *
    * Scale: one partial-agg pass to hourly counts (calendar-bounded ×
    * type rows), one tiny per-type stats agg joined back (unhinted —
    * AQE broadcasts it while small, the round-6 vocabulary-relation
    * convention); no windows, no self-join. */
  val anomaly = QueryDef("ev_anomaly",
    (s, d) => {
      val hourlyCnt = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("cnt"))
      val c = col("cnt").cast("decimal(38,0)")
      val stats = hourlyCnt.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(c).cast("decimal(38,0)").as("s1"),
          sum(c * c).cast("decimal(38,0)").as("s2"))
      hourlyCnt.join(stats, "event_type")
        .filter((col("n") * c - col("s1")) *
          (col("n") * c - col("s1")) >
          lit(9L).cast("decimal(38,0)") *
            (col("n") * col("s2") - col("s1") * col("s1")))
        .select(col("event_type"), col("hour"), col("cnt"))
        .orderBy(col("event_type"), col("hour"))
    },
    Some("""WITH hourly AS (SELECT event_type,
        date_trunc('hour', ts) AS hour, COUNT(*) AS cnt
        FROM events GROUP BY 1, 2),
      stats AS (SELECT event_type, COUNT(*) AS n,
        SUM(cnt) AS s1, SUM(cnt*cnt) AS s2 FROM hourly GROUP BY 1)
      SELECT h.event_type, h.hour, h.cnt
      FROM hourly h JOIN stats s USING (event_type)
      WHERE (s.n*h.cnt - s.s1)*(s.n*h.cnt - s.s1)
        > 9*(s.n*s.s2 - s.s1*s.s1)
      ORDER BY h.event_type, h.hour"""))

  /** Minute-grid resampling with last-observation-carried-forward — the
    * time-series gap-filling step between raw event streams and anything
    * that consumes a regular cadence (rate limiting, dashboards, feature
    * windows for training). One day's 1-minute grid per event type,
    * LOCF'd from the ENTIRE preceding history (events before the grid
    * window provide the carry-in value).
    *
    * Determinism: NULL-valued observations are dropped up front in BOTH
    * spellings — `last(v, ignoreNulls=true)` would skip them (carrying
    * the older value) while the oracle's ASOF JOIN would return them, a
    * latent cross-engine divergence; filtering first makes "NULL
    * observation" mean "no observation" identically in both engines.
    * Events are then pre-deduplicated per (type, ts) with MAX — both
    * engines otherwise pick an arbitrary winner among equal timestamps.
    * The Spark spelling unions grid points into the series and takes
    * `last(value, ignoreNulls)` over (ts, is_grid) — the is_grid
    * tie-break makes an event AT a grid instant visible to it, exactly
    * matching the oracle's inclusive `ASOF JOIN (t >= ts)`.
    *
    * Scale stance: one window partitioned by series key. Here the series
    * cardinality is 5 (event types), so parallelism is 5 — fine for a
    * demo, and the honest note is that real deployments resample
    * per-user/per-device (millions of series, perfectly partitioned).
    * For FEW fat series at 100 TB the two-phase range-bucketed carry
    * (the `pack_sequences` prefix-sum pattern) replaces the window —
    * implemented and oracle-proven as [[resampleFat]]. */
  val resample = QueryDef("ev_resample_locf",
    (s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .groupBy(col("event_type"), col("ts")).agg(max(col("value")).as("v"))
      // grid types come from the UNFILTERED table (both spellings): a
      // type with only NULL observations still gets its all-NULL grid
      val grid = Tables.events(s, d).select(col("event_type")).distinct()
        .select(col("event_type"), explode(expr(
          "sequence(timestamp'2024-01-15 00:00:00', " +
            "timestamp'2024-01-15 23:59:00', interval 1 minute)")).as("t"))
      val series = ev
        .select(col("event_type"), col("ts").as("t"), col("v"),
          lit(0).as("is_grid"))
        .unionByName(grid.select(col("event_type"), col("t"),
          lit(null).cast("double").as("v"), lit(1).as("is_grid")))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("t"), col("is_grid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      series
        .withColumn("value_locf", last(col("v"), ignoreNulls = true).over(w))
        .filter(col("is_grid") === 1)
        .select(col("event_type"), col("t").as("minute_ts"), col("value_locf"))
        .orderBy(col("event_type"), col("minute_ts"))
    },
    Some("""WITH ev AS (
        SELECT event_type, ts, MAX(value) AS v FROM events
        WHERE value IS NOT NULL GROUP BY 1, 2),
      g AS (
        SELECT event_type, unnest(generate_series(
          TIMESTAMP '2024-01-15 00:00:00', TIMESTAMP '2024-01-15 23:59:00',
          INTERVAL 1 MINUTE)) AS t
        FROM (SELECT DISTINCT event_type FROM events))
      SELECT g.event_type, g.t AS minute_ts, e.v AS value_locf
      FROM g ASOF LEFT JOIN ev e
        ON g.event_type = e.event_type AND g.t >= e.ts
      ORDER BY g.event_type, g.t"""))

  /** The FAT-SERIES spelling of [[resample]] — identical answer (same
    * oracle SQL), different parallelism story. `resample` runs one LOCF
    * window per series: fine when series are many (per-user/per-device),
    * a single task per series when they are few and fat — 5 event types
    * over a 100 TB day would be 5 tasks no matter the cluster. This
    * variant applies the `pack_sequences` two-level decomposition to the
    * carry instead:
    *
    *   1. rows bucket by HOUR; per (series, bucket) the last observation
    *      is a plain `max_by` aggregate (map-side combinable, no window
    *      over raw rows);
    *   2. the carry INTO each bucket — last observation of any earlier
    *      bucket — is a window over the per-(series, bucket) relation
    *      only (series × 24 rows here; series × hours generally: the
    *      tiny relation, never the events);
    *   3. the LOCF window runs INSIDE each (series, bucket) partition,
    *      seeded by the broadcast carry-in — parallelism is
    *      series × buckets instead of series.
    *
    * The (t, is_grid) ordering and NULL-observation handling match
    * [[resample]] exactly, so both spellings hash-match the same ASOF
    * oracle. */
  val resampleFat = QueryDef("ev_resample_locf_fat",
    (s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .groupBy(col("event_type"), col("ts")).agg(max(col("value")).as("v"))
      val grid = Tables.events(s, d).select(col("event_type")).distinct()
        .select(col("event_type"), explode(expr(
          "sequence(timestamp'2024-01-15 00:00:00', " +
            "timestamp'2024-01-15 23:59:00', interval 1 minute)")).as("t"))
      val series = ev
        .select(col("event_type"), col("ts").as("t"), col("v"),
          lit(0).as("is_grid"))
        .unionByName(grid.select(col("event_type"), col("t"),
          lit(null).cast("double").as("v"), lit(1).as("is_grid")))
        .withColumn("bkt", floor(col("t").cast("long") / 3600L))
      // per-(series, bucket) last observation: an aggregate, not a window
      // ((type, ts) is unique after the dedup, so max_by is deterministic)
      val lastPerBucket = series.filter(col("is_grid") === 0)
        .groupBy(col("event_type"), col("bkt"))
        .agg(max_by(col("v"), col("t")).as("last_v"))
      // carry INTO each bucket: window over the tiny bucket relation only
      val allBuckets = series.select(col("event_type"), col("bkt")).distinct()
        .join(lastPerBucket, Seq("event_type", "bkt"), "left_outer")
      val wCarry = Window.partitionBy(col("event_type")).orderBy(col("bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val carry = allBuckets
        .withColumn("carry_in", last(col("last_v"), ignoreNulls = true)
          .over(wCarry))
        .select(col("event_type"), col("bkt"), col("carry_in"))
      // intra-bucket LOCF, parallel across series × buckets
      val wIntra = Window.partitionBy(col("event_type"), col("bkt"))
        .orderBy(col("t"), col("is_grid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      series.join(broadcast(carry), Seq("event_type", "bkt"))
        .withColumn("value_locf",
          coalesce(last(col("v"), ignoreNulls = true).over(wIntra),
            col("carry_in")))
        .filter(col("is_grid") === 1)
        .select(col("event_type"), col("t").as("minute_ts"), col("value_locf"))
        .orderBy(col("event_type"), col("minute_ts"))
    },
    Some("""WITH ev AS (
        SELECT event_type, ts, MAX(value) AS v FROM events
        WHERE value IS NOT NULL GROUP BY 1, 2),
      g AS (
        SELECT event_type, unnest(generate_series(
          TIMESTAMP '2024-01-15 00:00:00', TIMESTAMP '2024-01-15 23:59:00',
          INTERVAL 1 MINUTE)) AS t
        FROM (SELECT DISTINCT event_type FROM events))
      SELECT g.event_type, g.t AS minute_ts, e.v AS value_locf
      FROM g ASOF LEFT JOIN ev e
        ON g.event_type = e.event_type AND g.t >= e.ts
      ORDER BY g.event_type, g.t"""))

  /** Minute-grid resampling by LINEAR INTERPOLATION — [[resample]]'s
    * smooth twin (the other standard gap-fill: sensors/metrics that vary
    * continuously interpolate; state-like series carry forward). Each
    * grid instant finds its nearest observation on each side within the
    * series and emits
    *
    *   v = pv + (nv − pv) · (t − pt) / (nt − pt)
    *
    * a grid point before the first or after the last observation stays
    * NULL (no extrapolation), and a grid instant that coincides with an
    * observation emits that observation exactly (the t = pt branch, so
    * no 0/0).
    *
    * Determinism: the same NULL-drop + per-(type, ts) MAX pre-dedup and
    * (t, is_grid) tie-breaks as [[resample]] (an observation AT a grid
    * instant is visible to it from BOTH directions: `is_grid` ascending
    * for the backward window, descending for the forward one). Time
    * deltas are exact BIGINT microseconds (`unix_micros`/`epoch_us`);
    * the interpolation is ONE IEEE division and a fixed multiply-add
    * tree — bit-identical across engines.
    *
    * Scale stance: two windows per series over the same partitioning
    * (one shuffle, two intra-partition sorts). Series cardinality here
    * is 5; the few-fat-series decomposition of [[resampleFat]] applies
    * verbatim (bucket the carry in BOTH directions) if ever needed. */
  val interpolate = QueryDef("ev_interpolate_linear",
    (s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("value").isNotNull)
        .groupBy(col("event_type"), col("ts")).agg(max(col("value")).as("v"))
      val grid = Tables.events(s, d).select(col("event_type")).distinct()
        .select(col("event_type"), explode(expr(
          "sequence(timestamp'2024-01-15 00:00:00', " +
            "timestamp'2024-01-15 23:59:00', interval 1 minute)")).as("t"))
      val series = ev
        .select(col("event_type"), col("ts").as("t"), col("v"),
          lit(0).as("is_grid"), col("ts").as("ot"))
        .unionByName(grid.select(col("event_type"), col("t"),
          lit(null).cast("double").as("v"), lit(1).as("is_grid"),
          lit(null).cast("timestamp").as("ot")))
      val wPrev = Window.partitionBy(col("event_type"))
        .orderBy(col("t"), col("is_grid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // forward neighbor as a RUNNING last() over the DESCENDING order —
      // a [currentRow, unboundedFollowing) frame with first(ignoreNulls)
      // is re-evaluated from scratch per row by WindowExec (O(rows²) per
      // partition: measured 91 s vs 1.5 s at the 8× tier); the growing
      // frame is incremental. Tie order (t desc, is_grid asc) keeps an
      // observation AT a grid instant visible to it.
      val wNext = Window.partitionBy(col("event_type"))
        .orderBy(col("t").desc, col("is_grid").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      series
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
        .withColumn("pt", last(col("ot"), ignoreNulls = true).over(wPrev))
        .withColumn("nv", last(col("v"), ignoreNulls = true).over(wNext))
        .withColumn("nt", last(col("ot"), ignoreNulls = true).over(wNext))
        .filter(col("is_grid") === 1)
        .select(col("event_type"), col("t").as("minute_ts"), expr(
          """CASE WHEN pt IS NOT NULL AND t = pt THEN pv
            WHEN pt IS NOT NULL AND nt IS NOT NULL THEN
              pv + (nv - pv) *
                (CAST(unix_micros(t) - unix_micros(pt) AS DOUBLE) /
                 CAST(unix_micros(nt) - unix_micros(pt) AS DOUBLE))
            ELSE NULL END""").as("value_interp"))
        .orderBy(col("event_type"), col("minute_ts"))
    },
    Some("""WITH ev AS (
        SELECT event_type, ts, MAX(value) AS v FROM events
        WHERE value IS NOT NULL GROUP BY 1, 2),
      g AS (
        SELECT event_type, unnest(generate_series(
          TIMESTAMP '2024-01-15 00:00:00', TIMESTAMP '2024-01-15 23:59:00',
          INTERVAL 1 MINUTE)) AS t
        FROM (SELECT DISTINCT event_type FROM events)),
      series AS (
        SELECT event_type, ts AS t, v, 0 AS is_grid, ts AS ot FROM ev
        UNION ALL
        SELECT event_type, t, CAST(NULL AS DOUBLE) AS v, 1 AS is_grid,
          CAST(NULL AS TIMESTAMP) AS ot FROM g),
      w AS (SELECT event_type, t, is_grid,
          LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY event_type
            ORDER BY t, is_grid
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
          LAST_VALUE(ot IGNORE NULLS) OVER (PARTITION BY event_type
            ORDER BY t, is_grid
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
          LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY event_type
            ORDER BY t DESC, is_grid ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nv,
          LAST_VALUE(ot IGNORE NULLS) OVER (PARTITION BY event_type
            ORDER BY t DESC, is_grid ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nt
        FROM series)
      SELECT event_type, t AS minute_ts,
        CASE WHEN pt IS NOT NULL AND t = pt THEN pv
          WHEN pt IS NOT NULL AND nt IS NOT NULL THEN
            pv + (nv - pv) *
              (CAST(epoch_us(t) - epoch_us(pt) AS DOUBLE) /
               CAST(epoch_us(nt) - epoch_us(pt) AS DOUBLE))
          ELSE NULL END AS value_interp
      FROM w WHERE is_grid = 1 ORDER BY event_type, minute_ts"""))

  /** Interval (range) join: count events of every other type inside the
    * [-2 min, +3 min) neighborhood of each busy click minute (≥2 clicks).
    *
    * Executed in the scale-correct shape: each interval is exploded into
    * the minute buckets it covers (5 rows each) and the fact side joins on
    * the bucket as an *equi* key, with the exact range predicate kept as a
    * residual filter — a hash join instead of a nested loop. The naive
    * broadcast-nested-loop spelling (`ts BETWEEN lo AND hi` alone) was
    * measured 25× slower at sf0.1 (37 s vs 1.5 s: 273M codegen'd interval
    * comparisons). It's the equi-join SHAPE that survives scale: a
    * nested loop requires the interval side broadcast, an equi join
    * doesn't — the explicit broadcast hint below fits this minutes-scale
    * bucket table and would simply be dropped (yielding a shuffled hash
    * join) for an interval side beyond driver memory. DuckDB's IEJoin
    * handles the oracle side natively. */
  val rangeJoin = QueryDef("ev_range_join",
    (s, d) => {
      val ev = Tables.events(s, d)
      val busy = ev.filter(col("event_type") === "click")
        .groupBy(date_trunc("minute", col("ts")).as("m"))
        .agg(count(lit(1)).as("n_clicks"))
        .filter(col("n_clicks") >= 2)
      // minute buckets covered by [m-2min, m+3min)
      val buckets = busy.select(col("m"),
        explode(sequence(
          col("m") - expr("INTERVAL 2 MINUTES"),
          col("m") + expr("INTERVAL 2 MINUTES"),
          expr("INTERVAL 1 MINUTE"))).as("mb"))
      val others = ev.filter(col("event_type") =!= "click")
        .withColumn("mb", date_trunc("minute", col("ts")))
      others.join(broadcast(buckets), "mb")
        // residual exact-range check — a no-op for minute-aligned bounds,
        // kept so the pattern stays correct for arbitrary intervals
        .filter(col("ts") >= col("m") - expr("INTERVAL 2 MINUTES") &&
          col("ts") < col("m") + expr("INTERVAL 3 MINUTES"))
        .groupBy(col("m").as("busy_minute"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("busy_minute"), col("event_type"))
    },
    Some("""WITH busy AS (SELECT date_trunc('minute', ts) AS m, COUNT(*) AS n_clicks
        FROM events WHERE event_type = 'click'
        GROUP BY 1 HAVING COUNT(*) >= 2)
      SELECT m AS busy_minute, event_type, COUNT(*) AS n
      FROM events e JOIN busy b
        ON e.ts >= b.m - INTERVAL 2 MINUTE AND e.ts < b.m + INTERVAL 3 MINUTE
      WHERE e.event_type <> 'click'
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Sliding windows (1 h length, 30 min slide): each event lands in two
    * windows. Spark's window() vs a DuckDB unnest of the two window
    * starts. */
  val sliding = QueryDef("ev_sliding_window",
    (s, d) => Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"))
      .orderBy(col("window_start"), col("event_type")),
    Some("""SELECT window_start, event_type, COUNT(*) AS n FROM (
        SELECT event_type, unnest([
          ts - (epoch_us(ts) % 1800000000) * INTERVAL 1 MICROSECOND,
          ts - (epoch_us(ts) % 1800000000) * INTERVAL 1 MICROSECOND
             - INTERVAL 30 MINUTE]) AS window_start
        FROM events)
      GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Tumbling 1-hour windows per event type: count + exact value sum. */
  val hourly = QueryDef("ev_hourly_agg",
    (s, d) => Tables.events(s, d)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sumd(dec(col("value"))).as("sum_value"))
      .orderBy(col("hour"), col("event_type")),
    Some("""SELECT date_trunc('hour', ts) AS hour, event_type,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Gap-based sessionization (30-min inactivity): per user, number of
    * sessions and the largest session (by event count). Lag → gap flag →
    * running sum = session id — the canonical window-function recipe. */
  val sessionize = QueryDef("ev_sessionize",
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
      sess.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          max(col("n_events")).as("max_session_events"))
        .orderBy(col("user_id"))
    },
    Some("""WITH marked AS (SELECT user_id, event_id, ts,
        CASE WHEN lag(ts) OVER w IS NULL
          OR date_diff('second', lag(ts) OVER w, ts) > 1800
          THEN 1 ELSE 0 END AS new_sess
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (SELECT user_id,
        SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked),
      per_session AS (SELECT user_id, session_id, COUNT(*) AS n_events
        FROM sess GROUP BY 1, 2)
      SELECT user_id, COUNT(*) AS n_sessions,
        MAX(n_events) AS max_session_events
      FROM per_session GROUP BY user_id ORDER BY user_id"""))

  /** Native `session_window` twin of [[sessionize]] — the same
    * per-user gap-session rollup expressed as Spark's built-in session
    * window AGGREGATION instead of the lag → flag → running-sum window
    * recipe. One shuffle on the grouping key, per-partition sort, and
    * the sessions merge inside the aggregation operator
    * (UpdatingSessions/MergingSessions) — no window functions in the
    * plan at all, and it is the form Structured Streaming runs natively
    * with watermark-driven state eviction (the streaming story the lag
    * recipe cannot have: `lag` needs the whole history, session_window
    * state is one open session per key).
    *
    * Boundary semantics are IDENTICAL to [[sessionize]]: Spark merges
    * a session whose next event lands exactly at prev + gap (merge on
    * next.start <= prev.end — SessionWindowSpec pins this with an
    * exact-1800 s fixture), so only diff > gap splits, the same strict
    * rule the lag recipe uses. The oracle is therefore the same lag
    * recipe text — one query, two plan families, hash-equal. */
  val sessionizeNative = QueryDef("ev_sessionize_native",
    (s, d) => Tables.events(s, d)
      .groupBy(col("user_id"),
        session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events"))
      .orderBy(col("user_id")),
    Some("""WITH marked AS (SELECT user_id, event_id, ts,
        CASE WHEN lag(ts) OVER w IS NULL
          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
          THEN 1 ELSE 0 END AS new_sess
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (SELECT user_id,
        SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM marked),
      per_session AS (SELECT user_id, session_id, COUNT(*) AS n_events
        FROM sess GROUP BY 1, 2)
      SELECT user_id, COUNT(*) AS n_sessions,
        MAX(n_events) AS max_session_events
      FROM per_session GROUP BY user_id ORDER BY user_id"""))

  /** JSON property extraction: sum of props.k per event type. */
  val jsonProps = QueryDef("ev_json_props",
    (s, d) => Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n"), sum(col("k")).as("sum_k"))
      .orderBy(col("event_type")),
    Some("""SELECT event_type, COUNT(k) AS n, CAST(SUM(k) AS BIGINT) AS sum_k FROM (
        SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events)
      GROUP BY event_type ORDER BY event_type"""))

  /** Busiest minute per event type (windowed top-1). */
  val topMinute = QueryDef("ev_top_minute",
    (s, d) => {
      val counts = Tables.events(s, d)
        .groupBy(date_trunc("minute", col("ts")).as("minute"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("n").desc, col("minute"))
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("minute"), col("n"))
        .orderBy(col("event_type"))
    },
    Some("""SELECT event_type, minute, n FROM (
        SELECT event_type, minute, n, ROW_NUMBER() OVER (
          PARTITION BY event_type ORDER BY n DESC, minute) AS rn
        FROM (SELECT date_trunc('minute', ts) AS minute, event_type,
          COUNT(*) AS n FROM events GROUP BY 1, 2))
      WHERE rn = 1 ORDER BY event_type"""))
}
