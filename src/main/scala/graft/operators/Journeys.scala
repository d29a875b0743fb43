package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** User-journey analytics over the events stream — the product-analytics
  * trio a clickstream warehouse runs daily on top of the sessionize /
  * funnel / attribution machinery ([[Events]]):
  *
  *  - `ev_path_trigrams`  — what users DO: the most common 3-step
  *    event-type sequences (the Sankey/flow diagram's edge weights);
  *  - `ev_bot_flags`      — who isn't human: per-user burstiness
  *    profiles with an integer-exact flag rule (the pre-curation bot
  *    filter a crawl/telemetry pipeline applies before any counting);
  *  - `ev_funnel_latency` — how long conversion takes: exact median /
  *    P90 seconds from first view to first purchase, by the
  *    [[Quantiles]] two-level selection (no global sort).
  *
  * All three ride the same per-user (ts, event_id)-ordered O(1)-frame
  * window shape as [[Events]]' inter-arrival profile — the frame never
  * buffers a user's history, so a 100 TB clickstream costs one
  * user-keyed shuffle per entry and nothing data-scaled thereafter:
  * trigram space is |types|³-bounded, the bot profile is one row per
  * user, and the latency relation is one row per converted user feeding
  * a selection whose only serial window is the ~#buckets offset
  * relation. */
object Journeys {

  def all: Seq[QueryDef] = Seq(pathTrigrams, botFlags, funnelLatency,
    retentionTriangle, activityHeatmap, lorenzUsers, newVsReturning,
    sessionDepthHist, survivalKm, cohortLtv)

  /** Cohort LTV triangle — `ev_retention_triangle`'s revenue twin (the
    * other half of every growth dashboard: WHO comes back is the count
    * triangle, what they're WORTH is this one): per (first-seen-day
    * cohort, age-in-days) purchase revenue, plus the running
    * LTV-per-user curve finance discounts against. Revenue sums ride
    * DECIMAL(12,2) end to end (the Num money convention — the
    * cumulative window is an exact decimal sum, so summation order
    * never matters) and per-user normalization is ONE IEEE division at
    * the end. Shape: one user-keyed agg for cohorts, one
    * (cohort × age) hash agg for the triangle, and a cumulative window
    * PARTITIONED by cohort whose frame is calendar-bounded (≤ #days
    * rows per cohort) — one shuffle each, nothing data-scaled past the
    * purchase rollup at any corpus size. */
  val cohortLtv = QueryDef("ev_cohort_ltv",
    (s, d) => {
      import org.apache.spark.sql.expressions.{Window => W}
      val ev = Tables.events(s, d)
      val cohorts = ev.groupBy(col("user_id"))
        .agg(min(date_trunc("day", col("ts"))).as("cohort_day"))
      val sizes = cohorts.groupBy(col("cohort_day"))
        .agg(count(lit(1)).as("cohort_size"))
      val rev = ev.filter(col("event_type") === "purchase")
        .join(cohorts, "user_id")
        .groupBy(col("cohort_day"),
          datediff(date_trunc("day", col("ts")), col("cohort_day"))
            .cast("long").as("age_days"))
        .agg(sum(col("value").cast("decimal(12,2)")).as("rev"))
      val cum = rev.withColumn("cum_rev",
        sum(col("rev")).over(W.partitionBy(col("cohort_day"))
          .orderBy(col("age_days"))
          .rowsBetween(W.unboundedPreceding, 0)))
      cum.join(sizes, "cohort_day")
        .select(col("cohort_day"), col("age_days"), col("cohort_size"),
          col("rev").cast("double").as("revenue"),
          (col("cum_rev").cast("double") /
            col("cohort_size").cast("double")).as("cum_ltv_per_user"))
        .orderBy(col("cohort_day"), col("age_days"))
    },
    Some("""WITH cohorts AS (SELECT user_id,
        MIN(date_trunc('day', ts)) AS cohort_day FROM events GROUP BY 1),
      sizes AS (SELECT cohort_day, COUNT(*) AS cohort_size
        FROM cohorts GROUP BY 1),
      rev AS (SELECT c.cohort_day,
          CAST(date_diff('day', c.cohort_day, date_trunc('day', e.ts))
            AS BIGINT) AS age_days,
          SUM(CAST(e.value AS DECIMAL(12,2))) AS rev
        FROM events e JOIN cohorts c USING (user_id)
        WHERE e.event_type = 'purchase' GROUP BY 1, 2),
      cum AS (SELECT cohort_day, age_days, rev,
          SUM(rev) OVER (PARTITION BY cohort_day ORDER BY age_days
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_rev
        FROM rev)
      SELECT c.cohort_day, c.age_days, s.cohort_size,
        CAST(c.rev AS DOUBLE) AS revenue,
        CAST(c.cum_rev AS DOUBLE) / CAST(s.cohort_size AS DOUBLE)
          AS cum_ltv_per_user
      FROM cum c JOIN sizes s USING (cohort_day)
      ORDER BY cohort_day, age_days"""))

  /** Follow-up horizon for [[survivalKm]] (days): conversions past it
    * are administratively censored — the "7-day conversion" window. */
  val KmHorizon = 7

  /** Kaplan–Meier time-to-conversion — survival analysis with RIGHT
    * CENSORING done properly (the retention family's missing member):
    * Ŝ(t) = the probability a user remains UNCONVERTED t days after
    * entry, under a fixed [[KmHorizon]]-day follow-up. `ev_funnel`
    * counts who converts and `ev_funnel_latency` how fast the
    * converters convert; both silently DROP the users observation cut
    * short. KM is the estimator that uses them: a user whose first
    * purchase lands within HORIZON days of their first event is an
    * EVENT at that age; anyone else is CENSORED at
    * min(HORIZON, last-seen age) — still at risk up to where
    * observation stopped, never miscounted as "didn't convert"
    * (administrative right-censoring, the textbook 7-day-conversion
    * form; on the driver corpus both paths are live: sf0.01 has
    * events at every age 0–7 plus 4 censored users, sf0.1 38).
    *
    * Shape: per age t, d_t events and c_t censorings from ONE
    * user-keyed agg; risk set n_t = Σ_{u≥t}(d_u+c_u) as an exclusive
    * cumsum over the age relation — ≤ HORIZON+1 rows BY CONSTRUCTION
    * (the q42_moving_range serial-window class, allowlisted); and
    * Ŝ(t) = Π_{u≤t}(n_u−d_u)/n_u with the cumulative product an
    * explicit LEFT FOLD over the age-sorted ≤8-term list in BOTH
    * engines (stat_cramers_v convention: sort_array+aggregate vs
    * list(ORDER BY)+list_reduce — never an order-free float product),
    * each factor ONE IEEE division of exact BIGINTs. Cost: one
    * user-keyed shuffle, then nothing data-scaled at any corpus size. */
  val survivalKm = QueryDef("ev_survival_km",
    (s, d) => {
      import org.apache.spark.sql.expressions.{Window => W}
      val h = lit(KmHorizon)
      val perUser = Tables.events(s, d).groupBy(col("user_id"))
        .agg(min(to_date(col("ts"))).as("d0"),
          max(to_date(col("ts"))).as("dl"),
          min(when(col("event_type") === "purchase", to_date(col("ts"))))
            .as("fp"))
      val isEvent = col("fp").isNotNull &&
        datediff(col("fp"), col("d0")) <= h
      val lab = perUser.select(
        when(isEvent, datediff(col("fp"), col("d0")).cast("long"))
          .otherwise(least(h.cast("long"),
            datediff(col("dl"), col("d0")).cast("long"))).as("t"),
        when(isEvent, 1L).otherwise(0L).as("ev"))
      val ages = lab.groupBy(col("t"))
        .agg(sum(col("ev")).as("d"), sum(lit(1L) - col("ev")).as("c"))
      val tot = lab.agg(count(lit(1)).as("n_users"))
      val cells = ages.crossJoin(broadcast(tot))
        .withColumn("n_risk", col("n_users") -
          coalesce(sum(col("d") + col("c")).over(
            // exclusive cumsum over the ≤ HORIZON+1-row age relation —
            // bounded by construction (allowlisted in the plan sweep)
            W.orderBy(col("t")).rowsBetween(W.unboundedPreceding, -1)),
            lit(0L)))
        .select(col("t"), col("d"), col("c"), col("n_risk"))
      // hazard factors only at event ages; ≤ HORIZON+1 rows
      val terms = cells.where(col("d") > 0L)
        .select(col("t").as("t2"), col("d").as("d2"),
          col("n_risk").as("n2"))
      cells.join(broadcast(terms), col("t2") <= col("t"), "left")
        .groupBy(col("t"), col("d"), col("c"), col("n_risk"))
        .agg(expr("""aggregate(sort_array(collect_list(CASE WHEN t2 IS NULL
            THEN NULL ELSE struct(t2,
              cast(n2 - d2 as double) / cast(n2 as double) as f) END)),
          cast(1.0 as double), (acc, x) -> acc * x.f)""").as("s_hat"))
        .select(col("t"), col("n_risk"), col("d").as("d_events"),
          col("c").as("c_censored"), col("s_hat"))
        .orderBy(col("t"))
    },
    Some(s"""WITH per_user AS (SELECT user_id,
        MIN(CAST(ts AS DATE)) AS d0, MAX(CAST(ts AS DATE)) AS dl,
        MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END)
          AS fp
        FROM events GROUP BY user_id),
      lab AS (SELECT CASE
          WHEN fp IS NOT NULL AND datediff('day', d0, fp) <= $KmHorizon
          THEN CAST(datediff('day', d0, fp) AS BIGINT)
          ELSE LEAST($KmHorizon, CAST(datediff('day', d0, dl) AS BIGINT))
          END AS t,
        CASE WHEN fp IS NOT NULL AND datediff('day', d0, fp) <= $KmHorizon
          THEN 1 ELSE 0 END AS ev
        FROM per_user),
      ages AS (SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
          CAST(SUM(1 - ev) AS BIGINT) AS c FROM lab GROUP BY 1),
      tot AS (SELECT COUNT(*) AS n_users FROM lab),
      cells AS (SELECT t, d, c,
          n_users - COALESCE(CAST(SUM(d + c) OVER (ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
            0) AS n_risk
        FROM ages CROSS JOIN tot),
      km AS (SELECT a.t, a.d, a.c, a.n_risk,
          list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
            COALESCE(list(CAST(b.n_risk - b.d AS DOUBLE) /
                CAST(b.n_risk AS DOUBLE) ORDER BY b.t)
              FILTER (WHERE b.t IS NOT NULL), [])),
            (x, y) -> x * y) AS s_hat
        FROM cells a LEFT JOIN cells b ON b.t <= a.t AND b.d > 0
        GROUP BY a.t, a.d, a.c, a.n_risk)
      SELECT t, n_risk, d AS d_events, c AS c_censored, s_hat
      FROM km ORDER BY t"""))

  /** New-vs-returning daily active users — the growth dashboard's core
    * split: per calendar day, how many active users are seeing their
    * FIRST day vs coming back. The first-seen trick
    * (`ev_cumulative_users`' machinery): collapse to distinct
    * (user, day), one user-keyed min for the first day, then one
    * calendar-bounded hash agg where new = (day == first_day). Integer
    * counts; the returning share is ONE division. */
  val newVsReturning = QueryDef("ev_new_vs_returning",
    (s, d) => {
      val userDays = Tables.events(s, d)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .distinct()
      val firstDay = userDays.groupBy(col("user_id"))
        .agg(min(col("day")).as("first_day"))
      userDays.join(firstDay, "user_id")
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_active"),
          sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
            .as("n_new"))
        .select(col("day"), col("n_active"), col("n_new"),
          (col("n_active") - col("n_new")).as("n_returning"),
          ((col("n_active") - col("n_new")).cast("double") /
            col("n_active").cast("double")).as("returning_frac"))
        .orderBy(col("day"))
    },
    Some("""WITH ud AS (SELECT DISTINCT user_id,
        date_trunc('day', ts) AS day FROM events),
      fd AS (SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY 1)
      SELECT day, COUNT(*) AS n_active,
        CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
          AS n_new,
        CAST(COUNT(*) - SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END)
          AS BIGINT) AS n_returning,
        CAST(COUNT(*) - SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END)
          AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS returning_frac
      FROM ud JOIN fd USING (user_id)
      GROUP BY day ORDER BY day"""))

  /** Session-depth distribution — how many events a gap-session holds
    * (the engagement histogram behind "bounce rate"): the sessionize
    * recipe's two O(1) frames assign session ids, one (user, session)
    * count, then a histogram over the per-session event counts —
    * depth-bounded output (max events per session), never data-scaled
    * past the session rollup. A 1-event session IS a bounce; the
    * bounce share falls out of the first row. */
  val sessionDepthHist = QueryDef("ev_session_depth_hist",
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
        .agg(count(lit(1)).as("depth"))
        .groupBy(col("depth"))
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("depth"))
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
      per_session AS (SELECT user_id, session_id, COUNT(*) AS depth
        FROM sess GROUP BY 1, 2)
      SELECT depth, COUNT(*) AS n_sessions
      FROM per_session GROUP BY 1 ORDER BY depth"""))

  /** Day-of-week × hour-of-day activity heatmap — the traffic-shape
    * dashboard (when are users active; feeds the seasonal-anomaly
    * baseline's intuition). DOW is computed PORTABLY as
    * (epoch_day + 4) mod 7 (epoch day 0 = Thursday ⇒ Sunday = 0) —
    * engines disagree on `dayofweek` numbering, integer arithmetic
    * does not. One hash agg to the 7×24-bounded grid with count +
    * distinct users per cell. */
  val activityHeatmap = QueryDef("ev_activity_heatmap",
    (s, d) => Tables.events(s, d)
      .select(
        ((floor(expr("unix_seconds(ts)").cast("double") / 86400.0)
          .cast("long") + 4L) % 7L).as("dow"),
        hour(col("ts")).cast("long").as("hod"),
        col("user_id"))
      .groupBy(col("dow"), col("hod"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("dow"), col("hod")),
    Some("""SELECT
        (CAST(FLOOR(CAST(epoch(ts) AS DOUBLE) / 86400.0) AS BIGINT) + 4) % 7
          AS dow,
        CAST(hour(ts) AS BIGINT) AS hod,
        COUNT(*) AS n_events,
        CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events GROUP BY 1, 2 ORDER BY dow, hod"""))

  /** Revenue-concentration deciles (the Lorenz-curve table behind "the
    * top 10% of users drive X% of revenue") — per-user purchase spend,
    * users cut into ten value-edge buckets via ONE
    * [[Quantiles.valueAtRanks]] pass (nine exact decile edges, the
    * `stat_equidepth_histogram` convention: bucket = #edges strictly
    * below the user's spend, so ties land deterministically and the
    * buckets adapt to skew), then exact decimal spend sums per decile
    * and ONE IEEE division for each share. The only serial window is
    * the ~#buckets offset relation inside the selection; everything
    * else is the user-keyed rollup. */
  val lorenzUsers = QueryDef("ev_lorenz_users",
    (s, d) => {
      val spend = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(sum(col("value").cast("decimal(12,2)")).as("spend"))
        // decimal ≤2dp sums are exactly representable as doubles here;
        // the selection machinery runs on the double image
        .withColumn("v", col("spend").cast("double"))
      val edges = graft.operators.Quantiles.valueAtRanks(
        spend.select(col("v")), "v", 100.0,
        (1 to 9).map(k => s"e$k" ->
          floor(lit(k / 10.0) * (col("n") - 1).cast("double"))))
      val tot = spend.agg(count(lit(1)).as("n_total"),
        sum(col("spend")).as("spend_total"))
      spend.crossJoin(broadcast(edges)).crossJoin(broadcast(tot))
        .withColumn("decile",
          (1 to 9).map(k => when(col("v") > col(s"e$k"), 1L).otherwise(0L))
            .reduce(_ + _))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_users"),
          sum(col("spend")).as("decile_spend"),
          first(col("spend_total")).as("st"))
        .select(col("decile"), col("n_users"),
          col("decile_spend").cast("double").as("decile_spend"),
          (col("decile_spend").cast("double") / col("st").cast("double"))
            .as("spend_share"))
        .orderBy(col("decile"))
    },
    Some("""WITH spend AS (SELECT user_id,
          SUM(CAST(value AS DECIMAL(12,2))) AS spend,
          CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS v
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      nr AS (SELECT COUNT(*) AS n FROM spend),
      o AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) - 1 AS idx FROM spend),
      edges AS (SELECT
          MAX(CASE WHEN idx = CAST(FLOOR(0.1 * CAST(n - 1 AS DOUBLE)) AS BIGINT) THEN v END) AS e1,
          MAX(CASE WHEN idx = CAST(FLOOR(0.2 * CAST(n - 1 AS DOUBLE)) AS BIGINT) THEN v END) AS e2,
          MAX(CASE WHEN idx = CAST(FLOOR(0.3 * CAST(n - 1 AS DOUBLE)) AS BIGINT) THEN v END) AS e3,
          MAX(CASE WHEN idx = CAST(FLOOR(0.4 * CAST(n - 1 AS DOUBLE)) AS BIGINT) THEN v END) AS e4,
          MAX(CASE WHEN idx = CAST(FLOOR(0.5 * CAST(n - 1 AS DOUBLE)) AS BIGINT) THEN v END) AS e5,
          MAX(CASE WHEN idx = CAST(FLOOR(0.6 * CAST(n - 1 AS DOUBLE)) AS BIGINT) THEN v END) AS e6,
          MAX(CASE WHEN idx = CAST(FLOOR(0.7 * CAST(n - 1 AS DOUBLE)) AS BIGINT) THEN v END) AS e7,
          MAX(CASE WHEN idx = CAST(FLOOR(0.8 * CAST(n - 1 AS DOUBLE)) AS BIGINT) THEN v END) AS e8,
          MAX(CASE WHEN idx = CAST(FLOOR(0.9 * CAST(n - 1 AS DOUBLE)) AS BIGINT) THEN v END) AS e9
        FROM o CROSS JOIN nr),
      tot AS (SELECT COUNT(*) AS n_total, SUM(spend) AS st FROM spend)
      SELECT
        CAST(CASE WHEN v > e1 THEN 1 ELSE 0 END + CASE WHEN v > e2 THEN 1 ELSE 0 END +
         CASE WHEN v > e3 THEN 1 ELSE 0 END + CASE WHEN v > e4 THEN 1 ELSE 0 END +
         CASE WHEN v > e5 THEN 1 ELSE 0 END + CASE WHEN v > e6 THEN 1 ELSE 0 END +
         CASE WHEN v > e7 THEN 1 ELSE 0 END + CASE WHEN v > e8 THEN 1 ELSE 0 END +
         CASE WHEN v > e9 THEN 1 ELSE 0 END AS BIGINT) AS decile,
        COUNT(*) AS n_users,
        CAST(SUM(spend) AS DOUBLE) AS decile_spend,
        CAST(SUM(spend) AS DOUBLE) / CAST(st AS DOUBLE) AS spend_share
      FROM spend CROSS JOIN edges CROSS JOIN tot
      GROUP BY 1, st ORDER BY decile"""))

  /** Full cohort-retention triangle — the matrix behind every retention
    * heatmap (`ev_retention` reports only the D1/D7 cuts): users
    * cohorted by FIRST active day, one row per (cohort day, day
    * offset) with the distinct users still active then. Plan: collapse
    * events to distinct (user, day) — the big reduction — then one
    * user-keyed min for the cohort day, one join back, one hash agg;
    * the output is calendar²-bounded (≤ 30×30 here) at any corpus
    * size. Integer counts; retention RATES are one division away and
    * left to the reader (the per-cell convention). */
  val retentionTriangle = QueryDef("ev_retention_triangle",
    (s, d) => {
      val userDays = Tables.events(s, d)
        .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
        .distinct()
      val cohorts = userDays.groupBy(col("user_id"))
        .agg(min(col("day")).as("cohort_day"))
      userDays.join(cohorts, "user_id")
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).cast("long")
            .as("offset_days"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_day"), col("offset_days"))
    },
    Some("""WITH ud AS (SELECT DISTINCT user_id,
        date_trunc('day', ts) AS day FROM events),
      cohorts AS (SELECT user_id, MIN(day) AS cohort_day
        FROM ud GROUP BY 1)
      SELECT c.cohort_day,
        CAST(date_diff('day', c.cohort_day, ud.day) AS BIGINT)
          AS offset_days,
        CAST(COUNT(DISTINCT ud.user_id) AS BIGINT) AS n_users
      FROM ud JOIN cohorts c USING (user_id)
      GROUP BY 1, 2 ORDER BY cohort_day, offset_days"""))

  /** Top-20 3-step event-type paths across all users — the flow-diagram
    * aggregate. Two O(1) `lead` frames per user (never a buffered
    * history), then a hash aggregation whose key space is bounded by
    * |event types|³ (125 here) regardless of corpus size; top-20 plans
    * as TakeOrderedAndProject. Count ties break lexicographically on
    * the path so the dump is deterministic. */
  /** The per-user trigram expansion shared by the batch entry and the
    * streaming twin's parity test: one row per 3-consecutive-event
    * window, keyed by user. */
  def trigramsOf(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("step1"))
      .withColumn("step2", lead(col("step1"), 1).over(w))
      .withColumn("step3", lead(col("step1"), 2).over(w))
      .filter(col("step3").isNotNull)
      .select(col("user_id"), col("step1"), col("step2"), col("step3"))
  }

  val pathTrigrams = QueryDef("ev_path_trigrams",
    (s, d) => trigramsOf(Tables.events(s, d))
      .groupBy(col("step1"), col("step2"), col("step3"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("step1"), col("step2"), col("step3"))
      .limit(20),
    Some("""WITH p AS (SELECT
        event_type AS step1,
        lead(event_type, 1) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS step2,
        lead(event_type, 2) OVER (PARTITION BY user_id
          ORDER BY ts, event_id) AS step3
        FROM events)
      SELECT step1, step2, step3, COUNT(*) AS n
      FROM p WHERE step3 IS NOT NULL
      GROUP BY 1, 2, 3
      ORDER BY n DESC, step1, step2, step3 LIMIT 20"""))

  /** Burst-gap threshold: a "fast" inter-event gap is ≤ 1 hour. On the
    * corpus's diurnal human traffic (median gap ≈ 7 h) this lands well
    * under the first quartile, so the fast FRACTION separates bursty
    * accounts instead of flagging everyone. */
  val FastGapUs = 3600L * 1000000L

  /** Minimum gap count before a user is profiled — rate rules on a
    * handful of events are noise. */
  val MinGaps = 20L

  /** Per-user burstiness profile + bot flag — the automation screen run
    * before any engagement metric is trusted: users whose inter-event
    * gaps are ≤ 1 h for at least 1/8 of their (≥ [[MinGaps]]) gaps are
    * flagged. The decision `8·n_fast ≥ n_gaps` is a pure BIGINT
    * compare (no float threshold to drift cross-engine); `fast_frac`
    * is the one IEEE division, emitted for dashboards but never used
    * in the flag. One lag window per user + one user-keyed aggregation
    * — the [[Events]] inter-arrival shape with a per-user rollup. */
  val botFlags = QueryDef("ev_bot_flags",
    (s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("gap_us",
          expr("unix_micros(ts) - unix_micros(prev_ts)"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("gap_us").isNotNull, 1L).otherwise(0L)).as("n_gaps"),
          sum(when(col("gap_us") <= FastGapUs, 1L).otherwise(0L))
            .as("n_fast"))
        .filter(col("n_gaps") >= MinGaps)
        .select(col("user_id"), col("n_events"), col("n_gaps"), col("n_fast"),
          (col("n_fast").cast("double") / col("n_gaps").cast("double"))
            .as("fast_frac"),
          when(col("n_fast") * 8L >= col("n_gaps"), 1L).otherwise(0L)
            .as("is_bot"))
        .orderBy(col("user_id"))
    },
    Some(s"""WITH g AS (SELECT user_id,
        epoch_us(ts) - epoch_us(lag(ts) OVER (
          PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
        FROM events),
      prof AS (SELECT user_id, COUNT(*) AS n_events,
        CAST(SUM(CASE WHEN gap_us IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS n_gaps,
        CAST(SUM(CASE WHEN gap_us <= $FastGapUs THEN 1 ELSE 0 END)
          AS BIGINT) AS n_fast
        FROM g GROUP BY 1)
      SELECT user_id, n_events, n_gaps, n_fast,
        CAST(n_fast AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS fast_frac,
        CAST(CASE WHEN n_fast * 8 >= n_gaps THEN 1 ELSE 0 END AS BIGINT)
          AS is_bot
      FROM prof WHERE n_gaps >= $MinGaps ORDER BY user_id"""))

  /** Exact conversion-latency distribution — median and P90 micro-
    * seconds from a user's FIRST view to their FIRST purchase (strictly
    * after it), over converted users only. The funnel entry counts who
    * converts; this measures how long it takes — the other axis every
    * funnel dashboard plots.
    *
    * Latencies are exact BIGINT microsecond differences of two per-user
    * `min` timestamps (one user-keyed aggregation). The order
    * statistics come from [[Quantiles.valueAtRanks]]'s two-level prefix
    * sum — discrete ranks floor((n−1)/2) and floor(0.9·(n−1)), no
    * interpolation, no global sort; the oracle spells the same ranks
    * via ROW_NUMBER. Converted-user count rides along from the same
    * relation. */
  val funnelLatency = QueryDef("ev_funnel_latency",
    (s, d) => {
      val lats = Tables.events(s, d)
        .groupBy(col("user_id"))
        .agg(min(when(col("event_type") === "view", col("ts"))).as("fv"),
          min(when(col("event_type") === "purchase", col("ts"))).as("fp"))
        .filter(col("fp") > col("fv"))
        .select((expr("unix_micros(fp)") - expr("unix_micros(fv)")).as("v"))
      val ranks = graft.operators.Quantiles.valueAtRanks(lats, "v", 1e10,
        Seq("med_latency_us" ->
            floor((col("n") - 1).cast("double") / 2),
          "p90_latency_us" ->
            floor(lit(0.9) * (col("n") - 1).cast("double"))))
      ranks.crossJoin(broadcast(lats.agg(count(lit(1)).as("n_converted"))))
        .select(col("n_converted"),
          // v is BIGINT micros; emit DOUBLE (exact ≤ 2^53) to match the
          // oracle's selection columns
          col("med_latency_us").cast("double").as("med_latency_us"),
          col("p90_latency_us").cast("double").as("p90_latency_us"))
    },
    Some("""WITH f AS (SELECT user_id,
        MIN(CASE WHEN event_type = 'view' THEN ts END) AS fv,
        MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
        FROM events GROUP BY 1),
      lats AS (SELECT epoch_us(fp) - epoch_us(fv) AS v
        FROM f WHERE fp > fv),
      nr AS (SELECT COUNT(*) AS n FROM lats),
      o AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) - 1 AS idx FROM lats),
      med AS (SELECT CAST(MAX(v) AS DOUBLE) AS med_latency_us
        FROM o CROSS JOIN nr
        WHERE idx = CAST(FLOOR(CAST(n - 1 AS DOUBLE) / 2) AS BIGINT)),
      p90 AS (SELECT CAST(MAX(v) AS DOUBLE) AS p90_latency_us
        FROM o CROSS JOIN nr
        WHERE idx = CAST(FLOOR(0.9 * CAST(n - 1 AS DOUBLE)) AS BIGINT))
      SELECT n AS n_converted, med_latency_us, p90_latency_us
      FROM nr CROSS JOIN med CROSS JOIN p90"""))
}
