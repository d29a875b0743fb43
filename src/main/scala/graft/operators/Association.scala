package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Association measures between columns — the "are these related, and
  * how strongly" pair completing the drift/shift toolkit (KS, U, χ²,
  * PSI, Welch test SIGNIFICANCE; these measure STRENGTH):
  *
  *  - `stat_mutual_info` — mutual information between two categorical
  *    columns, decomposed per cell (the χ² table's information-
  *    theoretic twin: which (lang, source) cells carry the
  *    dependence);
  *  - `stat_kendall_tau` — rank correlation (τ-b) between two daily
  *    series (revenue vs order volume) — Pearson ([[graft.queries.Statistics]]
  *    autocorr/OLS) answers "linear"; τ answers "monotone", robust to
  *    outliers and any monotone rescaling.
  *
  * Scale shape: MI is one scan → one (lang × source)-bounded hash agg
  * with margins re-aggregated from the table itself (the χ² plan with
  * an `ln` in the cell formula); τ runs its all-pairs comparison on
  * the per-DAY relation — calendar-bounded (~30 rows here, never
  * data-scaled), so C(days, 2) is a constant of the reporting window,
  * not the corpus. */
object Association {

  def all: Seq[QueryDef] = Seq(mutualInfo, kendallTau, cramersV)

  /** Per-cell mutual-information decomposition of lang × source:
    * pmi = ln(o·N/(r·c)) and the cell's MI contribution (o/N)·pmi.
    * Emitting TERMS as rows (the [[graft.queries.Statistics]] Benford/χ²
    * convention) both names which cells drive the dependence and
    * sidesteps the order-dependent float total — a reader sums the
    * ≤|langs|·|sources| terms at whatever precision it wants. Float
    * discipline: integer products widen to DECIMAL(38,0) BEFORE any
    * cast (BIGINT o·N overflows at ~1e12 rows), each factor is ONE
    * IEEE division, the log is the bit-parity `math_ln`. */
  val mutualInfo = QueryDef("stat_mutual_info",
    (s, d) => {
      graft.functions.HashExpressions.register(s)
      val obs = Tables.documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("o"))
      val rm = obs.groupBy(col("lang")).agg(sum(col("o")).as("r"))
      val cm = obs.groupBy(col("source")).agg(sum(col("o")).as("c"))
      val tot = obs.agg(sum(col("o")).as("n"))
      obs.join(rm, "lang").join(cm, "source")
        .crossJoin(broadcast(tot))
        .withColumn("pmi", expr(
          """math_ln(CAST(CAST(o AS DECIMAL(38,0)) * n AS DOUBLE) /
             CAST(CAST(r AS DECIMAL(38,0)) * c AS DOUBLE))"""))
        .withColumn("mi_term",
          (col("o").cast("double") / col("n").cast("double")) * col("pmi"))
        .select(col("lang"), col("source"), col("o").as("observed"),
          col("pmi"), col("mi_term"))
        .orderBy(col("lang"), col("source"))
    },
    Some("""WITH obs AS (SELECT lang, source, COUNT(*) AS o
        FROM documents GROUP BY 1, 2),
      rm AS (SELECT lang, SUM(o) AS r FROM obs GROUP BY 1),
      cm AS (SELECT source, SUM(o) AS c FROM obs GROUP BY 1),
      tot AS (SELECT SUM(o) AS n FROM obs)
      SELECT obs.lang, obs.source, o AS observed,
        ln(CAST(CAST(o AS DECIMAL(38,0)) * n AS DOUBLE) /
           CAST(CAST(r AS DECIMAL(38,0)) * c AS DOUBLE)) AS pmi,
        (CAST(o AS DOUBLE) / CAST(n AS DOUBLE)) *
          ln(CAST(CAST(o AS DECIMAL(38,0)) * n AS DOUBLE) /
             CAST(CAST(r AS DECIMAL(38,0)) * c AS DOUBLE)) AS mi_term
      FROM obs JOIN rm USING (lang) JOIN cm USING (source) CROSS JOIN tot
      ORDER BY lang, source"""))

  /** Kendall τ-b between daily order volume and daily revenue. The
    * pair comparison is exact end to end: counts are BIGINTs, revenue
    * is an exact DECIMAL sum, so concordant/discordant/tie classes are
    * integer-exact; τ-b's denominator √((n₀−t_x)(n₀−t_y)) is one
    * DECIMAL(38,0) product cast to double under an IEEE-correctly-
    * rounded sqrt (libm agreement free, the Wilson-interval lesson),
    * and τ is ONE division. Self-join keyed a.day < b.day over the
    * calendar-bounded daily relation. */
  val kendallTau = QueryDef("stat_kendall_tau",
    (s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("o_totalprice").cast("decimal(12,2)")).as("rev"))
      val a = daily.select(col("day").as("day_a"), col("cnt").as("cnt_a"),
        col("rev").as("rev_a"))
      val b = daily.select(col("day").as("day_b"), col("cnt").as("cnt_b"),
        col("rev").as("rev_b"))
      val pairs = a.join(b, col("day_a") < col("day_b"))
        .select(
          when((col("cnt_b") > col("cnt_a") && col("rev_b") > col("rev_a")) ||
            (col("cnt_b") < col("cnt_a") && col("rev_b") < col("rev_a")), 1L)
            .otherwise(0L).as("conc"),
          when((col("cnt_b") > col("cnt_a") && col("rev_b") < col("rev_a")) ||
            (col("cnt_b") < col("cnt_a") && col("rev_b") > col("rev_a")), 1L)
            .otherwise(0L).as("disc"),
          when(col("cnt_b") === col("cnt_a"), 1L).otherwise(0L).as("tx"),
          when(col("rev_b") === col("rev_a"), 1L).otherwise(0L).as("ty"))
      pairs
        .agg(count(lit(1)).as("n_pairs"), sum(col("conc")).as("nc"),
          sum(col("disc")).as("nd"), sum(col("tx")).as("tie_x"),
          sum(col("ty")).as("tie_y"))
        .withColumn("tau_b",
          (col("nc") - col("nd")).cast("double") /
            sqrt(((col("n_pairs") - col("tie_x")).cast("decimal(38,0)") *
              (col("n_pairs") - col("tie_y"))).cast("double")))
        .select(col("n_pairs"), col("nc"), col("nd"), col("tie_x"),
          col("tie_y"), col("tau_b"))
    },
    Some("""WITH daily AS (SELECT date_trunc('day', o_orderdate) AS day,
        COUNT(*) AS cnt,
        SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
        FROM orders GROUP BY 1),
      pairs AS (SELECT
        CASE WHEN (b.cnt > a.cnt AND b.rev > a.rev) OR
                  (b.cnt < a.cnt AND b.rev < a.rev) THEN 1 ELSE 0 END
          AS conc,
        CASE WHEN (b.cnt > a.cnt AND b.rev < a.rev) OR
                  (b.cnt < a.cnt AND b.rev > a.rev) THEN 1 ELSE 0 END
          AS disc,
        CASE WHEN b.cnt = a.cnt THEN 1 ELSE 0 END AS tx,
        CASE WHEN b.rev = a.rev THEN 1 ELSE 0 END AS ty
        FROM daily a JOIN daily b ON a.day < b.day),
      agg AS (SELECT COUNT(*) AS n_pairs,
        CAST(SUM(conc) AS BIGINT) AS nc, CAST(SUM(disc) AS BIGINT) AS nd,
        CAST(SUM(tx) AS BIGINT) AS tie_x, CAST(SUM(ty) AS BIGINT) AS tie_y
        FROM pairs)
      SELECT n_pairs, nc, nd, tie_x, tie_y,
        CAST(nc - nd AS DOUBLE) /
          sqrt(CAST(CAST(n_pairs - tie_x AS DECIMAL(38,0)) *
            (n_pairs - tie_y) AS DOUBLE)) AS tau_b
      FROM agg"""))

  /** Cramér's V — the one-number EFFECT SIZE for the lang × source
    * pair: χ² scales with N (any dependence becomes "significant" at
    * 100 TB), V = √(χ²/(N·(min(R,C)−1))) ∈ [0,1] does not — the number
    * a drift dashboard thresholds on. The per-cell terms are exactly
    * `stat_chi2_independence`'s (same DECIMAL(38,0) products, one IEEE
    * division each); the χ² TOTAL — a float sum — is an explicit LEFT
    * FOLD over the (lang, source)-sorted cell list in both engines
    * (sort_array + `aggregate` vs list(ORDER BY) + `list_reduce`, the
    * eval_ndcg convention), never an order-free hash-agg float sum.
    * The fold runs over the ≤|langs|·|sources|-row contingency
    * relation — feature-bounded, not data-scaled. */
  val cramersV = QueryDef("stat_cramers_v",
    (s, d) => {
      val obs = Tables.documents(s, d)
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("o"))
      val rm = obs.groupBy(col("lang")).agg(sum(col("o")).as("r"))
      val cm = obs.groupBy(col("source")).agg(sum(col("o")).as("c"))
      val tot = obs.agg(sum(col("o")).as("n"))
      val cells = obs.join(rm, "lang").join(cm, "source")
        .crossJoin(broadcast(tot))
        .withColumn("dev",
          (col("o").cast("decimal(38,0)") * col("n") -
            col("r").cast("decimal(38,0)") * col("c")).cast("double"))
        .withColumn("chi2_term",
          col("dev") * col("dev") /
            (col("n").cast("decimal(38,0)") * col("r") * col("c"))
              .cast("double"))
      cells.agg(
          expr("""aggregate(sort_array(collect_list(
              struct(lang, source, chi2_term))),
            cast(0 as double), (acc, x) -> acc + x.chi2_term)""").as("chi2"),
          max(col("n")).as("n"),
          countDistinct(col("lang")).as("r_levels"),
          countDistinct(col("source")).as("c_levels"))
        .select(col("chi2"), col("n"), col("r_levels"), col("c_levels"),
          // a 1-level factor has no association to measure → NULL
          when(least(col("r_levels"), col("c_levels")) > 1L,
            sqrt(col("chi2") /
              (col("n").cast("decimal(38,0)") *
                (least(col("r_levels"), col("c_levels")) - 1L))
                .cast("double"))).as("cramers_v"))
    },
    Some("""WITH obs AS (SELECT lang, source, COUNT(*) AS o
        FROM documents GROUP BY 1, 2),
      rm AS (SELECT lang, SUM(o) AS r FROM obs GROUP BY 1),
      cm AS (SELECT source, SUM(o) AS c FROM obs GROUP BY 1),
      tot AS (SELECT SUM(o) AS n FROM obs),
      cells AS (SELECT obs.lang, obs.source, n,
          CAST(CAST(o AS DECIMAL(38,0)) * n -
            CAST(r AS DECIMAL(38,0)) * c AS DOUBLE) AS dev,
          CAST(CAST(n AS DECIMAL(38,0)) * r * c AS DOUBLE) AS denom
        FROM obs JOIN rm USING (lang) JOIN cm USING (source) CROSS JOIN tot),
      agg AS (SELECT
          list_reduce(list_prepend(CAST(0 AS DOUBLE),
            list(dev * dev / denom ORDER BY lang, source)),
            (a, b) -> a + b) AS chi2,
          CAST(MAX(n) AS BIGINT) AS n,
          CAST(COUNT(DISTINCT lang) AS BIGINT) AS r_levels,
          CAST(COUNT(DISTINCT source) AS BIGINT) AS c_levels
        FROM cells)
      SELECT chi2, n, r_levels, c_levels,
        CASE WHEN LEAST(r_levels, c_levels) > 1 THEN
          sqrt(chi2 / CAST(CAST(n AS DECIMAL(38,0)) *
            (LEAST(r_levels, c_levels) - 1) AS DOUBLE))
        END AS cramers_v
      FROM agg"""))
}
