package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}

/** Poisson-bootstrap confidence interval for the mean — THE bootstrap
  * that scales (Chamandy et al., "Estimating Uncertainty for Massive
  * Data Streams", and the Kleiner et al. BLB line of work): classical
  * resampling draws n-out-of-n WITH replacement, which requires global
  * coordination per replica; the Poisson approximation instead gives
  * every row an INDEPENDENT Poisson(1) multiplicity per replica
  * (Binomial(n, 1/n) → Poisson(1) as n grows), so all B replicas are
  * computed in ONE scan with a B-way fan-out and a (replica)-keyed
  * aggregation — embarrassingly parallel, no global sample step, the
  * only way a bootstrap runs on 100 TB.
  *
  * Determinism: the per-(row, replica) uniform comes from the quadratic
  * hash mod 2³¹−1 of key = orderkey·B + replica (an affine hash of a
  * sequential key carries sawtooth sign correlations — the r10 JL
  * lesson; the x² term, reduced mod p before multiplying, breaks the
  * linearity and keeps every intermediate < p² < 2⁶³). The uniform is
  * inverted through the Poisson(1) CDF as a fixed CASE chain over
  * hard-coded double literals (cumulative e⁻¹·Σ1/k!) TRUNCATED at
  * multiplicity 6 — tail mass ~8.3e-5, absorbed identically by both
  * engines, so the entry stays hash-exact.
  *
  * Replica means divide an exact DECIMAL(12,2) price sum by an exact
  * BIGINT count — one IEEE division each; the 2.5%/97.5% CI bounds are
  * ORDER STATISTICS of the 64 replica means (2nd and 63rd of the
  * sorted list — exact selection, no interpolation, engine-identical),
  * picked from a sorted 64-element array on a 1-row relation.
  *
  * Scale: scan → 64-way explode (row-local) → replica-keyed partial
  * agg (64 groups, map-side combinable) → 64-row final fold. */
object Bootstrap {

  def all: Seq[QueryDef] = Seq(bootstrapCi)

  val B = 64
  val P = 2147483647L // 2^31 − 1

  /** Poisson(1) CDF, P(X ≤ k) for k = 0..6, as exact double literals —
    * the SAME text is spliced into both engines' CASE chains. */
  val Cdf: Seq[String] = Seq(
    "0.36787944117144233", "0.7357588823428847", "0.9196986029286058",
    "0.9810118431238463", "0.9963401531726563", "0.9994058151824183",
    "0.999916758850712")

  /** The uniform draw u ∈ [0, 1) for one (row, replica) key — emitted as
    * its OWN projection column (r16, guide §4 analogue): splicing u
    * inline into every WHEN branch re-evaluated the full ~10-op modular
    * hash chain up to 7× per row — Spark's codegen subexpression
    * elimination deliberately skips CONDITIONAL branches (only a CASE's
    * first predicate is unconditionally evaluated), so nothing hoisted
    * it. One column, one evaluation, same bits. */
  private def uniformSql(keyExpr: String): String = {
    val h = s"((((($keyExpr) % ${P}L) * (($keyExpr) % ${P}L)) % ${P}L * " +
      s"1103515245L) % ${P}L + (($keyExpr) * 12345L) % ${P}L + 104729L) % ${P}L"
    s"CAST(($h) AS DOUBLE) / CAST(${P}L AS DOUBLE)"
  }

  /** Poisson(1) multiplicity from an already-computed uniform column. */
  private def multOfUSql(uCol: String): String =
    Cdf.zipWithIndex.map { case (c, k) => s"WHEN ($uCol) < ${c}D THEN ${k}L" }
      .mkString("CASE ", " ", " ELSE 7L END")

  private def multDuck(keyExpr: String): String = {
    val h = s"((((($keyExpr) % $P) * (($keyExpr) % $P)) % $P * " +
      s"1103515245) % $P + (($keyExpr) * 12345) % $P + 104729) % $P"
    val u = s"CAST(($h) AS DOUBLE) / CAST($P AS DOUBLE)"
    Cdf.zipWithIndex.map { case (c, k) =>
      s"WHEN ($u) < CAST($c AS DOUBLE) THEN CAST($k AS BIGINT)" }
      .mkString("CASE ", " ", " ELSE CAST(7 AS BIGINT) END")
  }

  val bootstrapCi = QueryDef("stat_bootstrap_ci",
    (s, d) => {
      val rep = Tables.orders(s, d)
        .select(col("o_orderkey").cast("long").as("k"),
          col("o_totalprice").cast("decimal(12,2)").as("price"))
        .select(col("k"), col("price"),
          explode(sequence(lit(0), lit(B - 1))).as("b"))
        .withColumn("u", expr(uniformSql(s"k * ${B}L + b")))
        .withColumn("m", expr(multOfUSql("u")))
        .where(col("m") > 0)
      val reps = rep.groupBy(col("b"))
        .agg((sum(col("price") * col("m")).cast("double") /
          sum(col("m")).cast("double")).as("mean_b"),
          sum(col("m")).as("n_eff"))
      reps.agg(
        count(lit(1)).as("n_replicas"),
        min(col("n_eff")).as("min_n_eff"),
        sort_array(collect_list(col("mean_b"))).as("ms"))
        .select(col("n_replicas"), col("min_n_eff"),
          expr("ms[1]").as("ci_lo"),
          expr(s"ms[${B - 2}]").as("ci_hi"))
    },
    Some(s"""WITH rep AS (
        SELECT b.b, CAST(o_totalprice AS DECIMAL(12,2)) AS price,
          (${multDuck(s"CAST(o_orderkey AS BIGINT) * $B + b.b")}) AS m
        FROM orders CROSS JOIN (SELECT unnest(range(0, $B)) AS b) b),
      reps AS (SELECT b,
          CAST(SUM(price * m) AS DOUBLE) / CAST(SUM(m) AS DOUBLE) AS mean_b,
          CAST(SUM(m) AS BIGINT) AS n_eff
        FROM rep WHERE m > 0 GROUP BY b),
      folded AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_replicas,
          MIN(n_eff) AS min_n_eff,
          list_sort(list(mean_b)) AS ms
        FROM reps)
      SELECT n_replicas, min_n_eff,
        ms[2] AS ci_lo, ms[${B - 1}] AS ci_hi
      FROM folded"""))
}
