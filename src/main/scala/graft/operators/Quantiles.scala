package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact interpolated percentiles via two-phase boundary
  * narrowing — the scale-safe replacement for `percentile()`'s
  * whole-group value buffer.
  *
  * Why: Spark's exact `percentile` aggregate materialises every value of
  * a group in one task's memory (an `OpenHashMap` counts-per-value
  * buffer). On a 100 TB column that is whole-column state on as many
  * tasks as there are groups — the one aggregate shape in this engine
  * that cannot survive a scale-up. The classic distributed-selection fix
  * (Blum et al. style median-of-medians adapted to MPP engines) needs
  * only bounded state per task:
  *
  *  1. '''Range stats''' — one map-side-combined pass for per-group
  *     `(count, min, max)`: output is one row per group.
  *  2. '''Coarse histogram''' — bucket each value into one of `B`
  *     equi-width ranges and count per `(group, bucket)`: the shuffle
  *     carries at most `B × groups` rows per map task, never raw values.
  *     A running sum over the (tiny) histogram locates the bucket that
  *     contains each target order statistic and how many values fall
  *     below it.
  *  3. '''Narrowed sort''' — only rows in the ≤2 needed buckets per
  *     group (~`2/B` of the data) are pulled, ranked by a window sort
  *     within their bucket, and the two order statistics around the
  *     target rank are read off exactly.
  *
  * The interpolation `(khi − rank)·v_lo + (rank − klo)·v_hi` is the same
  * IEEE expression Spark's own `Percentile.getPercentile` uses, and the
  * DuckDB oracle spells the identical formula over `ROW_NUMBER`-derived
  * order statistics, so results stay bit-exact with the built-in on both
  * engines.
  *
  * Bucket assignment is monotone in the value (`floor((v−min)/width)`
  * clamped to `B−1`), so bucket-major + in-bucket ordering equals global
  * ordering and the narrowed ranks are exact — no approximation anywhere.
  * Degenerate groups (all values equal → zero width) collapse to bucket 0,
  * which is then sorted whole; correct, and the quantile of a constant
  * column is that constant regardless.
  *
  * Reference analog: `sample_apps/number_count/main.cpp:49-57` reduces
  * per-key counts; this is the same partial-aggregate discipline applied
  * to order statistics, where the naive "ship all values" reduce is the
  * trap.
  */
object Quantiles {

  /** One requested percentile: `p` of `valueCol`, emitted as `outName`. */
  final case class Spec(valueCol: String, p: Double, outName: String)

  /** Exact interpolated percentiles per `group`, one output column per
    * spec. `buckets` trades narrowing sharpness against histogram size;
    * 256 keeps the phase-2 shuffle at `256 × groups` rows while pulling
    * only ~0.8% of raw rows into the phase-3 sort. */
  def exactPercentiles(
      df: DataFrame,
      group: String,
      specs: Seq[Spec],
      buckets: Int = 256): DataFrame = {
    require(specs.nonEmpty, "need at least one percentile spec")
    require(buckets >= 2, "need at least two buckets to narrow")
    specs.map(onePercentile(df, group, _, buckets))
      .reduce(_.join(_, Seq(group)))
  }

  private def onePercentile(
      df: DataFrame, group: String, sp: Spec, buckets: Int): DataFrame = {
    require(sp.p >= 0.0 && sp.p <= 1.0, s"percentile out of range: ${sp.p}")
    // nulls are ignored, matching percentile()/quantile_cont semantics
    val rows = df
      .select(col(group).as("g"), col(sp.valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)

    // Phase 1: (count, min, max) per group + the two target 0-indexed
    // ranks klo/khi around rank = p·(n−1).
    val stats = rows.groupBy(col("g"))
      .agg(count(col("v")).as("n"), min(col("v")).as("vmin"),
        max(col("v")).as("vmax"))
      .withColumn("rk", lit(sp.p) * (col("n") - lit(1)).cast("double"))
      .withColumn("klo", floor(col("rk")))
      .withColumn("khi", ceil(col("rk")))

    // Monotone equi-width bucket index; clamp keeps v = vmax in range.
    val width = (col("vmax") - col("vmin")) / lit(buckets.toDouble)
    val bucket = when(col("vmax") <= col("vmin"), lit(0))
      .otherwise(least(
        floor((col("v") - col("vmin")) / width).cast("int"),
        lit(buckets - 1)))

    // Phase 2: coarse histogram. The stats side is one row per group —
    // broadcast, so the fact table never shuffles to get its bucket.
    val bucketed = rows
      .join(broadcast(stats.select(col("g"), col("vmin"), col("vmax"))), "g")
      .withColumn("b", bucket)
    val bhist = bucketed.groupBy(col("g"), col("b")).agg(count(lit(1)).as("c"))
    val bcum = bhist
      .withColumn("cum",
        sum(col("c")).over(Window.partitionBy(col("g")).orderBy(col("b"))))
      .withColumn("below", col("cum") - col("c"))

    // Locate the bucket holding each target rank (tiny × tiny range join).
    val ranks = stats.select(col("g"), col("klo").as("k"), lit("lo").as("tag"))
      .union(stats.select(col("g"), col("khi").as("k"), lit("hi").as("tag")))
    val located = ranks.alias("r")
      .join(bcum.alias("h"),
        expr("r.g = h.g AND h.below <= r.k AND r.k < h.cum"))
      .select(col("r.g").as("g"), col("r.k").as("k"), col("r.tag").as("tag"),
        col("h.b").as("b"), col("h.below").as("below"))

    // Phase 3: pull only the needed buckets (≤2 per group), rank within
    // them, and read the two order statistics off exactly.
    val needed = located.select(col("g"), col("b"), col("below")).distinct()
    val subset = bucketed.select(col("g"), col("v"), col("b"))
      .join(broadcast(needed), Seq("g", "b"))
      .withColumn("idx",
        col("below") +
          row_number().over(
            Window.partitionBy(col("g"), col("b")).orderBy(col("v")))
          - lit(1))
    val picked = subset.alias("s")
      .join(broadcast(located.select(col("g").as("lg"), col("k"), col("tag"))),
        expr("s.g = lg AND s.idx = k"))
      .groupBy(col("s.g").as("g"))
      .agg(max(when(col("tag") === "lo", col("v"))).as("vlo"),
        max(when(col("tag") === "hi", col("v"))).as("vhi"))

    // Same interpolation expression shape as Spark's Percentile and the
    // DuckDB oracle: exact when rank is integral, else a two-term lerp.
    stats.join(picked, Seq("g"))
      .select(col("g").as(group),
        when(col("klo") === col("khi"), col("vlo"))
          .otherwise(
            (col("khi").cast("double") - col("rk")) * col("vlo") +
              (col("rk") - col("klo").cast("double")) * col("vhi"))
          .as(sp.outName))
  }
}
