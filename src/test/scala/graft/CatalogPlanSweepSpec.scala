package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Catalog-wide plan invariants, asserted over EVERY entry rather than the
  * per-query spot guards in PlanShapeSpec:
  *
  *   1. every catalog entry analyzes and physical-plans successfully at
  *      sf0.001 (a refactor that breaks analysis for an un-spot-checked
  *      query fails here, not in the driver's correctness gate), and
  *   2. no plan contains a CartesianProduct — the both-sides-large
  *      quadratic join that kills any 100 TB run — except the two
  *      declared bounded yardsticks. (BroadcastNestedLoopJoin is NOT
  *      banned globally: a cross join against a broadcast single-row
  *      aggregate is the standard way to attach a global denominator.)
  *   3. no plan contains an UNDECLARED unpartitioned window. An empty
  *      partitionSpec over a full base table is a single-task sort
  *      waiting to happen at 100 TB — exactly the bug class q37_ntile
  *      shipped with until round 5; this bans it forever. The
  *      `serialWindowsByConstruction` allowlist names every entry whose
  *      unpartitioned window is provably bounded (tiny bucket/offset
  *      relations, calendar-bounded series, literal-SQL demo) — a new
  *      entry reaching this list is a deliberate reviewed act, not an
  *      accident. (A constant partition key cannot express the intent
  *      in-plan: Spark's EliminateWindowPartitions strips foldable
  *      keys, so the allowlist lives here instead.)
  *
  * Entries whose `fn` eagerly runs driver-side supersteps or writes files
  * are skipped to keep the sweep seconds-fast; each of those has its own
  * dedicated spec (BpeSpec, ShortestPathSpec, MixtureGraphSpec, the sink
  * tests in PlanShapeSpec/SourcesSpec).
  */
class CatalogPlanSweepSpec extends SparkSpec {

  private val eagerOrWriting = Set(
    "text_bpe_vocab", "text_bpe_encode",      // driver merge loop
    "sssp_synthetic",                          // hybrid local solve
    "emb_power_iteration",                     // superstep collects
    "sim_ann_ivf_trained",                     // Lloyd rounds
    "text_heavy_hitters",                      // candidate pass collects
    "sink_bucketed_roundtrip", "sink_range_layout", "sink_zorder_layout",
    "source_csv_roundtrip", "source_json_roundtrip",
    "source_orc_roundtrip") // file writes

  private val quadraticYardsticks = Set(
    "dedup_ngram_jaccard", "dedup_embedding_cosine")

  /** Entries whose unpartitioned windows are serial BY CONSTRUCTION:
    * `Quantiles.valueAtRanks` bucket offsets (stat_mad chains two
    * selections + a deviation pass, stat_winsorized one) — windows over
    * the ~B-row bucket relation, never the data; `pack_sequences`' level-2
    * offsets over its ≤ P-row (shuffle-parallelism-bounded) bucket
    * relation; `q42_moving_range`'s frame
    * over calendar-bounded daily aggregates; `sql_text_surface`'s rank
    * over a 25-nation aggregate (its SQL text must stay char-identical in
    * both engines, so no Spark-side rewrite is possible). */
  private val serialWindowsByConstruction = Set(
    "stat_mad", "stat_winsorized", "pack_sequences",
    "q42_moving_range", "sql_text_surface")

  test("every catalog entry plans; no CartesianProduct outside the declared yardsticks") {
    val failures = scala.collection.mutable.ListBuffer.empty[String]
    graft.queries.Registry.all
      .filterNot(q => eagerOrWriting(q.name))
      .foreach { q =>
        try {
          val df = q.fn(spark, sf("sf0.001"))
          val plan = df.queryExecution.executedPlan match {
            case a: AdaptiveSparkPlanExec => a.toString
            case p => p.toString
          }
          if (plan.contains("CartesianProduct") && !quadraticYardsticks(q.name))
            failures += s"${q.name}: CartesianProduct in plan"
          val bareWindows = df.queryExecution.optimizedPlan.collect {
            case w: org.apache.spark.sql.catalyst.plans.logical.Window
                if w.partitionSpec.isEmpty => w
            case g: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit
                if g.partitionSpec.isEmpty => g
          }
          if (bareWindows.nonEmpty && !serialWindowsByConstruction(q.name))
            failures += s"${q.name}: ${bareWindows.size} unpartitioned window(s)"
        } catch {
          case e: Throwable => failures += s"${q.name}: ${e.getClass.getSimpleName} ${e.getMessage}"
        }
      }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
