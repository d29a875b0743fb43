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
        } catch {
          case e: Throwable => failures += s"${q.name}: ${e.getClass.getSimpleName} ${e.getMessage}"
        }
      }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
