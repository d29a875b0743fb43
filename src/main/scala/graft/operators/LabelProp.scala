package graft.operators

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.apps.ShortestPath

/** Synchronous label propagation (Raghavan et al. 2007) over the
  * deterministic ring+skip graph — community detection as the third
  * unrolled-superstep shape beside [[PageRank]] (mass propagation) and
  * SSSP (min propagation): each round every node adopts the label with
  * the highest count among its neighbors, ties to the SMALLEST label
  * (the deterministic tie-break that makes synchronous LPA
  * engine-portable; the usual random tie-break is not).
  *
  * The per-node argmax is a pure AGGREGATION, no window: the (count,
  * label) preference order is packed into one BIGINT
  * `(MaxC − c) · 1024 + label` whose MIN is exactly (max count, then
  * min label), decoded by `% 1024` — valid while labels < 1024 (initial
  * labels are the 1000 node ids) and counts < MaxC (counts are bounded
  * by node degree, ≤ 6 here; the encode asserts nothing silently
  * because a violation would need degree ≥ 100000). Each round is one
  * shuffle keyed by dst (neighbor-label join) and one by (src, label)
  * then src — the same per-round shuffle budget as PageRank; 5 unrolled
  * rounds in ONE declarative plan, no driver state, no lineage cut
  * (PageRank's measured lesson at this depth). The DuckDB oracle chains
  * the rounds as CTEs, each referenced once so the plan stays linear.
  */
object LabelProp {

  val N = 1000L
  val Rounds = 5
  val MaxC = 100000L

  def all: Seq[QueryDef] = Seq(labelProp)

  val labelProp = QueryDef("graph_label_prop",
    (s, _) => {
      val e = ShortestPath.syntheticGraph(s, N).select(col("src"), col("dst"))
      var lab = s.range(0, N, 1, 32).select(col("id"), col("id").as("l"))
      for (_ <- 1 to Rounds) {
        lab = e
          .join(lab.withColumnRenamed("id", "nid"), col("dst") === col("nid"))
          .groupBy(col("src"), col("l")).agg(count(lit(1)).as("c"))
          .groupBy(col("src"))
          .agg(min((lit(MaxC) - col("c")) * 1024L + col("l")).as("enc"))
          .select(col("src").as("id"), (col("enc") % 1024L).as("l"))
      }
      lab.orderBy(col("id"))
    },
    Some {
      val rounds = (1 to Rounds).map { k =>
        s"""nl$k AS (SELECT e.src, p.l, COUNT(*) AS c
          FROM e JOIN lab${k - 1} p ON p.id = e.dst GROUP BY 1, 2),
        lab$k AS (SELECT src AS id,
          MIN(($MaxC - c) * 1024 + l) % 1024 AS l FROM nl$k GROUP BY 1)"""
      }.mkString(",\n")
      s"""WITH ids AS (SELECT range AS id FROM range($N)),
        base AS (
          SELECT id AS src, (id + 1) % $N AS dst FROM ids
          UNION ALL
          SELECT id, (id * 7 + 11) % $N FROM ids),
        e AS (
          SELECT src, dst FROM base WHERE src <> dst
          UNION ALL
          SELECT dst AS src, src AS dst FROM base WHERE src <> dst),
        lab0 AS (SELECT id, id AS l FROM ids),
        $rounds
        SELECT id, l FROM lab$Rounds ORDER BY id"""
    })
}
