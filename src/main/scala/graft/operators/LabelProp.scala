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

  def all: Seq[QueryDef] = Seq(labelProp, modularity)

  /** The ring+skip edge relation and the 5-round LPA label assignment —
    * shared by the propagation entry and [[modularity]] so the two
    * cannot drift. */
  private def graphAndLabels(s: org.apache.spark.sql.SparkSession)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
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
    (e, lab)
  }

  val labelProp = QueryDef("graph_label_prop",
    (s, _) => graphAndLabels(s)._2.orderBy(col("id")),
    Some(s"""WITH $lpaCtesSql
        SELECT id, l FROM lab$Rounds ORDER BY id"""))

  /** Shared DuckDB CTE prefix: graph + 5 LPA rounds (generated from the
    * same constants as the Spark loop). */
  private def lpaCtesSql: String = {
    val rounds = (1 to Rounds).map { k =>
      s"""nl$k AS (SELECT e.src, p.l, COUNT(*) AS c
          FROM e JOIN lab${k - 1} p ON p.id = e.dst GROUP BY 1, 2),
        lab$k AS (SELECT src AS id,
          MIN(($MaxC - c) * 1024 + l) % 1024 AS l FROM nl$k GROUP BY 1)"""
    }.mkString(",\n")
    s"""ids AS (SELECT range AS id FROM range($N)),
        base AS (
          SELECT id AS src, (id + 1) % $N AS dst FROM ids
          UNION ALL
          SELECT id, (id * 7 + 11) % $N FROM ids),
        e AS (
          SELECT src, dst FROM base WHERE src <> dst
          UNION ALL
          SELECT dst AS src, src AS dst FROM base WHERE src <> dst),
        lab0 AS (SELECT id, id AS l FROM ids),
        $rounds"""
  }

  /** Newman modularity, decomposed per community — the quality metric
    * for [[labelProp]]'s assignment (are the detected communities
    * denser inside than a degree-preserving random graph predicts).
    * Over the doubled (directed-representation) edge relation with
    * M = 2m edge-ends: q_c = L_c/M − (D_c/M)², emitted as ONE exact
    * division per community — (L_c·M − D_c²)/M² on DECIMAL(38,0)
    * products, so there is no order-dependent float total (the χ²/MI
    * per-cell convention; a reader sums the ≤#communities terms).
    *
    * Plan: the label relation joins both edge endpoints (two hash
    * joins), internal edges and degree sums are key-partitioned aggs,
    * M is a 1-row broadcast. Nothing beyond the LPA rounds is
    * superstep-shaped. */
  val modularity = QueryDef("graph_modularity",
    (s, _) => {
      val (e, lab) = graphAndLabels(s)
      val lsrc = lab.select(col("id").as("src"), col("l").as("ls"))
      val ldst = lab.select(col("id").as("dst"), col("l").as("ld"))
      val m = e.agg(count(lit(1)).as("m"))
      val internal = e.join(lsrc, "src").join(ldst, "dst")
        .filter(col("ls") === col("ld"))
        .groupBy(col("ls").as("community"))
        .agg(count(lit(1)).as("internal_edges"))
      val comm = e.groupBy(col("src")).agg(count(lit(1)).as("dg"))
        .join(lsrc, "src")
        .groupBy(col("ls").as("community"))
        .agg(count(lit(1)).as("n_nodes"), sum(col("dg")).as("degree_sum"))
      comm.join(internal, Seq("community"), "left")
        .na.fill(0L, Seq("internal_edges"))
        .crossJoin(broadcast(m))
        .select(col("community"), col("n_nodes"), col("internal_edges"),
          col("degree_sum"),
          ((col("internal_edges").cast("decimal(38,0)") * col("m") -
            col("degree_sum").cast("decimal(38,0)") * col("degree_sum"))
            .cast("double") /
            (col("m").cast("decimal(38,0)") * col("m")).cast("double"))
            .as("q_term"))
        .orderBy(col("community"))
    },
    Some(s"""WITH $lpaCtesSql,
        m AS (SELECT COUNT(*) AS m FROM e),
        internal AS (SELECT s.l AS community, COUNT(*) AS internal_edges
          FROM e JOIN lab$Rounds s ON s.id = e.src
          JOIN lab$Rounds t ON t.id = e.dst
          WHERE s.l = t.l GROUP BY 1),
        deg AS (SELECT src, COUNT(*) AS dg FROM e GROUP BY 1),
        comm AS (SELECT s.l AS community, COUNT(*) AS n_nodes,
            CAST(SUM(dg) AS BIGINT) AS degree_sum
          FROM deg JOIN lab$Rounds s ON s.id = deg.src GROUP BY 1)
        SELECT c.community, c.n_nodes,
          CAST(COALESCE(i.internal_edges, 0) AS BIGINT) AS internal_edges,
          c.degree_sum,
          CAST(CAST(COALESCE(i.internal_edges, 0) AS DECIMAL(38,0)) * m -
            CAST(c.degree_sum AS DECIMAL(38,0)) * c.degree_sum AS DOUBLE) /
            CAST(CAST(m AS DECIMAL(38,0)) * m AS DOUBLE) AS q_term
        FROM comm c LEFT JOIN internal i USING (community) CROSS JOIN m
        ORDER BY community"""))
}
