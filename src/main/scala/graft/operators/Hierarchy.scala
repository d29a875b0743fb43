package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.core.Iterative

/** Hierarchy flattening by pointer jumping — the recursive-query surface
  * (org charts, category trees, BOM explosions: "depth and root of every
  * node") expressed as the O(log depth) iterative-DOUBLING superstep
  * instead of SQL recursion: each round every node's ancestor pointer
  * jumps to its ancestor's ancestor and accumulates the hop distance, so
  * a depth-d tree converges in ⌈log₂ d⌉ rounds — the classic
  * Wyllie/pointer-jumping list-ranking recipe, and the reason a 100 TB
  * hierarchy needs a handful of shuffles where per-row recursion would
  * need d of them.
  *
  * Tree: nodes = `c_custkey` (0..N−1 contiguous); parent(k) =
  * multiplicative-hash(k) mod k for k ≥ 1 (strictly smaller ⇒ acyclic,
  * rooted at 0) — a random-attachment tree, depth ≈ ln N. The DuckDB
  * oracle walks parent chains with a native RECURSIVE CTE — two utterly
  * different evaluation strategies, one hash-equal answer.
  *
  * Scale stance: per round one self-join keyed by the ancestor pointer +
  * lineage cut; round count log₂(depth) (5 at sf0.1's depth ≈ 20).
  * State is 3 BIGINTs per node. */
object Hierarchy {

  def all: Seq[QueryDef] = Seq(treeClosure)

  /** (node, depth) for every node of the synthetic customer tree. */
  val treeClosure = QueryDef("graph_tree_closure",
    (s, d) => {
      val par = Tables.customer(s, d)
        .select(col("c_custkey").cast("long").as("node"))
        .withColumn("parent", when(col("node") === 0, 0L)
          .otherwise(((col("node") * 2654435761L) % 1000000007L)
            % col("node")))
      var state = Iterative.cutLineage(
        par.filter(col("node") =!= 0)
          .select(col("node"), col("parent").as("anc"), lit(1L).as("depth"))
          .unionAll(par.filter(col("node") === 0)
            .select(col("node"), lit(0L).as("anc"), lit(0L).as("depth"))))
      // the pointer-jumping join on anc === a_node silently drops rows
      // whose ancestor is absent, so a NON-EMPTY key space without node
      // 0 (e.g. 1-based) would lose every resolved row — fail loudly
      // instead (an empty corpus legitimately has no root and flows
      // through to an empty result). Piggybacked on the loop's seed
      // action: one pass over `state` yields the root count AND the
      // initial unresolved count, instead of a separate customer scan.
      val Seq(nodes, roots, unresolved0) = state
        .agg(count(lit(1)), count(when(col("node") === 0, 1)),
          count(when(col("anc") =!= 0, 1)))
        .head().toSeq.map(_.asInstanceOf[Long])
      require(nodes == 0L || roots == 1L,
        s"tree closure expects exactly one root with key 0; found $roots")
      var unresolved = unresolved0
      while (unresolved > 0) {
        val ancSide = state
          .select(col("node").as("a_node"), col("anc").as("a_anc"),
            col("depth").as("a_depth"))
        state = Iterative.cutLineage(
          state.join(ancSide, col("anc") === col("a_node"))
            .select(col("node"), col("a_anc").as("anc"),
              (col("depth") + col("a_depth")).as("depth")))
        unresolved = state.filter(col("anc") =!= 0).count()
      }
      state.select(col("node"), col("depth")).orderBy(col("node"))
    },
    Some("""WITH RECURSIVE par AS (SELECT CAST(c_custkey AS BIGINT) AS node,
        CASE WHEN c_custkey = 0 THEN CAST(0 AS BIGINT)
          ELSE ((CAST(c_custkey AS BIGINT) * 2654435761) % 1000000007)
            % CAST(c_custkey AS BIGINT) END AS parent
        FROM customer),
      walk AS (
        SELECT node, parent AS anc, CAST(1 AS BIGINT) AS depth
        FROM par WHERE node <> 0
        UNION ALL
        SELECT w.node, p.parent, w.depth + 1
        FROM walk w JOIN par p ON w.anc = p.node WHERE w.anc <> 0)
      SELECT node, depth FROM (
        SELECT node, depth FROM walk WHERE anc = 0
        UNION ALL SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT))
      ORDER BY node"""),
    // driver-loop doubling like sssp/kcore
    bench = false)
}
