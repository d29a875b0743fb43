package graft.apps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The reference's second sample app: iterative single-source shortest path
  * (`/root/reference/sample_apps/shortest_path/main.cpp`).
  *
  * Reference shape: Bellman-Ford-style frontier relaxation — map scans a
  * frontier node's CSR out-edges and emits `(dst, dist[src]+w)` iff it
  * improves the current distance (main.cpp:32-46); reduce folds min per node
  * and writes the shared `dist[]` array as a side effect (main.cpp:48-56);
  * a driver loop feeds the reduce output back as the next frontier until it
  * is empty (main.cpp:178-188).
  *
  * Spark-first re-expression (SURVEY.md §1.3/§7.4): the shared mutable
  * `dist[]` becomes a `dist(node, dist)` DataFrame folded with `least()`
  * each superstep; the CSR scan becomes a hash join frontier⋈edges; the
  * improvement guard becomes a join+filter against current dist; the
  * fixpoint test is `frontier.isEmpty`.
  *
  * Scale notes for the 100 TB target:
  *   - edges are the big side: they stay partitioned; the (small, shrinking)
  *     frontier is the probe side of the join each superstep.
  *   - lineage AND inherited stats are cut every superstep
  *     (core.Iterative.cutLineage) — without this the plan grows
  *     unboundedly over hundreds of iterations and the join-product size
  *     estimate overflows (the hazard the reference's shared memory
  *     never sees).
  *   - `persist(MEMORY_AND_DISK)` on dist/frontier: each is read twice per
  *     superstep (join + count).
  */
object ShortestPath {

  /** Parse the reference's text graph format (main.cpp:68-106): first line
    * `numNodes numEdges`, then `src dst weight` triples. The reference graph
    * is undirected — both directions inserted (main.cpp:92-93); duplicate /
    * parallel edges are kept (min-reduce makes them harmless).
    */
  def loadGraph(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
    val parsed = lines
      .select(split(trim(col("value")), "\\s+").as("t"))
      .where(size(col("t")) === 3) // header line has 2 tokens
      .select(
        col("t").getItem(0).cast("long").as("src"),
        col("t").getItem(1).cast("long").as("dst"),
        col("t").getItem(2).cast("double").as("weight"))
    undirect(parsed)
  }

  /** Insert reverse edges (reference loader main.cpp:92-93). */
  def undirect(edges: DataFrame): DataFrame =
    edges.unionAll(edges.select(
      col("dst").as("src"), col("src").as("dst"), col("weight")))

  /** Deterministic synthetic graph (no data files needed): ring + skip
    * edges over `n` nodes. Used by the `sssp_synthetic` query entry so the
    * op is exercised at every scale factor without external inputs. */
  def syntheticGraph(spark: SparkSession, n: Long): DataFrame = {
    val ids = spark.range(0, n, 1, 32)
    val ring = ids.select(
      col("id").as("src"), ((col("id") + 1) % n).as("dst"),
      lit(1.0).as("weight"))
    val skip = ids.select(
      col("id").as("src"), ((col("id") * 7 + 11) % n).as("dst"),
      ((col("id") % 10) + 1).cast("double").as("weight"))
    undirect(ring.unionAll(skip)).where(col("src") =!= col("dst"))
  }

  /** DuckDB oracle for [[syntheticGraph]]+[[distributedSssp]]: rebuild the
    * same ring+skip edge relation from `range(n)` and solve shortest paths
    * with a bounded recursive CTE. All edge weights are positive integers,
    * so candidate distances are integers too; pruning candidates above
    * `bound` keeps the (node, dist) pair space finite — the recursion
    * provably terminates — while any true shortest path (every prefix sum
    * ≤ its final dist ≤ source eccentricity) survives as long as
    * `bound` ≥ the source's eccentricity (20 for n=1000, verified by
    * Dijkstra; callers pass 2× headroom). MIN-per-node over the surviving
    * pairs is exactly `dist[]`.
    */
  def syntheticOracleSql(n: Long, source: Long, bound: Int): String =
    s"""WITH RECURSIVE
      ids AS (SELECT range AS id FROM range($n)),
      base AS (
        SELECT id AS src, (id + 1) % $n AS dst, CAST(1.0 AS DOUBLE) AS w FROM ids
        UNION ALL
        SELECT id, (id * 7 + 11) % $n, CAST((id % 10) + 1 AS DOUBLE) FROM ids),
      edges AS (
        SELECT src, dst, w FROM base WHERE src <> dst
        UNION ALL
        SELECT dst AS src, src AS dst, w FROM base WHERE src <> dst),
      paths(node, dist) AS (
        SELECT CAST($source AS BIGINT), CAST(0.0 AS DOUBLE)
        UNION
        SELECT e.dst, p.dist + e.w FROM paths p JOIN edges e ON p.node = e.src
        WHERE p.dist + e.w <= $bound)
      SELECT node, MIN(dist) AS dist FROM paths GROUP BY node ORDER BY node"""

  /** Single-source shortest paths. Returns `(node, dist)` for every node
    * reachable from `source`. One row per reached node; unordered (the
    * reference guarantees no order either, README.txt:55-58).
    *
    * Hybrid execution: weighted frontier Bellman-Ford needs one superstep
    * per shortest-path-tree hop level (the reference's syn.graph takes
    * 279), and on Spark each superstep is a fixed multi-job cost — pure
    * driver-loop iteration is latency-bound regardless of cluster size.
    * So when the edge relation fits comfortably in driver memory
    * (`localCutover`) the solve finishes locally with the same Dijkstra
    * the oracle uses — the standard cutover every distributed graph
    * engine makes when the active problem fits on one node. Larger
    * graphs take [[distributedSssp]], where per-superstep real work
    * dominates the fixed overhead.
    */
  def sssp(edges: DataFrame, source: Long,
      // 1M edges ≈ 24 MB of (long,long,double) rows — comfortably inside
      // any driver heap while still covering every "small graph" case;
      // beyond it the per-superstep work amortizes Spark's fixed job cost
      localCutover: Long = 1000000L,
      broadcastThreshold: Long = 2000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src"), col("dst"), col("weight"))
    val m = e.count()
    if (m <= localCutover) {
      val es = e.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      dijkstra(es.toSeq, source).toSeq.toDF("node", "dist")
    } else distributedSssp(e, source, broadcastThreshold)
  }

  /** Superstep state cut: lineage AND stats — see
    * [[graft.core.Iterative.cutLineage]] for why plain `localCheckpoint`
    * is not enough (its inherited join-product stats compound until the
    * BigInt estimate overflows on syn.graph's 279 supersteps). */
  private def cutLineage(df: DataFrame): DataFrame =
    graft.core.Iterative.cutLineage(df)

  /** The fully distributed superstep loop (reference main.cpp:178-188
    * re-expressed; see class doc). Exercised directly by tests and by the
    * `sssp_synthetic` catalog entry. */
  def distributedSssp(edges: DataFrame, source: Long,
      broadcastThreshold: Long = 2000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val e = edges.select(col("src"), col("dst"), col("weight"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    e.count() // materialize once; read every superstep

    // dist: best-known distance per discovered node (≅ dist[], main.cpp:159-163,
    // but sparse — undiscovered nodes are absent instead of +inf).
    // Both superstep states are eagerly cut via cutLineage: without cutting
    // lineage EVERY superstep the logical plan doubles per iteration (the
    // full_outer join references both prior states) and plan
    // compilation/explain blows up long before the data does — and the
    // checkpoint's inherited stats compound (see cutLineage). On a real
    // cluster swap the inner localCheckpoint for checkpoint(reliable dir)
    // to also survive executor loss.
    var dist = cutLineage(Seq((source, 0.0)).toDF("node", "dist"))
    // frontier: nodes whose dist improved last superstep (≅ the recycled
    // output->input array, main.cpp:186).
    var frontier = dist
    var frontierCount = 1L
    var distCount = 1L

    while (frontierCount > 0) {
      // Checkpointed frames carry no stats, so Catalyst would never pick a
      // broadcast join on its own and every superstep would reshuffle the
      // whole edge relation (measured: ~10× slower on the reference's
      // syn.graph). Broadcast the frontier/dist sides explicitly while
      // they're small; past the threshold fall back to shuffle joins —
      // the right plan for a billion-node graph.
      def maybeBroadcast(df: DataFrame, n: Long): DataFrame =
        if (n <= broadcastThreshold) broadcast(df) else df

      // A4 edge relaxation: frontier ⋈ edges, candidate = dist[src] + w.
      // (alias both sides: after superstep 1 the frontier's lineage could
      // otherwise collide with the edge relation's attribute ids)
      val candidates = maybeBroadcast(frontier.alias("f"), frontierCount)
        .join(e.alias("ed"), col("f.node") === col("ed.src"))
        .select(col("ed.dst").as("node"),
          (col("f.dist") + col("ed.weight")).as("cand"))
      // A6 min-per-key (map-side partial min for free).
      val best = candidates.groupBy("node").agg(min(col("cand")).as("cand"))
      // A5 improvement filter (main.cpp:41) as join against current dist.
      val improved = best.join(
          maybeBroadcast(dist.withColumnRenamed("dist", "cur"), distCount),
          Seq("node"), "left_outer")
        .where(col("cur").isNull || col("cand") < col("cur"))
        .select(col("node"), col("cand").as("dist"))
      val improvedCk = cutLineage(improved)
      frontierCount = improvedCk.count()

      // Fold improvements into dist (replaces the reduce-side dist[] write,
      // main.cpp:54).
      if (frontierCount > 0) {
        val newDist = cutLineage(dist.withColumnRenamed("dist", "cur")
          .join(improvedCk.withColumnRenamed("dist", "imp"), Seq("node"), "full_outer")
          .select(col("node"), least(col("cur"), col("imp")).as("dist")))
        frontier = improvedCk
        dist = newDist
        distCount += frontierCount // upper bound on discovered nodes
      }
    }
    e.unpersist()
    dist
  }

  /** Serial Dijkstra oracle (≅ reference main.cpp:108-140) — test-only. */
  def dijkstra(edges: Seq[(Long, Long, Double)], source: Long): Map[Long, Double] = {
    val adj = edges.groupBy(_._1).map { case (s, es) =>
      s -> es.map(e => (e._2, e._3))
    }
    val dist = scala.collection.mutable.Map(source -> 0.0)
    val pq = scala.collection.mutable.PriorityQueue((0.0, source))(
      Ordering.by(-_._1))
    val done = scala.collection.mutable.Set.empty[Long]
    while (pq.nonEmpty) {
      val (d, u) = pq.dequeue()
      if (!done(u)) {
        done += u
        adj.getOrElse(u, Nil).foreach { case (v, w) =>
          if (d + w < dist.getOrElse(v, Double.PositiveInfinity)) {
            dist(v) = d + w
            pq.enqueue((d + w, v))
          }
        }
      }
    }
    dist.toMap
  }
}
