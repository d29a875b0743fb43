package graft

import graft.apps.ShortestPath
import org.apache.spark.sql.functions._
import scala.util.Random

/** SSSP parity with the serial Dijkstra oracle — the reference's own
  * correctness method (shortest_path/main.cpp:108-140,200-206). */
class ShortestPathSpec extends SparkSpec {
  import spark.implicits._

  /** The reference's small.graph (FIXTURES.md §A2): 10 nodes, 6 directed
    * lines, undirected semantics, duplicate/parallel edges kept. */
  val smallGraph: Seq[(Long, Long, Double)] = Seq(
    (2L, 0L, 1.0), (2L, 0L, 10.0), (4L, 0L, 1.0),
    (4L, 0L, 1.0), (7L, 0L, 14.0), (8L, 0L, 9.0))

  def undirected(es: Seq[(Long, Long, Double)]): Seq[(Long, Long, Double)] =
    es ++ es.map(e => (e._2, e._1, e._3))

  test("sssp on small.graph matches Dijkstra") {
    val edges = ShortestPath.undirect(
      smallGraph.toDF("src", "dst", "weight"))
    val got = ShortestPath.distributedSssp(edges, 0L).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = ShortestPath.dijkstra(undirected(smallGraph), 0L)
    assert(got == want)
    // hand-checkable goldens: 0->2 via weight-1 edge, 0->4 via weight-1 edge
    assert(got(2L) == 1.0 && got(4L) == 1.0 && got(7L) == 14.0 && got(8L) == 9.0)
  }

  test("sssp on random graphs matches Dijkstra (multi-superstep)") {
    val rnd = new Random(42)
    for (trial <- 1 to 3) {
      val n = 30 + trial * 20
      val es = (1 to n * 3).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong,
          (rnd.nextInt(20) + 1).toDouble)
      }.filter(e => e._1 != e._2)
      val edges = ShortestPath.undirect(es.toDF("src", "dst", "weight"))
      val got = ShortestPath.distributedSssp(edges, 0L).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = ShortestPath.dijkstra(undirected(es), 0L)
      assert(got == want, s"trial $trial (n=$n)")
    }
  }

  test("synthetic graph sssp reaches all nodes") {
    val edges = ShortestPath.syntheticGraph(spark, 200L)
    val got = ShortestPath.distributedSssp(edges, 0L)
    assert(got.count() == 200L)
    assert(got.filter(col("node") === 0L).head().getDouble(1) == 0.0)
  }

  test("reference syn.graph end-to-end: loadGraph -> sssp matches Dijkstra") {
    // the reference's real workload (main.cpp:169,180-188): 18,263 nodes /
    // 23,797 undirected edges, integer weights (so every path sum is exact
    // in double and full == parity with the serial oracle is sound).
    // sssp() solves this size via the documented local cutover; the fully
    // distributed path's parity + timing on this same graph is the
    // SsspBench --distributed run recorded in BASELINE.md (40.6 s over 35
    // k=8 frontier batches — too slow for CI, not wrong; distributedSssp
    // parity is covered on multi-batch graphs below).
    val path = getClass.getResource("/syn.graph").getPath
    val edges = ShortestPath.loadGraph(spark, path)
    assert(edges.count() == 2L * 23797)
    val es = edges.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = ShortestPath.dijkstra(es, 0L)
    val got = ShortestPath.sssp(edges, 0L).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.size == 18263, "syn.graph is connected — all nodes reached")
    assert(got == want)
  }

  test("superstep state cut resets inherited stats (the syn.graph overflow guard)") {
    // localCheckpoint alone inherits the pre-checkpoint plan's
    // join-PRODUCT size estimate, which compounds doubly-exponentially
    // across supersteps until the BigInt overflows (died at superstep
    // ~280 on syn.graph). cutLineage must keep the estimate at the
    // flat per-relation default, superstep after superstep.
    import spark.implicits._
    var df = graft.core.Iterative.cutLineage(
      Seq((1L, 1.0), (2L, 2.0)).toDF("node", "dist"))
    val bound = BigInt(Long.MaxValue) * BigInt(Long.MaxValue) * BigInt(16)
    for (_ <- 0 until 5) {
      val joined = df.as("a").join(df.as("b"), "node")
        .select(col("node"), (col("a.dist") + col("b.dist")).as("dist"))
      df = graft.core.Iterative.cutLineage(joined)
      val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
      assert(est <= bound,
        s"stats estimate compounding across supersteps again: $est")
    }
  }

  test("text graph loader parses header and triples, undirected") {
    val tmp = java.nio.file.Files.createTempDirectory("graph").toString
    val f = s"$tmp/g.txt"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(f),
      "3 2\n0 1 5.0\n1 2 7.0\n")
    val edges = ShortestPath.loadGraph(spark, f)
    assert(edges.count() == 4) // 2 edges × both directions
    val got = ShortestPath.sssp(edges, 0L).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == Map(0L -> 0.0, 1L -> 5.0, 2L -> 12.0))
  }
}
