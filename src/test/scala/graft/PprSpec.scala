package graft

import org.apache.spark.sql.functions._
import graft.operators.PageRank

/** `graph_ppr` — serial-model exactness plus the pin the entry exists
  * for: restart mass concentrates rank around the SEEDS, which the
  * global `graph_pagerank` order cannot express. */
class PprSpec extends SparkSpec {

  /** The 5 PPR rounds replayed serially with the same scaled-BIGINT
    * truncating arithmetic over the collected edge list. */
  private def serialPpr(): Map[Long, Long] = {
    val n = PageRank.N
    val edges = graft.apps.ShortestPath.syntheticGraph(spark, n)
      .select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
    val nSeeds = (n + PageRank.SeedMod - 1) / PageRank.SeedMod
    val seedBase = (15L * (PageRank.Scale / nSeeds)) / 100L
    var v = (0L until n).map(i =>
      i -> (if (i % PageRank.SeedMod == 0) PageRank.Scale / nSeeds else 0L))
      .toMap
    for (_ <- 1 to PageRank.Rounds) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long]
      edges.foreach { case (s, t) =>
        contrib(t) = contrib.getOrElse(t, 0L) + v(s) / deg(s)
      }
      v = (0L until n).map(i =>
        i -> ((if (i % PageRank.SeedMod == 0) seedBase else 0L) +
          85L * contrib.getOrElse(i, 0L) / 100L)).toMap
    }
    v
  }

  test("graph_ppr equals the serial scaled-BIGINT model exactly") {
    val got = PageRank.ppr.fn(spark, "").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = serialPpr()
    assert(got.size == want.size)
    want.foreach { case (id, vv) =>
      assert(got(id) == vv, s"node $id: ${got(id)} != $vv")
    }
  }

  test("restart mass concentrates on the seeds; the global rank does not") {
    val ppr = PageRank.ppr.fn(spark, "").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val global = PageRank.pagerank.fn(spark, "").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seeds = (0L until PageRank.N)
      .filter(_ % PageRank.SeedMod == 0).toSet
    // every seed keeps at least its restart term
    val nSeeds = seeds.size
    val seedBase = (15L * (PageRank.Scale / nSeeds)) / 100L
    seeds.foreach(s => assert(ppr(s) >= seedBase))
    // the PPR top-|seeds| IS the seed set (proximity ranking)
    val top = ppr.toSeq.sortBy { case (id, v) => (-v, id) }
      .take(nSeeds).map(_._1).toSet
    assert(top == seeds, s"PPR top-$nSeeds $top != seeds $seeds")
    // concentration: the seeds hold a large constant share of PPR mass
    // but only ~|seeds|/N of the global rank's
    val pprShare = seeds.toSeq.map(ppr).sum.toDouble /
      ppr.values.map(_.toDouble).sum
    val globalShare = seeds.toSeq.map(global).sum.toDouble /
      global.values.map(_.toDouble).sum
    info(f"seed mass share: ppr $pprShare%.3f vs global $globalShare%.4f")
    // the restart floor alone guarantees ~0.15 after damping decay;
    // measured 0.226 on the ring+skip graph
    assert(pprShare > 0.2, f"seed share $pprShare%.3f unexpectedly low")
    assert(pprShare > 10 * globalShare,
      "PPR must concentrate mass near seeds an order beyond the global rank")
  }
}
