package graft

import graft.operators.KCore
import org.apache.spark.sql.functions._

/** k-core peeling: serial-model parity, cascade behavior, and the
  * oracle-bound convergence assertion (the unrolled DuckDB oracle is
  * only valid while the fixpoint lands inside OracleRounds). */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def serialKcore(edges: Set[(Long, Long)], k: Int)
      : Map[Long, Int] = {
    var alive = edges
    var changed = true
    while (changed) {
      val deg = alive.groupBy(_._1).map { case (u, es) => u -> es.size }
      val keep = deg.filter(_._2 >= k).keySet
      val next = alive.filter { case (u, v) => keep(u) && keep(v) }
      changed = next != alive
      alive = next
    }
    alive.groupBy(_._1).map { case (u, es) => u -> es.size }
  }

  test("kcore matches serial peeling on a random graph, including a real cascade") {
    val rnd = new scala.util.Random(19)
    val base = Seq.fill(250)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }.distinct
    // a pendant chain whose removal must cascade: 100-101-102-103 each
    // hangs off the graph with degree < k once its child is peeled
    val chain = Seq((100L, 101L), (101L, 102L), (102L, 103L), (100L, 0L))
    val sym = (base ++ chain).flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toSet
    val got = KCore.kcoreOf(sym.toSeq.toDF("u", "v"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    val want = serialKcore(sym, 3)
    assert(got == want)
    // the chain is gone (cascaded), and the 3-core is nonempty
    assert(!got.contains(101L) && !got.contains(102L) && !got.contains(103L))
    assert(got.nonEmpty)
  }

  test("cutLineageReleasable frees the checkpoint's storage blocks; frame readable before release") {
    // the contract the k-core peel leans on (r12 verdict item 4): the
    // returned frame reads fine while un-released, release() drops the
    // checkpointed RDD's blocks from the block manager (so a long peel
    // loop carries O(current round) storage, not O(iterations))
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.size
    val (df, release) = graft.core.Iterative.cutLineageReleasable(
      spark.range(0, 1000, 1, 4).toDF("id"))
    assert(df.count() == 1000L) // readable while un-released
    assert(sc.getPersistentRDDs.size > before,
      "localCheckpoint should register a persisted RDD")
    release()
    assert(sc.getPersistentRDDs.size == before,
      "release() must drop the checkpointed blocks")
    // r13-advice misuse guard: double release is a no-op (the released
    // state is also renamed on release, so a post-release read's
    // 'block rdd_N_* not found' failure points at the contract — see
    // Iterative.cutLineageReleasable)
    release()
    assert(sc.getPersistentRDDs.size == before)
  }

  test("catalog graph converges well inside the oracle's unrolled bound") {
    // sf0.1 included so the unrolled-oracle validity is machine-checked
    // at every tier the driver ever verifies or benches, not argued from
    // the smaller corpora's round counts
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sfn =>
      val rounds = new java.util.concurrent.atomic.AtomicInteger(-1)
      val out = KCore.kcoreOf(
        KCore.orderPartEdges(Tables.lineitem(spark, sf(sfn))), KCore.K,
        Some(rounds))
      val n = out.count()
      assert(n > 0, s"$sfn: 4-core should be nonempty")
      assert(rounds.get > 0 && rounds.get <= KCore.OracleRounds - 2,
        s"$sfn: converged in ${rounds.get} rounds; oracle unrolls " +
          s"${KCore.OracleRounds} — need headroom")
      // every survivor really has >= K surviving neighbors
      assert(out.filter(col("deg") < KCore.K).isEmpty)
    }
  }

  test("tree closure: pointer-jumping depths match a serial parent-chain walk") {
    val d = sf("sf0.001")
    val got = graft.operators.Hierarchy.treeClosure.fn(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = Tables.customer(spark, d).count()
    assert(got.size == n)
    def parent(k: Long): Long =
      if (k == 0) 0L else ((k * 2654435761L) % 1000000007L) % k
    def serialDepth(k: Long): Long = {
      var x = k; var depth = 0L
      while (x != 0) { x = parent(x); depth += 1 }
      depth
    }
    got.foreach { case (node, depth) =>
      assert(depth == serialDepth(node), s"node $node")
    }
    // the random-attachment tree is genuinely deep-ish (log-depth claim)
    val maxDepth = got.values.max
    assert(maxDepth >= 4 && maxDepth <= 64, s"depth $maxDepth")
  }
}
