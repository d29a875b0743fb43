package graft

/** Cache hygiene: no catalog query may register session-lifetime cache
  * entries. `.cache()`/`.persist()` inside a query fn registers with the
  * session's CacheManager at call time and nothing ever unpersists it, so
  * a library caller invoking the fn repeatedly accumulates pinned blocks
  * until heap pressure (the round-2 sweep-inflation bug, harness-side
  * only until now). Queries that genuinely need to materialize a shared
  * subtree use `localCheckpoint` instead — blocks owned by the RDD and
  * freed by the ContextCleaner on GC (see dedup_minhash_lsh). This spec
  * makes the harnesses' defensive `clearCache()` belt-and-braces rather
  * than load-bearing. */
class CacheHygieneSpec extends SparkSpec {

  test("no catalog query leaves CacheManager entries after construction") {
    spark.catalog.clearCache()
    val dir = sf("sf0.001")
    SparkEntry.queries.foreach { case (name, fn) =>
      // construction is where a DataFrame-returning fn can call cache();
      // driver-loop queries (bpe, sssp) run their supersteps here too
      fn(spark, dir)
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$name registered cache entries — library callers would leak them")
    }
  }
}
