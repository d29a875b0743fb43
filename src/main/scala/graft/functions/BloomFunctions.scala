package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL surface for Spark's runtime-filter machinery, made explicit.
  *
  * Spark's `InjectRuntimeFilter` rule builds a `BloomFilterAggregate` over
  * the creation side of a selective join and prunes the application side
  * with `BloomFilterMightContain` before the shuffle. Exposing the same
  * two Catalyst expressions as registered functions lets a query author
  * place that semi-join reduction deliberately — the 100 TB pattern where
  * a fact table is pruned by a filtered dimension's key set BEFORE paying
  * the fact-side shuffle, without materializing the key list.
  *
  * `bloom_agg(xxhash64(k))` sizing: 64 Ki expected items / 512 Ki bits
  * (64 KiB serialized, 8 bits/item ≈ 2 % false-positive ceiling at full
  * load). The bloom is a bit-OR sketch, so the aggregate is map-side
  * combinable and insertion-order independent — deterministic output. A
  * production deployment sizes from the dimension's row-count stats; the
  * false-positive rate only costs extra join probes, never correctness
  * (no false negatives, and the exact join removes false positives).
  */
object BloomFunctions {
  val ExpectedItems = 65536L
  val NumBits = 524288L

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg", exprs => {
        require(exprs.length == 1,
          s"bloom_agg expects exactly 1 argument, got ${exprs.length}")
        BloomFilterAggregate(exprs.head, Literal(ExpectedItems),
          Literal(NumBits), 0, 0)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain", exprs => {
        require(exprs.length == 2,
          s"bloom_might_contain expects exactly 2 arguments, " +
            s"got ${exprs.length}")
        BloomFilterMightContain(exprs.head, exprs(1))
      }, "built-in")
  }
}
