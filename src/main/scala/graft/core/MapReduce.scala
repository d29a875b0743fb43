package graft.core

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** The reference engine's entire programming model, re-expressed on Spark.
  *
  * The reference (`/root/reference/firebird.h:17-277`) is a single templated
  * scheduler: the user subclasses it, overrides `map()` (firebird.h:248,
  * emitting via `emit_intermediate`, firebird.h:239-242) and `reduce()`
  * (firebird.h:249, receiving the key plus an iterator over ALL grouped
  * values, emitting via `emit`, firebird.h:243-245), calls `run()`
  * (firebird.h:182-231) and reads an unordered output vector
  * (firebird.h:234-236).
  *
  * Semantics preserved here:
  *   - map has flatMap semantics: 0..n emissions per input element
  *     (the shortest_path map emits nothing when no edge relaxes,
  *     reference main.cpp:41-43).
  *   - reduce sees the FULL list of values for a key through a one-shot
  *     iterator — not a binary combiner (firebird.h:249).
  *   - output order is NOT guaranteed (reference README.txt:55-58), matching
  *     Spark's unordered Dataset results.
  *
  * Deliberately NOT preserved: the serial splice-merge "shuffle"
  * (firebird.h:84-95) becomes a distributed hash Exchange; per-thread
  * std::map grouping becomes Tungsten hash aggregation / shuffle write.
  * Both are strict upgrades for the 100 TB target: the reference keeps every
  * intermediate value in memory with no combiner (firebird.h:79-82), while
  * [[MapReduce.runAggregated]] lets Catalyst insert partial (map-side)
  * aggregation when the reduction is associative.
  */
trait MapReduceJob[I, K, V, O] extends Serializable {
  /** ≅ `map` + `emit_intermediate` (firebird.h:248,239-242). */
  def map(in: I): IterableOnce[(K, V)]

  /** ≅ `reduce` + `emit` (firebird.h:249,243-245). `vals` is a one-shot
    * iterator over every value grouped under `key`, mirroring the
    * reference's `MapOutputValIter begin/end` contract. */
  def reduce(key: K, vals: Iterator[V]): IterableOnce[O]
}

object MapReduce {

  /** ≅ `MapReduceScheduler::run()` (firebird.h:182-231): split → map →
    * group → reduce, as one declarative Spark plan. The `groupByKey`
    * shuffle replaces the reference's serial merge (firebird.h:203-208).
    *
    * Scale note: this is the fully general form (reduce sees all values).
    * It shuffles every emitted pair — exactly what the reference does, but
    * distributed. When the reduction is associative use
    * [[runAggregated]]/plain `agg()` instead so map-side partial
    * aggregation cuts shuffle volume.
    */
  def run[I, K, V, O](ds: Dataset[I], job: MapReduceJob[I, K, V, O])(
      implicit kv: Encoder[(K, V)], k: Encoder[K], ko: Encoder[(K, O)]): Dataset[(K, O)] =
    ds.flatMap(job.map(_))
      .groupByKey(_._1)
      .flatMapGroups((key: K, it: Iterator[(K, V)]) =>
        job.reduce(key, it.map(_._2)).iterator.map((key, _)))

  /** Associative/commutative fast path: the same MapReduce shape but with a
    * typed [[Aggregator]] so Catalyst plans partial + final aggregation
    * (map-side combine — the optimization the reference explicitly lacks,
    * firebird.h:79-82 groups but never pre-reduces).
    */
  def runAggregated[I, K, V, O](ds: Dataset[I],
      mapFn: I => IterableOnce[(K, V)], agg: Aggregator[V, _, O])(
      implicit kv: Encoder[(K, V)], k: Encoder[K], v: Encoder[V],
      ko: Encoder[(K, O)]): Dataset[(K, O)] =
    ds.flatMap(mapFn(_))
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg.toColumn)

  /** Count-per-key aggregator (≅ number_count's reduce, which just counts
    * list length — reference sample_apps/number_count/main.cpp:15-20). */
  def countAgg[V]: Aggregator[V, Long, Long] = new Aggregator[V, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, a: V): Long = b + 1
    def merge(b1: Long, b2: Long): Long = b1 + b2
    def finish(r: Long): Long = r
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Min-fold aggregator (≅ shortest_path's reduce,
    * reference sample_apps/shortest_path/main.cpp:48-56 minus the shared
    * `dist[]` side effect, which in Spark lives in the driver loop — see
    * graft.apps.ShortestPath). */
  def minAgg: Aggregator[Double, Double, Double] =
    new Aggregator[Double, Double, Double] {
      def zero: Double = Double.PositiveInfinity
      def reduce(b: Double, a: Double): Double = math.min(b, a)
      def merge(b1: Double, b2: Double): Double = math.min(b1, b2)
      def finish(r: Double): Double = r
      def bufferEncoder: Encoder[Double] = Encoders.scalaDouble
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
}
