package graft.core

import org.apache.spark.sql.{Encoder, SparkSession}
import scala.reflect.ClassTag

/** Drop-in ergonomic facade matching the reference scheduler's call shape
  * (`/root/reference/firebird.h:139-236`): `set_input` → knobs → `run()` →
  * `get_output()`. A Firebird user can port an app by subclassing this and
  * overriding the same two virtuals (`map`/`reduce`, ≅ firebird.h:248-249);
  * underneath it is the declarative [[MapReduce.run]] plan, not a
  * scheduler.
  *
  * Deliberate differences, documented for migrators:
  *   - `set_num_map_thread`/`set_num_reduce_thread` (firebird.h:139-164)
  *     map to Spark parallelism and are accepted-but-advisory: the
  *     equivalents are `local[N]` / `spark.sql.shuffle.partitions`.
  *   - `set_unit_size` (firebird.h:171-173) becomes the partition count
  *     hint used when parallelizing the input array.
  *   - Output order is unordered, exactly like the reference
  *     (README.txt:55-58).
  */
abstract class FirebirdCompat[I: Encoder: ClassTag, K: Encoder, V, O](
    spark: SparkSession)(
    implicit kvEnc: Encoder[(K, V)], koEnc: Encoder[(K, O)])
  extends MapReduceJob[I, K, V, O] {

  private var input: Seq[I] = Seq.empty
  private var partitions: Int = spark.sparkContext.defaultParallelism
  private var output: Seq[(K, O)] = Seq.empty

  /** ≅ set_input(ptr, size) — firebird.h:167-170. */
  def set_input(data: Seq[I]): Unit = { input = data }

  /** ≅ set_unit_size — firebird.h:171-173: elements per map task becomes a
    * partition-count hint. */
  def set_unit_size(unitSize: Int): Unit =
    if (unitSize > 0 && input.nonEmpty)
      partitions = math.max(1, math.min(
        spark.sparkContext.defaultParallelism * 4,
        (input.size + unitSize - 1) / unitSize))

  /** ≅ set_num_map_thread / set_num_reduce_thread — firebird.h:139-164.
    * Advisory: Spark's parallelism is session-level. */
  def set_num_map_thread(n: Int): Unit =
    partitions = math.max(1, n)
  def set_num_reduce_thread(n: Int): Unit = ()

  /** ≅ run() — firebird.h:182-231. Synchronous, like the reference.
    * The input array is split across `partitions` at parallelize time
    * (≅ the reference's chunking, firebird.h:188) — no extra shuffle. */
  def run(): Unit = {
    val ds = spark.createDataset(
      spark.sparkContext.parallelize(input, partitions))(
      implicitly[Encoder[I]])
    output = MapReduce.run(ds, this).collect().toSeq
  }

  /** ≅ get_output() — firebird.h:234-236: unordered result pairs. */
  def get_output(): Seq[(K, O)] = output
}
