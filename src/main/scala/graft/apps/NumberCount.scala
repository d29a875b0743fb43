package graft.apps

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{MapReduce, MapReduceJob}

/** The reference's first sample app: count-per-key over random ints
  * (`/root/reference/sample_apps/number_count/main.cpp`).
  *
  * map: `emit_intermediate(x, 1)` per int (main.cpp:10-13);
  * reduce: count the grouped list's length (main.cpp:15-20);
  * data: 10M ints `rand()%100`, `srand(1000)` (main.cpp:23-29).
  *
  * Exact C `rand()` parity is not required (FIXTURES.md §A1) — determinism
  * per seed is, which `rand(seed)` gives per fixed partition layout.
  */
object NumberCount {

  /** Seeded data generator (≅ gen_ints, main.cpp:23-29). Deterministic for
    * a fixed seed + partition count. */
  def genInts(spark: SparkSession, n: Long, distinct: Int = 100,
      seed: Long = 1000, partitions: Int = 32): DataFrame =
    spark.range(0, n, 1, partitions)
      .select((rand(seed) * distinct).cast("int").as("value"))

  /** The literal MapReduce formulation — full-list reduce, counting by
    * iterating the values exactly like the reference's `sum++` loop. Used
    * by tests to prove MR(count) == groupBy().count(). */
  val job: MapReduceJob[Int, Int, Int, Long] = new MapReduceJob[Int, Int, Int, Long] {
    def map(in: Int): IterableOnce[(Int, Int)] = Iterator((in, 1))
    def reduce(key: Int, vals: Iterator[Int]): IterableOnce[Long] = {
      var n = 0L
      while (vals.hasNext) { vals.next(); n += 1 }
      Iterator.single(n)
    }
  }

  def runMapReduce(ints: Dataset[Int]): Dataset[(Int, Long)] = {
    val spark = ints.sparkSession
    import spark.implicits._
    MapReduce.run(ints, job)
  }

  /** The idiomatic (and 100 TB-ready) formulation: hash aggregation with
    * map-side partial count — what the reference's no-combiner design
    * cannot do (firebird.h:79-82). */
  def runIdiomatic(ints: DataFrame): DataFrame =
    ints.groupBy(col("value")).agg(count(lit(1)).as("cnt"))
}
