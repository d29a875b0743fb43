package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Guards the SimHash pigeonhole-banding rewrite: the banded pair
  * generation must produce exactly the pair set the quadratic all-pairs
  * join defines. */
class DedupSpec extends SparkSpec {

  test("banded simhash pairs == quadratic all-pairs definition (sf0.001)") {
    val banded = SparkEntry.queries("dedup_simhash")(spark, sf("sf0.001"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // reference definition: every pair, Hamming ≤ 1
    val sigs = Dedup.simhashSignatures(spark, sf("sf0.001"))
    val quadratic = sigs.alias("x")
      .join(sigs.alias("y"), col("x.doc_id") < col("y.doc_id"))
      .withColumn("hamming",
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).cast("int"))
      .filter(col("hamming") <= 1)
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"), col("hamming"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(banded.toSet == quadratic.toSet)
    assert(banded.length == quadratic.length, "banding emitted duplicates")
    assert(banded.nonEmpty)
  }
}
