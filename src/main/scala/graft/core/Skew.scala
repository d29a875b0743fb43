package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for the 100 TB target.
  *
  * AQE's skew-join handling covers sort-merge joins; for *aggregations*
  * over pathologically hot keys the standard fix is two-phase salted
  * aggregation: spray each hot key across `salts` sub-keys, partially
  * aggregate, then combine. Results are identical to the direct
  * aggregation whenever the combine functions are associative (sum, count,
  * min, max) — proven by the oracle-backed `q22_salted_agg` exemplar and
  * property tests.
  */
object Skew {

  /** Deterministic salt in [0, salts): hashes a row-identifying column so
    * re-runs produce identical partial groupings. */
  def salt(idCol: Column, salts: Int): Column =
    pmod(xxhash64(idCol), lit(salts.toLong))

  /** Salted shuffle join for a skewed big side. For associative
    * aggregations Spark's map-side partial aggregation already absorbs hot
    * keys (each map task emits one partial row per key), and AQE splits
    * skewed sort-merge-join partitions at runtime — so the manual pattern
    * matters for the cases those two don't cover (shuffle-hash joins,
    * stream-side constraints, pre-AQE engines). Each fact row is sprayed
    * into one of `salts` sub-keys; the dim side is replicated `salts`×;
    * the join key becomes (key, salt), so a key holding p% of the fact
    * lands on `salts` tasks instead of one. Result set is identical to the
    * direct join (dim replication is exact, each fact row joins once per
    * matching dim row). SkewSpec proves both equality and the load spread
    * on a 90%-hot-key corpus via per-task shuffle-read metrics. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, saltBy: String,
      salts: Int = 8): DataFrame = {
    val f = fact.withColumn("_salt", salt(col(saltBy), salts).cast("int"))
    val dimX = dim.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    f.join(dimX, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase salted sum/count per key.
    *
    * @param df      input
    * @param key     grouping column name
    * @param saltBy  a (well-distributed) column to derive the salt from
    * @param sumCol  column to sum (cast to decimal by the caller if
    *                exactness is required)
    */
  def saltedSumCount(df: DataFrame, key: String, saltBy: String,
      sumCol: Column, salts: Int = 16): DataFrame = {
    val partial = df
      .withColumn("_salt", salt(col(saltBy), salts))
      .groupBy(col(key), col("_salt"))
      .agg(sum(sumCol).as("_psum"), count(lit(1)).as("_pcnt"))
    partial
      .groupBy(col(key))
      .agg(sum(col("_psum")).as("sum"), sum(col("_pcnt")).as("cnt"))
  }
}
