package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One engine query: a Spark implementation plus (when SQL-expressible) an
  * equivalent DuckDB oracle (driver contract, SURVEY.md §5).
  *
  * @param oracle ANSI SQL the driver runs in DuckDB over the same parquet
  *               tables; None → driver records a weaker rows-only check.
  * @param bench  include in the Bench headline set (sf0.1). Quadratic or
  *               driver-loop ops that are correctness exemplars stay out.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    bench: Boolean = true)

/** Conventions that make Spark-vs-DuckDB comparisons exact (SURVEY.md §7.4):
  * monetary doubles are cast to decimal BEFORE arithmetic so sums are exact
  * integers-scaled-by-10^k in both engines (no FP summation-order drift),
  * then the final value is cast back to double (values with ≤6 decimal
  * digits are exactly representable). Every query orders its output with a
  * full deterministic tie-break.
  */
object Num {
  /** Prices/discounts in the test tables carry ≤2 decimals; decimal(12,2)
    * holds them exactly at any scale factor. */
  def dec(c: Column): Column = c.cast("decimal(12,2)")

  /** Exact sum of a decimal expression, emitted as double. */
  def sumd(c: Column): Column = sum(c).cast("double")

  /** Exact average: decimal sum cast to double, divided by count — one
    * IEEE division, identical in both engines. */
  def avgd(c: Column): Column = sum(c).cast("double") / count(lit(1))

  /** revenue term: l_extendedprice * (1 - l_discount), exact in decimal. */
  def revenue(price: Column, disc: Column): Column =
    (dec(price) * (lit(1) - dec(disc))).cast("decimal(18,4)")

  /** DuckDB-side spellings of the same conventions. */
  val sqlRevenue =
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4))"
}
