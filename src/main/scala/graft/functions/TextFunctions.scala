package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable text/hash primitives shared by the dedup + text-analysis
  * operators.
  *
  * Everything here has an exactly-matching DuckDB spelling (see the oracle
  * SQL in graft.queries.*) so the driver's hash-compare is bit-exact:
  * polynomial rolling hashes are computed mod 1e9+7 in 64-bit integers
  * (never overflowing), and all ratios are single IEEE divisions of exact
  * integers. Expressions are built with `expr(...)`/SQL strings so they stay
  * inside whole-stage codegen — no Scala UDFs on the hot path.
  */
object TextFunctions {
  /** Modulus for all rolling hashes: largest prime < 2^30 * ~0.93; keeps
    * h*31+c < 2^35, far from Long overflow (DuckDB would error on BIGINT
    * overflow rather than wrap, so staying small is a portability
    * requirement, not a style choice). */
  val HashMod = 1000000007L

  /** Polynomial rolling hash of a string column: fold h = (h*31 + code) mod
    * HashMod over the characters. Dispatches to the native codegen
    * [[RollingHashMod]] expression (callers register it via
    * [[HashExpressions.register]] once per session). */
  def rollHash(c: String): Column = expr(s"roll_hash($c)")

  /** Whitespace tokens (the corpus is single-space separated — FIXTURES.md). */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles of the token array (duplicates kept; callers that
    * need set semantics apply array_distinct). Documents shorter than n
    * tokens yield an EMPTY array — without the guard Spark's
    * `sequence(1, size - (n-1))` DESCENDS when the upper bound drops below
    * 1 (negative `element_at` indexes then read from the array's end),
    * where the DuckDB oracle spelling `range(1, len - (n-2))` is empty:
    * a silent cross-engine divergence on degenerate inputs
    * (TextFunctionsSpec pins the agreement). */
  def shinglesSql(tokensCol: String, n: Int): String = {
    val parts = (0 until n).map(k => s"element_at($tokensCol, j + $k)")
    s"if(size($tokensCol) < $n, array(), " +
      s"transform(sequence(1, size($tokensCol) - ${n - 1}), j -> " +
      s"concat_ws(' ', ${parts.mkString(", ")})))"
  }

  /** The i-th minhash permutation applied to a token hash: affine transform
    * (2i+1)·h + (7i+3) mod HashMod. */
  def minhashPermSql(hashCol: String, iCol: String): String =
    s"((2*$iCol + 1) * $hashCol + (7*$iCol + 3)) % $HashMod"
}
