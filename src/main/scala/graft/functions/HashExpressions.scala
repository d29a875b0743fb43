package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen polynomial rolling hash: fold h = (h*31 + byte) mod
  * 1e9+7 over the string's bytes.
  *
  * Replaces the composable spelling
  * `aggregate(transform(sequence(1, length(s)), i -> ascii(substring(s,i,1))), ...)`
  * which materializes a sequence array and evaluates two lambda frames per
  * character. Identical results for ASCII input (the corpus guarantee —
  * FIXTURES.md; byte == codepoint == DuckDB `unicode(c)`), which is what
  * the oracle parity relies on.
  */
case class RollingHashMod(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  // Fail at analysis time on non-string input instead of a ClassCastException
  // inside generated code. (ExpectsInputTypes isn't usable here:
  // AbstractDataType is private[sql].)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"roll_hash requires a STRING argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xffL)) % TextFunctions.HashMod
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 31 + ($bytes[$i] & 0xffL)) % ${TextFunctions.HashMod}L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 61-bit polynomial rolling hash: fold h = (h*131 + byte) mod 2⁶¹−1
  * over the string's bytes. The wide twin of [[RollingHashMod]] for
  * content-identity decisions where the ~30-bit hash's ~1e-9 per-key
  * collision rate is material (e.g. `cdc_snapshot_diff` at 10¹² keys):
  * a uniform 61-bit hash collides at ~4.3e-19 per compared pair.
  *
  * The Mersenne modulus makes the 128-bit step cheap without BigInteger:
  * with h < 2⁶¹ and base 131, the product P = h·131 < 2⁶⁸ splits into
  * hi·2⁶⁴ + lo (`Math.multiplyHigh` — exact for non-negative operands),
  * and 2⁶⁴ ≡ 2³, 2⁶¹ ≡ 1 (mod M) give P ≡ 8·hi + (lo >>> 61) + (lo & M),
  * a sum < 2⁶² reduced by at most two conditional subtractions. DuckDB
  * replicates it exactly with HUGEINT arithmetic (`(h*131 + code) %
  * 2305843009213693951` under a 128-bit fold) — same ASCII byte ==
  * codepoint corpus guarantee as the 30-bit hash. */
case class RollingHashMersenne61(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"roll_hash61 requires a STRING argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = RollingHashMersenne61.step(h, bytes(i))
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = graft.functions.RollingHashMersenne61.step($h, $bytes[$i]);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHashMersenne61 {
  val Mod61: Long = (1L << 61) - 1

  /** (h*131 + (b & 0xff)) mod 2⁶¹−1, for 0 ≤ h < 2⁶¹. Called from
    * generated code — must stay a static-shaped public method. */
  def step(h: Long, b: Byte): Long = {
    val lo = h * 131L
    val hi = java.lang.Math.multiplyHigh(h, 131L)
    var r = (hi << 3) + (lo >>> 61) + (lo & Mod61) + (b & 0xffL)
    while (r >= Mod61) r -= Mod61
    r
  }
}

/** Natural log via `java.lang.Math.log` — NOT Spark's `ln`/`log`, which
  * call `StrictMath.log` (fdlibm). Measured on this platform across every
  * distinct frequency ratio in the three test corpora: `Math.log` is
  * bit-identical to DuckDB's libm `ln` on all 82 ratios (cold and
  * C2-compiled), while `StrictMath.log` differs by 1 ulp on one — enough
  * to break a hash-exact oracle row. Used by `text_unigram_logprob`,
  * whose oracle gate re-verifies the agreement on every run. */
case class MathLog(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"math_ln requires a DOUBLE argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any =
    java.lang.Math.log(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = java.lang.Math.log($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashExpressions {
  /** Register `roll_hash(s)` and `math_ln(x)` in the session's function
    * registry. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "roll_hash", exprs => {
        require(exprs.length == 1,
          s"roll_hash expects exactly 1 argument, got ${exprs.length}")
        RollingHashMod(exprs.head)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "roll_hash61", exprs => {
        require(exprs.length == 1,
          s"roll_hash61 expects exactly 1 argument, got ${exprs.length}")
        RollingHashMersenne61(exprs.head)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "math_ln", exprs => {
        require(exprs.length == 1,
          s"math_ln expects exactly 1 argument, got ${exprs.length}")
        MathLog(exprs.head)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "edit_dist", exprs => {
        require(exprs.length == 2,
          s"edit_dist expects exactly 2 arguments, got ${exprs.length}")
        EditDistanceAscii(exprs.head, exprs(1))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count", exprs => {
        require(exprs.length == 2,
          s"sorted_intersect_count expects exactly 2 arguments, " +
            s"got ${exprs.length}")
        SortedIntersectCount(exprs.head, exprs(1))
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "utf8_bytes", exprs => {
        require(exprs.length == 1,
          s"utf8_bytes expects exactly 1 argument, got ${exprs.length}")
        Utf8Bytes(exprs.head)
      }, "built-in")
  }
}

/** UTF-8 bytes of a string as ARRAY<INT> (unsigned, 0..255) — the
  * byte-level BPE alphabet (`text_bpe_bytes`): every string decomposes
  * into these 256 atoms, so no token is ever out-of-vocabulary (the GPT-2
  * byte-fallback property). One pass over the string's bytes, native
  * codegen (no sequence materialization, no lambda frames). The DuckDB
  * mirror uses `unicode(c)` per character, equal to the byte on the ASCII
  * corpus (the [[RollingHashMod]] convention); non-ASCII behavior —
  * multi-byte code points decomposing into their UTF-8 bytes and
  * round-tripping exactly — is pinned in ScalaTest (BpeSpec), not the
  * oracle. */
case class Utf8Bytes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"utf8_bytes requires a STRING argument, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val out = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i) & 0xff; i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val vals = ctx.freshName("vals")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |int[] $vals = new int[$bytes.length];
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $vals[$i] = $bytes[$i] & 0xff;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($vals);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
