package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native codegen dot product for `array<float>` / `array<double>`
  * embedding columns (either side may be either width — trained IVF
  * centroids are double while the corpus stays float32).
  *
  * The composable alternative — `aggregate(zip_with(a, b, (x,y) -> ...))`
  * — allocates an intermediate array and walks higher-order-function
  * lambdas per element; on an all-pairs similarity join that interpreter
  * overhead dominates (measured 47 s for 2M pairs × 64 dims at sf0.1).
  * This expression generates a tight primitive loop inside whole-stage
  * codegen instead. Semantics are identical: elementwise
  * double(a[i])*double(b[i]), summed left-to-right in double — the exact
  * convention the DuckDB oracles mirror, so results stay bit-equal
  * (float→double widening is exact, so a float32 side reads the same
  * values the oracle's CAST(x AS DOUBLE) produces).
  */
case class DotProductF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _))
          if Seq(l, r).forall(t => t == FloatType || t == DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_f64 requires two ARRAY<FLOAT|DOUBLE> arguments, got " +
          s"${l.catalogString} and ${r.catalogString}")
    }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left), isFloat(right))
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      def rd(arr: String, fl: Boolean) =
        if (fl) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${rd(a, isFloat(left))} * ${rd(b, isFloat(right))};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** LSH bucket id for one hash table: the sign pattern of `numHyperplanes`
  * dot products against the deterministic affine hyperplanes
  * `comp(hp, i) = ((hp*37 + i*101 + 17) % 97) / 97.0 - 0.5` (1-based i),
  * with hyperplane indices `table*numHyperplanes + h`.
  *
  * Replaces `numHyperplanes` separate `aggregate(transform(sequence(...)))`
  * higher-order aggregates per row — the HOF form allocates a sequence
  * array and walks two lambda frames per element per hyperplane, and was
  * the whole cost of `sim_ann_lsh` once it grew to 5 tables (measured
  * 2.7 s at sf0.1; this fused loop takes it to ~0.6 s). Accumulation is
  * the identical left-to-right `acc + double(emb[i]) * comp` in double, so
  * buckets stay bit-equal to the HOF spelling and to the DuckDB oracle's
  * `list_sum(list_transform(...))`.
  */
case class HyperplaneBucket(child: Expression, table: Int, numHyperplanes: Int)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hp_bucket requires ARRAY<FLOAT>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var bucket = 0
    var h = 0
    while (h < numHyperplanes) {
      val hp = table * numHyperplanes + h
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += a.getFloat(i).toDouble *
          (((hp * 37 + (i + 1) * 101 + 17) % 97).toDouble / 97.0 - 0.5)
        i += 1
      }
      if (dot >= 0.0) bucket |= 1 << h
      h += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val hp = ctx.freshName("hp")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
         |int $n = $c.numElements();
         |int $b = 0;
         |for (int $h = 0; $h < $numHyperplanes; $h++) {
         |  int $hp = $table * $numHyperplanes + $h;
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += (double) $c.getFloat($i) *
         |      ((double) (($hp * 37 + ($i + 1) * 101 + 17) % 97) / 97.0 - 0.5);
         |  }
         |  if ($dot >= 0.0) $b |= 1 << $h;
         |}
         |${ev.value} = $b;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** Register `dot_f64(a, b)` and `hp_bucket(a, table, numHyperplanes)` in
    * the session's function registry; callers then use them via
    * `expr(...)` inside codegen'd projections. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_f64", exprs => DotProductF32(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hp_bucket", exprs => {
        require(exprs.length == 3,
          s"hp_bucket expects (array, table, numHyperplanes), got ${exprs.length} args")
        def intLit(e: Expression, what: String): Int = {
          require(e.foldable && e.dataType == IntegerType,
            s"hp_bucket $what must be an integer literal")
          e.eval().asInstanceOf[Int]
        }
        HyperplaneBucket(exprs(0),
          intLit(exprs(1), "table"), intLit(exprs(2), "numHyperplanes"))
      }, "built-in")
  }
}
