package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Intersection SIZE of two SORTED string arrays as one merge walk —
  * the hot loop of every exact set-similarity verify (containment,
  * prefix-Jaccard), where the composable spelling
  * `size(array_intersect(a, b))` builds a hash set and materializes the
  * intersection ARRAY per row only to take its length. On the
  * 15 M-pair containment verify at sf0.1 the merge walk is the
  * difference between the verify dominating the entry and not
  * (A/B in BASELINE.md round 10).
  *
  * PRECONDITIONS (callers own them; the `containmentOf`/`prefixJaccard`
  * call sites build inputs with `array_sort(array_distinct(...))`):
  * both arrays ascending in UTF8String binary order (what `array_sort`
  * produces for strings), duplicate-free, no null elements. Unsorted
  * input silently undercounts — this is a kernel for the dedup
  * operators, not a general SQL surface. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
      right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires (ARRAY<STRING>, ARRAY<STRING>), " +
        s"got (${l.catalogString}, ${r.catalogString})")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    SortedIntersectCount.count(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      s"${ev.value} = graft.functions.SortedIntersectCount.count($l, $r);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Linear merge over two ascending duplicate-free arrays. */
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }
}
