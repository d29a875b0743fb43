package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Intersection SIZE of two SORTED arrays (both ARRAY<STRING> or both
  * ARRAY<BIGINT>) as one merge walk — the hot loop of every exact
  * set-similarity verify (containment, prefix-Jaccard, and since r14
  * the MinHash Jaccard verify over hashed shingle sets), where the
  * composable spelling `size(array_intersect(a, b))` builds a hash set
  * and materializes the intersection ARRAY per row only to take its
  * length. On the 15 M-pair containment verify at sf0.1 the merge walk
  * is the difference between the verify dominating the entry and not
  * (A/B in BASELINE.md round 10). The BIGINT branch exists for the
  * r13-verdict minhash fix: 8-byte hashed shingles verify with
  * primitive compares, no UTF8String walk at all.
  *
  * PRECONDITIONS (callers own them; call sites build inputs with
  * `array_sort(array_distinct(...))` / `sort_array(collect_set(...))`):
  * both arrays ascending (UTF8String binary order for strings, numeric
  * for longs), duplicate-free, no null elements. Unsorted input
  * silently undercounts — this is a kernel for the dedup operators,
  * not a general SQL surface. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType,
      right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect_count requires both sides ARRAY<STRING> or " +
        s"both ARRAY<BIGINT>, got (${l.catalogString}, ${r.catalogString})")
  }

  private def isLong: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(l: Any, r: Any): Any =
    if (isLong)
      SortedIntersectCount.countLong(
        l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    else
      SortedIntersectCount.count(
        l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isLong) "countLong" else "count"
    nullSafeCodeGen(ctx, ev, (l, r) => {
      s"${ev.value} = graft.functions.SortedIntersectCount.$fn($l, $r);"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Linear merge over two ascending duplicate-free string arrays. */
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

  /** Linear merge over two ascending duplicate-free BIGINT arrays —
    * primitive compares over packed long storage. */
  def countLong(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}
