package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Intersection cardinality of two SORTED string arrays in one compiled
  * merge pass — the verify kernel of the q32 similarity join. Semantically
  * identical to `size(array_intersect(a, b))` for arrays that are distinct
  * and ascending (`array_sort` order = UTF8String binary order, the same
  * comparator this merge uses), but O(|a|+|b|) byte-compares with ZERO
  * allocation, where `array_intersect` builds a hash set of UTF8Strings
  * per ROW — at millions of candidate pairs the hash-set spelling was 25 s
  * of q32's 43 s (round-9 probe); this kernel is the difference between a
  * verify that tracks candidate volume and one that dominates the query.
  *
  * Union cardinality follows for free: |A∪B| = |A| + |B| − |A∩B|.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, got " +
        s"${l.catalogString} and ${r.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.SortedIntersectCount.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Null elements are skipped on either side (array_sort places them
    * last, so for sorted input this just stops the merge early) — the
    * function is registered for ad-hoc SQL, where a nullable-element
    * array must not NPE. */
  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }
}
