package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** `|A∩B| / |A∪B| ≥ t` over two SORTED long arrays in one EARLY-EXIT merge
  * — the pre-verify prune of the q32 similarity join, designed to sit in a
  * join CONDITION so below-threshold candidate pairs die inside the join
  * and are never materialized downstream.
  *
  * The merge aborts the moment the best still-achievable intersection
  * (`seen + min(remaining_a, remaining_b)`) cannot reach the minimum
  * required count — for the typical candidate pair that shares only its
  * one prefix gram, that is after ~¼ of the merge instead of all of it
  * (PPJoin+'s suffix-filter idea, Xiao et al. WWW'08, realized as an exact
  * incremental bound instead of the paper's probe estimate).
  *
  * Threshold semantics EXACTLY match the declarative spelling
  * `inter / (na + nb − inter) >= t` under IEEE double arithmetic: the
  * required integer count is derived by monotone adjustment against that
  * very predicate, so a pair passes this expression iff its hashed arrays
  * would pass the double-division filter — no epsilon, no off-by-one at
  * the boundary.
  */
case class SortedLongJaccardGe(left: Expression, right: Expression, t: Double)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "sorted_long_jaccard_ge"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, false), ArrayType(LongType, false)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> (no null elements) arguments, got " +
        s"${l.catalogString} and ${r.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedLongJaccardGe.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], t)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // The threshold is emitted via its raw bits, not Java source text: a
    // text interpolation of NaN/Infinity ("compute(a, b, NaN)") is not a
    // valid Java literal and would surface as a codegen failure; bits
    // round-trip every double exactly.
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.SortedLongJaccardGe.compute($a, $b, " +
        s"Double.longBitsToDouble(${java.lang.Double.doubleToRawLongBits(t)}L))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongJaccardGe =
    copy(left = newLeft, right = newRight)
}

object SortedLongJaccardGe {

  /** Smallest integer intersection count c such that
    * `c.toDouble / (s − c) >= t` — found by monotone adjustment of the
    * double-estimate so the integer boundary agrees with IEEE division
    * exactly (f(c) = c/(s−c) is non-decreasing in c for 0 ≤ c ≤ s under
    * correctly-rounded division; f(s) = +Infinity, so the loop
    * terminates). */
  def minCount(s: Int, t: Double): Int = {
    var need = math.ceil(t * s / (1.0 + t)).toInt
    if (need < 0) need = 0
    if (need > s) need = s
    while (need > 0 && (need - 1).toDouble / (s - (need - 1)) >= t) need -= 1
    while (need <= s && need != s && need.toDouble / (s - need) < t) need += 1
    need
  }

  def compute(a: ArrayData, b: ArrayData, t: Double): Boolean = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return false // empty union: jaccard undefined
    val need = minCount(na + nb, t)
    if (need > math.min(na, nb)) return false
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val remA = na - i
      val remB = nb - j
      if (c + (if (remA < remB) remA else remB) < need) return false
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c >= need
  }
}
