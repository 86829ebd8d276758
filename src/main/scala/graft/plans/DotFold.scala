package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType}

/** Sequential left-fold dot product of two double arrays — bit-identical
  * to the `aggregate(zip_with(...))` spelling and to the DuckDB oracle's
  * `list_reduce(list_transform(...))` (same element order, same IEEE adds),
  * but compiled: the higher-order form runs in the expression interpreter
  * with a lambda frame per element, which made the pairwise-cosine queries
  * the slowest in the engine at sf0.1.
  */
case class DotFold(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_fold"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotFold.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.DotFold.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotFold =
    copy(left = newLeft, right = newRight)
}

object DotFold {
  /** Shared by eval and generated code. Strict left-to-right accumulation —
    * do not reorder or vectorize; bit-exactness with the oracle depends on
    * the fold order. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

/** [[DotFold]] over int8 CODES: left is the stored `array<tinyint>` (an
  * IVF-SQ cell payload), right the quantized query carried as exact
  * doubles. Each byte widens to the exact double it quantized from
  * (|q| ≤ 127 — the tinyint round-trip is lossless), so the result is
  * bit-identical to casting the codes to `array<double>` first and
  * folding with [[DotFold]] — which is what the first SQ probe spelling
  * did, through an INTERPRETED `transform` lambda materializing a fresh
  * 64-element array per scanned row: measured 2.6× slower than the
  * float probe at 100× corpus despite scanning 7× fewer bytes
  * (SCALING.md round 18). The compiled fold reads the bytes in place,
  * which is the whole point of storing codes. */
case class DotFoldI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_fold_i8"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<tinyint>, array<double>), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotFoldI8.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.DotFoldI8.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotFoldI8 =
    copy(left = newLeft, right = newRight)
}

object DotFoldI8 {
  /** Strict left-to-right accumulation, the [[DotFold.compute]] rule —
    * EXCEPT on a dimension mismatch, where this fold FAILS LOUDLY
    * instead of truncating (round-18 advice): DotFold's min-length rule
    * serves ad-hoc frames where ragged inputs are the caller's data;
    * here `codes` is an INDEX PAYLOAD whose length the IVF-SQ store
    * contract fixes at build time, so a mismatch means store corruption
    * or a wrong-dimension query — silently-wrong scores on a persisted
    * index are exactly the hazard class the fit-version guard exists
    * for. */
  def compute(codes: ArrayData, q: ArrayData): Double = {
    val n = codes.numElements()
    if (n != q.numElements())
      throw new IllegalArgumentException(
        s"dot_fold_i8: stored codes have $n dims but the query has " +
          s"${q.numElements()} — an SQ store's dimension is fixed at " +
          "build; a mismatch is store corruption or a wrong-model query")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += codes.getByte(i).toDouble * q.getDouble(i)
      i += 1
    }
    acc
  }
}
