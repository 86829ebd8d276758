package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Winnowing fingerprint selection (Schleimer et al., SIGMOD'03) over a
  * window-hash array: for every window of `k` consecutive hashes, select
  * the position of the LEFTMOST minimum; return the distinct selected
  * positions ascending (1-based, matching the SQL spelling
  * `list_position(hs[i:i+k-1], list_min(hs[i:i+k-1]))`). Value-identical
  * to the interpreted
  * `array_distinct(transform(sequence(1, size(hs)-k+1), i ->
  * i-1+array_position(slice(hs,i,k), array_min(slice(hs,i,k)))))`
  * but one compiled pass with a monotonic deque — O(n) total, zero
  * per-window allocation, where the higher-order spelling copies two
  * k-slices per window (34 s of q27's sf0.1 runtime, round-9 probe).
  * Arrays shorter than k select nothing — total by construction, so
  * generate-inferred filters can re-evaluate it anywhere. */
case class WinnowPositions(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "winnow_positions"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a positive k, got $k")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<bigint> argument, got ${t.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    WinnowPositions.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WinnowPositions.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): WinnowPositions =
    copy(child = newChild)
}

object WinnowPositions {
  def compute(hs: ArrayData, k: Int): ArrayData = {
    val n = hs.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // monotonic deque of candidate positions (0-based): values strictly
    // increasing front→back, so the front is each window's LEFTMOST
    // minimum (a later equal value never evicts an earlier one — `<` not
    // `<=` — matching array_position's first-match tie-break)
    val deque = new java.util.ArrayDeque[Int]()
    val out = mutable.ArrayBuffer.empty[Any]
    var last = -1
    var j = 0
    while (j < n) {
      while (!deque.isEmpty && hs.getLong(deque.peekLast) > hs.getLong(j))
        deque.pollLast()
      deque.addLast(j)
      if (deque.peekFirst <= j - k) deque.pollFirst()
      if (j >= k - 1) {
        val sel = deque.peekFirst
        if (sel != last) { out += sel + 1; last = sel } // 1-based, distinct
      }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }
}
