package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All W-length window hashes of a text in one TRUE rolling pass —
  * value-identical to `transform(sequence(1, length(text)-W+1), i ->
  * rolling_hash(substring(text, i, W)))` (the same 31-ary polynomial mod
  * 1e9+7 as [[RollingHash]], positions by code point, matching both
  * Spark's and DuckDB's substring semantics) but O(len) instead of
  * O(len·W): h_{i+1} = (h_i − cp_i·31^{W−1})·31 + cp_{i+W}. Texts shorter
  * than W yield an empty array. The q27 winnowing fingerprint walks every
  * window of the corpus — the 48× work factor of the naive spelling is
  * the difference between one corpus pass and a re-read per window at
  * 100 TB. */
case class WindowHashes(child: Expression, w: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
    else if (w < 1) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a positive window, got $w")
    else TypeCheckResult.TypeCheckSuccess

  override protected def nullSafeEval(input: Any): Any =
    WindowHashes.compute(input.asInstanceOf[UTF8String].toString, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WindowHashes.compute($c.toString(), $w)")

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

object WindowHashes {
  final val Mod = 1000000007L

  def compute(text: String, w: Int): ArrayData = {
    val len = text.length
    val cps = new Array[Int](text.codePointCount(0, len))
    var i = 0
    var k = 0
    while (i < len) {
      val cp = text.codePointAt(i)
      cps(k) = cp
      k += 1
      i += Character.charCount(cp)
    }
    val n = k - w + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    var pw = 1L // 31^(w-1) mod p, for dropping the leading code point
    var e = 0
    while (e < w - 1) { pw = pw * 31 % Mod; e += 1 }
    val out = new Array[Any](n)
    var h = 0L
    var j = 0
    while (j < w) { h = (h * 31 + cps(j)) % Mod; j += 1 }
    out(0) = h
    var s = 1
    while (s < n) {
      h = ((h - cps(s - 1) * pw % Mod + Mod) % Mod * 31 + cps(s + w - 1)) % Mod
      out(s) = h
      s += 1
    }
    new GenericArrayData(out)
  }
}
