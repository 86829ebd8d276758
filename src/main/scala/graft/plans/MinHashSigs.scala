package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All `k` MinHash signatures of a shingle array in one compiled pass:
  * sig_s = min over shingles of md5("s:" + shingle), identical semantics to
  * the DuckDB oracle's `list_min(list_transform(sh, x -> md5('s:' || x)))`
  * and to the higher-order-function spelling — but those run in the
  * expression interpreter (HOFs have no codegen), allocating a lambda frame
  * per element; this expression is one tight JVM loop reachable from
  * whole-stage codegen.
  */
case class MinHashSigs(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigs.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.MinHashSigs.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Static entry point shared by eval and generated code. */
  def compute(shingles: ArrayData, k: Int): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val mins = new Array[String](k)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val sh = shingles.getUTF8String(i)
      var s = 0
      while (s < k) {
        md.reset()
        md.update((s + ":").getBytes("UTF-8"))
        md.update(sh.getBytes)
        val hex = toHex(md.digest())
        if (mins(s) == null || hex.compareTo(mins(s)) < 0) mins(s) = hex
        s += 1
      }
      i += 1
    }
    // empty input => "g" sentinel per slot (sorts after every md5 hex char),
    // matching the fold-with-"g"-accumulator spelling
    val out = new Array[AnyRef](k)
    var j = 0
    while (j < k) {
      out(j) = UTF8String.fromString(if (mins(j) == null) "g" else mins(j))
      j += 1
    }
    new GenericArrayData(out)
  }

  private def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(2 * i) = hexDigits((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}
