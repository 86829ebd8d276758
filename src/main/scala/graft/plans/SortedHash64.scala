package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit hashes of every element of a string array, returned SORTED
  * ascending — the narrow representation of a gram set for similarity-join
  * heavy paths (q32): the frequency groupBy, the rank window, the prefix
  * candidate join, and the verify merge all operate on 8-byte longs
  * instead of UTF8Strings, which halves row width and turns byte-wise
  * string compares into single-instruction long compares.
  *
  * Hash = FNV-1a 64 over the UTF8 bytes, finished with the public-domain
  * splitmix64 mixer (Steele et al., OOPSLA'14 — the same finalizer used by
  * `java.util.SplittableRandom`). Equal strings always hash equal, so any
  * merge-intersect over the hashed arrays is an UPPER bound on the true
  * string intersection (collisions can only inflate it) — pruning pairs
  * whose hash-Jaccard is below threshold therefore drops no qualifying
  * pair, and the surviving handful re-verifies on the exact strings.
  *
  * Null elements are rejected at analysis time: the hash of "absent" has
  * no principled value and silently skipping would desynchronize array
  * length from element count.
  */
case class SortedHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_hash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, false) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, true) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> without null elements")
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SortedHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SortedHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SortedHash64 =
    copy(child = newChild)
}

object SortedHash64 {

  /** FNV-1a 64 over the raw UTF8 bytes + splitmix64 finalizer. */
  def hash64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h ^= (h >>> 30); h *= 0xbf58476d1ce4e5b9L
    h ^= (h >>> 27); h *= 0x94d049bb133111ebL
    h ^ (h >>> 31)
  }

  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = hash64(arr.getUTF8String(i).getBytes)
      i += 1
    }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }
}
