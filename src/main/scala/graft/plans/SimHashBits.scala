package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled SimHash kernels — round-20 optimization of q31/q92's
  * fingerprint and verify expressions (guide §1.2 step 2 / §4-class
  * expression work).
  *
  * The portable spelling of one 32-bit fingerprint half is a doubly
  * nested interpreted higher-order chain: `aggregate(hashes,
  * array_repeat(0, 32), (acc, h) -> zip_with(acc, sequence(1, 32),
  * (a, j) -> a + if(substr(h, j, 1) >= '8') 1 else -1))` followed by a
  * second fold rendering '0'/'1' chars — per md5 it allocates a fresh
  * 32-int array, a 32-int sequence, and runs 32 lambda frames; the
  * Hamming verify runs 64 (q31) or 128 (q92) interpreted
  * substr-compares per candidate pair. These kernels compute the
  * identical values in one compiled pass: the same unsigned byte
  * comparison against '8' (UTF8String ordering IS unsigned
  * lexicographic, and on the md5-hex domain bytes ≡ characters), the
  * same integer votes (order-independent sums), the same
  * '1'-iff-votes-positive rendering, and the same per-position
  * mismatch count with substr's out-of-range-is-empty semantics.
  *
  * Domain contract: inputs are md5 hex strings (fingerprints:
  * concatenations of rendered halves) — pure ASCII, so byte index ≡
  * character index. Both kernels throw loudly on a non-ASCII byte
  * rather than silently diverging from the character-indexed
  * interpreted spelling; null ELEMENTS in the hash array (impossible:
  * the arrays are `transform(sh, md5)` output) also throw. Pinned
  * kernel ≡ interpreted spelling bit-for-bit in SimHashKernelSpec,
  * including codegen (no CodegenFallback).
  */
case class SimhashFp32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "simhash_fp32"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $other")
  }

  override protected def nullSafeEval(a: Any): Any =
    SimhashFp32.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.SimhashFp32.compute($a)")

  override protected def withNewChildInternal(
      newChild: Expression): SimhashFp32 = copy(child = newChild)
}

object SimhashFp32 {
  private final val Eight = '8'.toByte

  /** Majority-vote bits over the hash array: bit j (0-based) votes +1
    * when hash byte j is >= '8' (unsigned — matches UTF8String's
    * one-char comparison on the ASCII domain), −1 otherwise — including
    * when the hash is shorter than 32 bytes, where the interpreted
    * `substr(h, j, 1)` yields '' and '' >= '8' is false. Renders
    * '1' iff votes > 0, '0' otherwise — identical to the fold seed ''
    * + concat chain. */
  def compute(a: ArrayData): UTF8String = {
    val n = a.numElements()
    val votes = new Array[Int](32)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        "simhash_fp32: null hash element — the kernel folds transform(_, " +
          "md5(_)) output, which cannot contain nulls; a null means a " +
          "caller bug")
      val h = a.getUTF8String(i)
      val bytes = h.getBytes
      var j = 0
      while (j < 32) {
        if (j < bytes.length) {
          val b = bytes(j)
          if (b < 0) throw new IllegalArgumentException(
            "simhash_fp32: non-ASCII byte in hash — the kernel's byte " +
              "indexing matches substr only on the md5-hex domain")
          votes(j) += (if ((b & 0xff) >= Eight) 1 else -1)
        } else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    val out = new Array[Byte](32)
    var j = 0
    while (j < 32) {
      out(j) = if (votes(j) > 0) '1'.toByte else '0'.toByte
      j += 1
    }
    UTF8String.fromBytes(out)
  }
}

/** Hamming distance between two `nBits`-character '0'/'1' fingerprint
  * strings: the number of positions 0..nBits−1 where the characters
  * differ, with `substr`'s out-of-range-is-empty semantics (a position
  * past one string's end but not the other's counts as a mismatch;
  * past both ends matches). Returns Int — the interpreted
  * `aggregate(sequence(1, n), 0, ...)` seed type. Inputs are non-null
  * by construction (concatenations of md5-derived halves); on a null
  * input the expression null-propagates like every Catalyst binary
  * expression, which no caller can observe. */
case class HammingBits(left: Expression, right: Expression, nBits: Int)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hamming_bits"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HammingBits.compute(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.HammingBits.compute($a, $b, $nBits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HammingBits =
    copy(left = newLeft, right = newRight)
}

object HammingBits {
  def compute(a: UTF8String, b: UTF8String, nBits: Int): Int = {
    val ab = a.getBytes
    val bb = b.getBytes
    var i = 0
    var diff = 0
    while (i < nBits) {
      val aHas = i < ab.length
      val bHas = i < bb.length
      if (aHas && (ab(i) < 0)) throw new IllegalArgumentException(
        "hamming_bits: non-ASCII byte — the kernel's byte indexing " +
          "matches substr only on ASCII fingerprints")
      if (bHas && (bb(i) < 0)) throw new IllegalArgumentException(
        "hamming_bits: non-ASCII byte — the kernel's byte indexing " +
          "matches substr only on ASCII fingerprints")
      if (aHas != bHas) diff += 1
      else if (aHas && ab(i) != bb(i)) diff += 1
      i += 1
    }
    diff
  }
}
