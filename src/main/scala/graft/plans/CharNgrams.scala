package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Character n-grams of a text in one compiled pass — semantically
  * identical to `transform(sequence(1, length(text)-n+1), i ->
  * substring(text, i, n))` (and, with `distinct`, to `array_distinct` of
  * that: first-occurrence order), but inside whole-stage codegen instead
  * of the interpreted higher-order machinery. Texts shorter than n yield
  * an empty array. The q25 language-ID profile build walks ~every
  * character of the corpus — per-row interpreted lambdas are its whole
  * cost at scale. */
case class CharNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    CharNgrams.compute(input.asInstanceOf[UTF8String].toString, n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.CharNgrams.compute($c.toString(), $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

object CharNgrams {
  def compute(text: String, n: Int, distinct: Boolean): ArrayData = {
    // Boundaries by CODE POINT, not UTF-16 unit — Spark's substring/length
    // and the DuckDB oracle both count code points, so a UTF-16 walk would
    // split surrogate pairs on non-BMP text (emoji, rare CJK).
    val len = text.length
    val bounds = new Array[Int](text.codePointCount(0, len) + 1)
    var i = 0
    var cps = 0
    while (i < len) { bounds(cps) = i; i += Character.charCount(text.codePointAt(i)); cps += 1 }
    bounds(cps) = len
    val last = cps - n
    if (last < 0) return new GenericArrayData(Array.empty[Any])
    if (distinct) {
      val seen = mutable.LinkedHashSet.empty[String]
      var j = 0
      while (j <= last) { seen += text.substring(bounds(j), bounds(j + n)); j += 1 }
      new GenericArrayData(seen.iterator.map(s => UTF8String.fromString(s)).toArray[Any])
    } else {
      val out = new Array[Any](last + 1)
      var j = 0
      while (j <= last) {
        out(j) = UTF8String.fromString(text.substring(bounds(j), bounds(j + n)))
        j += 1
      }
      new GenericArrayData(out)
    }
  }
}
