package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a text in one compiled pass — semantically
  * identical to `transform(sequence(1, size(toks)-n+1), i ->
  * concat_ws(' ', toks[i], ..., toks[i+n-1]))` over `split(text, " ")`
  * (single-space split, trailing empties kept), wrapped in
  * `array_distinct` (first-occurrence order) when `distinct` is set —
  * but without the interpreted higher-order machinery. Texts with fewer
  * than n tokens yield an empty array (callers filter them out, as the
  * HOF spelling's sequence() bound would be degenerate). The
  * non-distinct mode feeds occurrence-counting operators (q39's
  * repetition filters need every gram, not the set).
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String].toString, n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.WordShingles.compute($c.toString(), $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def compute(text: String, n: Int, distinct: Boolean): ArrayData = {
    val toks = text.split(" ", -1) // keep empties, like Spark/DuckDB split
    val out =
      if (distinct) mutable.LinkedHashSet.empty[String]
      else mutable.ArrayBuffer.empty[String]
    var i = 0
    val last = toks.length - n
    while (i <= last) {
      val sb = new StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      out += sb.toString
      i += 1
    }
    new GenericArrayData(out.iterator.map(s => UTF8String.fromString(s)).toArray[Any])
  }

  /** Binary-compatibility spelling for existing generated code sites. */
  def compute(text: String, n: Int): ArrayData = compute(text, n, distinct = true)
}
