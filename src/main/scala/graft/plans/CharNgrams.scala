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
    val last = text.length - n
    if (last < 0) return new GenericArrayData(Array.empty[Any])
    if (distinct) {
      val seen = mutable.LinkedHashSet.empty[String]
      var i = 0
      while (i <= last) { seen += text.substring(i, i + n); i += 1 }
      new GenericArrayData(seen.iterator.map(s => UTF8String.fromString(s)).toArray[Any])
    } else {
      val out = new Array[Any](last + 1)
      var i = 0
      while (i <= last) { out(i) = UTF8String.fromString(text.substring(i, i + n)); i += 1 }
      new GenericArrayData(out)
    }
  }
}
