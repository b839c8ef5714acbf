package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word shingles of an ARRAY<STRING> token column in one
  * pass — the set relation Jaccard verification joins against.
  * Element-for-element identical to the composed
  * `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(toks, i, width))))` (first-occurrence order, null tokens
  * skipped inside a window, tail windows shortened, `<= width` tokens
  * collapse to one shingle), without materializing the index sequence
  * or the pre-distinct shingle array.
  */
case class ShingleSet(child: Expression, width: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(width > 0)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleSet.distinctShingles(input.asInstanceOf[ArrayData], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ShingleSet.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $obj.distinctShingles($c, $width);")
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

object ShingleSet {

  def distinctShingles(toks: ArrayData, width: Int): ArrayData = {
    val n = toks.numElements()
    val nShingles = math.max(n - (width - 1), 1)
    val seen = new java.util.LinkedHashSet[UTF8String](nShingles * 2)
    val sb = new java.lang.StringBuilder(64)
    var s = 0
    while (s < nShingles) {
      sb.setLength(0)
      var appended = false
      var k = s
      val end = math.min(s + width, n)
      while (k < end) {
        if (!toks.isNullAt(k)) {
          if (appended) sb.append(' ')
          sb.append(toks.getUTF8String(k).toString)
          appended = true
        }
        k += 1
      }
      seen.add(UTF8String.fromString(sb.toString))
      s += 1
    }
    new GenericArrayData(seen.toArray)
  }

  def apply(c: Column, width: Int): Column =
    ColumnBridge.column(ShingleSet(ColumnBridge.expression(c), width))
}
