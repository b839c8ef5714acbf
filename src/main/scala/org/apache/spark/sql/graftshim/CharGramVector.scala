package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashing-trick text featurizer: char 3-grams → signed integer
  * accumulator vector of `dim` buckets. The engine-side text→vector
  * bridge that lets the similarity/ANN tier run end-to-end from raw
  * `documents.text` (the corpus→embedding gap the embeddings table
  * otherwise papers over).
  *
  * Every step is exact integer arithmetic, reproducible in any engine
  * (the t2 oracle rebuilds it in SQL):
  *   g      = cp(i)·961 + cp(i+1)·31 + cp(i+2)      (code points)
  *   h      = (g · 2654435761) mod 2^32             (Knuth multiply-shift)
  *   bucket = h mod dim
  *   sign   = +1 if bit 16 of h is 0 else −1        (feature hashing's
  *                                                   sign trick keeps
  *                                                   E[v·v'] unbiased)
  *   v[bucket] += sign
  *
  * Downstream use needs NO normalization: cosine similarity and
  * hyperplane-LSH signatures are scale-invariant, and on int-valued
  * vectors every dot product is exact in double (|v_i| ≤ #grams, so
  * 64-dim dots stay far under 2^53) — fp never decides a comparison.
  *
  * Code points (not UTF-16 units) are the gram alphabet so the SQL
  * rebuild (`unicode(substring(text, i, 1))`, character-indexed) sees
  * identical grams on non-ASCII text.
  */
case class CharGramVector(child: Expression, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(dim > 0, s"dim must be positive, got $dim")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      CharGramVector.accumulate(input.asInstanceOf[UTF8String], dim))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val obj = CharGramVector.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $obj.accumulate($s, $dim));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharGramVector =
    copy(child = newChild)
}

object CharGramVector {

  /** One pass over the code points; the hot loop the codegen calls. */
  def accumulate(s: UTF8String, dim: Int): Array[Long] = {
    val v = new Array[Long](dim)
    val str = s.toString
    // extract code points once: 3-gram windows index into this array
    val n = str.codePointCount(0, str.length)
    if (n >= 3) {
      val cps = new Array[Int](n)
      var ci = 0
      var off = 0
      while (ci < n) {
        val cp = str.codePointAt(off)
        cps(ci) = cp
        off += Character.charCount(cp)
        ci += 1
      }
      var i = 0
      while (i + 2 < n) {
        val g = cps(i).toLong * 961L + cps(i + 1).toLong * 31L + cps(i + 2).toLong
        val h = (g * 2654435761L) & 0xffffffffL
        val b = (h % dim).toInt
        if (((h >>> 16) & 1L) == 0L) v(b) += 1L else v(b) -= 1L
        i += 1
      }
    }
    v
  }

  def apply(text: Column, dim: Int): Column =
    ColumnBridge.column(CharGramVector(ColumnBridge.expression(text), dim))
}
