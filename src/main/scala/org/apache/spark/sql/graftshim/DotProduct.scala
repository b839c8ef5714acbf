package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused dot product over two ARRAY<FLOAT> columns — the building
  * block for cosine with PRECOMPUTED norms: [[CosineSimilarity]]
  * accumulates dot/|a|²/|b|² per pair, so an N × C scoring stage (IVF
  * assignment) recomputes each side's norm C (resp. N) times. With
  * per-row norms stored once (`DotProduct(v, v)` — the same
  * left-to-right accumulation as the fused cosine's norm term),
  * `dot / sqrt(na) / sqrt(nb)` is bit-for-bit the fused cosine at a
  * third of the per-pair flops.
  *
  * SQL-surface semantics (documented in the registered ExpressionInfo):
  * a dimension mismatch truncates both arrays to the common prefix —
  * intentionally identical to [[CosineSimilarity]] so precomputed-norm
  * rewrites stay bit-compatible — and NULL elements read as 0.0.
  * Callers needing strict dimensional checks must validate
  * `size(a) = size(b)` upstream.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
