package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Asymmetric-distance computation (ADC) as ONE fused expression:
  * given a PQ code array (left) and a query vector (right), the
  * squared L2 distance between the query and the CODEBOOK
  * RECONSTRUCTION of the codes — the inner loop of IVF-PQ serving.
  *
  * The composed form this replaces (per-subspace codebook-literal
  * `element_at` → `concat` reconstruction → `zip_with`/`aggregate`
  * lambda over 64 dims) allocates a reconstruction array per row and
  * evaluates interpreted higher-order functions; at 100k codes × 32
  * probed cells it dominated the q127 bench search stage. Here the
  * codebook rides into codegen as a reference object and each row is
  * one tight 64-mult loop — no allocation, no lambdas.
  *
  * Accumulation is j-within-s, s ascending, one add per dim —
  * EXACTLY the element order (and thus the exact double result, since
  * addition order matches) of the zip_with/aggregate form it
  * replaces; PqAnnSpec pins bit-parity against that composed form.
  * NULL if either side is null, the code array is short, any needed
  * element is null, or a code is outside the codebook (the composed
  * form would throw under ANSI `element_at`; this is index-validated
  * data, so NULL-not-crash is a guard, not a code path). A query
  * shorter than subspaces×subDim also yields NULL.
  */
case class PqAdcDist(left: Expression, right: Expression,
    codebook: Seq[Seq[Seq[Double]]])
    extends BinaryExpression with ExpectsInputTypes {
  require(codebook.nonEmpty && codebook.forall(_.nonEmpty))
  require(codebook.flatten.map(_.length).distinct.size == 1,
    "all centroids must share one sub-dimension")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @transient private lazy val matrix: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray

  override def nullSafeEval(codes: Any, query: Any): Any =
    PqAdcDist.dist(codes.asInstanceOf[ArrayData],
      query.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = PqAdcDist.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val ref = ctx.addReferenceObj("codebook", matrix, "double[][][]")
    val r = ctx.freshName("adcDist")
    nullSafeCodeGen(ctx, ev, (c, q) => s"""
      java.lang.Double $r = $obj.dist($c, $q, $ref);
      if ($r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = $r.doubleValue(); }""")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcDist = copy(left = newLeft, right = newRight)
}

object PqAdcDist {

  /** Boxed so codegen/eval share one null convention. */
  def dist(codes: ArrayData, query: ArrayData,
      codebook: Array[Array[Array[Double]]]): java.lang.Double = {
    val subspaces = codebook.length
    val subDim = codebook(0)(0).length
    if (codes.numElements() < subspaces) return null
    if (query.numElements() < subspaces * subDim) return null
    var acc = 0.0
    var s = 0
    while (s < subspaces) {
      if (codes.isNullAt(s)) return null
      val c = codes.getInt(s)
      if (c < 0 || c >= codebook(s).length) return null
      val cent = codebook(s)(c)
      var j = 0
      while (j < subDim) {
        val qi = s * subDim + j
        if (query.isNullAt(qi)) return null
        val t = query.getFloat(qi).toDouble - cent(j)
        acc += t * t
        j += 1
      }
      s += 1
    }
    acc
  }

  def apply(codes: Column, query: Column,
      codebook: Seq[Seq[Seq[Double]]]): Column =
    ColumnBridge.column(PqAdcDist(ColumnBridge.expression(codes),
      ColumnBridge.expression(query), codebook))
}
