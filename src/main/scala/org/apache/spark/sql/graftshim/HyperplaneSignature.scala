package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused random-hyperplane LSH signature over an ARRAY<FLOAT> column:
  * one pass over the vector accumulates all `planes.length` signed
  * projections simultaneously and emits the '0'/'1' bucket string.
  *
  * The composed form (per plane: `aggregate(zip_with(v, plane, _*_),
  * 0.0, _+_)`) walks the vector once PER PLANE and `zip_with`
  * allocates an intermediate array each time — 8 traversals + 8
  * allocations per row. This expression is bit-compatible with it:
  * accumulation is left-to-right double addition of ±x_i (x*±1.0 is
  * exact), and the composed form's null semantics are preserved — any
  * null element, or a vector whose length differs from the plane
  * width (zip_with pads the shorter side with nulls), nulls every
  * projection, which renders as all-'0'.
  */
case class HyperplaneSignature(child: Expression, planes: Seq[Seq[Int]])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = StringType

  @transient private lazy val matrix: Array[Array[Int]] =
    planes.map(_.toArray).toArray

  override def nullSafeEval(input: Any): Any =
    HyperplaneSignature.sign(input.asInstanceOf[ArrayData], matrix)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = HyperplaneSignature.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val ref = ctx.addReferenceObj("planes", matrix, "int[][]")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $obj.sign($c, $ref);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSignature =
    copy(child = newChild)
}

object HyperplaneSignature {

  def sign(v: ArrayData, planes: Array[Array[Int]]): UTF8String = {
    val p = planes.length
    val dim = if (p > 0) planes(0).length else 0
    val out = new Array[Byte](p)
    var degenerate = v.numElements() != dim
    if (!degenerate) {
      var i = 0
      val n = v.numElements()
      while (i < n && !degenerate) {
        if (v.isNullAt(i)) degenerate = true
        i += 1
      }
    }
    if (degenerate) {
      java.util.Arrays.fill(out, '0'.toByte)
    } else {
      val acc = new Array[Double](p)
      var i = 0
      while (i < dim) {
        val x = v.getFloat(i).toDouble
        var j = 0
        while (j < p) {
          if (planes(j)(i) > 0) acc(j) += x else acc(j) -= x
          j += 1
        }
        i += 1
      }
      var j = 0
      while (j < p) {
        // Spark SQL comparisons treat NaN as larger than any value, so
        // the composed `planeDot >= 0` yields '1' for NaN — match it
        // (Java's primitive >= would say false)
        out(j) = if (acc(j) >= 0 || java.lang.Double.isNaN(acc(j)))
          '1'.toByte else '0'.toByte
        j += 1
      }
    }
    UTF8String.fromBytes(out)
  }

  def apply(c: Column, planes: Array[Array[Int]]): Column =
    ColumnBridge.column(HyperplaneSignature(
      ColumnBridge.expression(c), planes.toIndexedSeq.map(_.toIndexedSeq)))
}
