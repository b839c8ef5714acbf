package org.apache.spark.sql.graftshim

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** One-pass Gram matrix aggregate: Σ x xᵀ over integer-quantized
  * coordinate arrays, as a TypedImperativeAggregate whose buffer is
  * the upper triangle (d·(d+1)/2 longs).
  *
  * Why it exists: the declarative Gram is a coordinate SELF-JOIN on
  * the row id — d² intermediate rows PER INPUT ROW before the (i, j)
  * aggregate (q275's only corpus-sized stage). This aggregate folds
  * each row's outer product into a fixed buffer in place: no join, no
  * d² row blow-up, and the exchange carries one 2080-cell partial per
  * map partition. Sums of the same integers in any order are the same
  * integers, so swapping it under q275 changes NO result bit.
  *
  * Overflow posture: accumulation uses Math.addExact and THROWS on
  * long overflow rather than wrapping — with 2²⁰-quantized inputs
  * (products ≤ 2⁴⁰) that admits ≥ 2²³ rows per group exactly; beyond
  * that, shard the input (corpus partition column) and re-sum the
  * partial Grams in DECIMAL — the additive-census pattern. A silent
  * wrap would poison every eigenvector downstream; the throw is the
  * audit.
  *
  * Output: array<struct<i int, j int, g long>>, upper triangle i ≤ j,
  * ordered by (i, j) — explode and mirror for the full matrix.
  */
case class GramMatrix(
    vec: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(vec)
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(GramMatrix.entryType, containsNull = false)

  // Reject non-ARRAY<BIGINT> inputs at ANALYSIS time: update() reads
  // elements via getLong, so an ARRAY<INT>/ARRAY<DOUBLE> caller (both
  // plausible for quantized vectors) would otherwise read garbage or
  // fail with an obscure runtime error deep in codegen.
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    vec.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"GramMatrix requires ARRAY<BIGINT> input, got ${other.sql}; " +
            "quantize to long (e.g. CAST(floor(x * 2^20) AS BIGINT)) first")
    }

  private val cells = d * (d + 1) / 2

  override def createAggregationBuffer(): Array[Long] = new Array[Long](cells)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val a = vec.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == d,
        s"GramMatrix(d=$d) got a ${arr.numElements()}-element vector")
      val x = new Array[Long](d)
      var i = 0
      while (i < d) { x(i) = arr.getLong(i); i += 1 }
      var k = 0
      i = 0
      while (i < d) {
        var j = i
        while (j < d) {
          buf(k) = Math.addExact(buf(k), Math.multiplyExact(x(i), x(j)))
          k += 1; j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var k = 0
    while (k < cells) { buf(k) = Math.addExact(buf(k), other(k)); k += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[InternalRow](cells)
    var k = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        out(k) = InternalRow(i + 1, j + 1, buf(k))
        k += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(cells * 8)
    var k = 0
    while (k < cells) { bb.putLong(buf(k)); k += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](cells)
    var k = 0
    while (k < cells) { buf(k) = bb.getLong(); k += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): GramMatrix =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): GramMatrix =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): GramMatrix =
    copy(vec = c(0))
}

object GramMatrix {
  val entryType: StructType = StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("g", LongType, nullable = false)))

  def apply(vec: Column, d: Int): Column =
    ColumnBridge.column(GramMatrix(
      ColumnBridge.expression(vec), d).toAggregateExpression())
}
