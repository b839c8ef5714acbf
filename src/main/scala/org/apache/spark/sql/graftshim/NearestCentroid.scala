package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Max-cosine centroid assignment as ONE expression over the vector
  * column: the centroid matrix (bounded — cell count, the documented
  * driver-side exception) rides into codegen via a reference object,
  * and each vector is scored against every centroid in a single fused
  * loop. No N × C join, so no 25M-row materialization of both float
  * arrays through a BroadcastNestedLoopJoin — at 100k × 256 the
  * join+aggregate formulation was memory-bandwidth/GC-bound with
  * minute-scale variance; this is a flops-bound scan stage.
  *
  * Scoring is bit-compatible with [[CosineSimilarity]]: per-centroid
  * cos = dot / √|v|² / √|c|², each accumulated left-to-right (centroid
  * norms precomputed the same way). Ties pick the lowest cell id —
  * centroids are scored in ascending id order and only a strictly
  * greater cos displaces the best.
  */
case class NearestCentroid(child: Expression, cellIds: Seq[Long],
    centroids: Seq[Seq[Float]], metric: String = "cos")
    extends UnaryExpression with ExpectsInputTypes {
  require(cellIds.nonEmpty && cellIds.size == centroids.size)
  require(cellIds == cellIds.sorted, "centroids must arrive in ascending cell order")
  require(metric == "cos" || metric == "l2", s"unknown metric $metric")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType

  @transient private lazy val ids: Array[Long] = cellIds.toArray
  @transient private lazy val matrix: Array[Array[Float]] =
    centroids.map(_.toArray).toArray
  @transient private lazy val norms: Array[Double] =
    matrix.map(NearestCentroid.sqNorm)

  override def nullSafeEval(input: Any): Any =
    if (metric == "l2")
      NearestCentroid.bestL2(input.asInstanceOf[ArrayData], ids, matrix)
    else
      NearestCentroid.best(input.asInstanceOf[ArrayData], ids, matrix, norms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = NearestCentroid.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val idsRef = ctx.addReferenceObj("ids", ids, "long[]")
    val matRef = ctx.addReferenceObj("matrix", matrix, "float[][]")
    nullSafeCodeGen(ctx, ev, c =>
      if (metric == "l2")
        s"${ev.value} = $obj.bestL2($c, $idsRef, $matRef);"
      else {
        val normRef = ctx.addReferenceObj("norms", norms, "double[]")
        s"${ev.value} = $obj.best($c, $idsRef, $matRef, $normRef);"
      })
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

object NearestCentroid {

  private[graftshim] def sqNorm(c: Array[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < c.length) { val x = c(i).toDouble; s += x * x; i += 1 }
    s
  }

  def best(v: ArrayData, ids: Array[Long], matrix: Array[Array[Float]],
      norms: Array[Double]): Long = {
    val n = v.numElements()
    // vector norm once, same accumulation as the fused cosine's |a|²
    var nv = 0.0
    var i = 0
    while (i < n) { val x = v.getFloat(i).toDouble; nv += x * x; i += 1 }
    val snv = math.sqrt(nv)
    var bestId = ids(0)
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < matrix.length) {
      val cent = matrix(c)
      val cos = if (cent.length == n) {
        var dot = 0.0
        i = 0
        while (i < n) { dot += v.getFloat(i).toDouble * cent(i).toDouble; i += 1 }
        dot / snv / math.sqrt(norms(c))
      } else {
        // dim mismatch: CosineSimilarity truncates ALL THREE
        // accumulators to the common prefix — replicate exactly rather
        // than mixing a truncated dot with full-length norms
        val dim = math.min(n, cent.length)
        var dot = 0.0; var na = 0.0; var nb = 0.0
        i = 0
        while (i < dim) {
          val x = v.getFloat(i).toDouble
          val y = cent(i).toDouble
          dot += x * y; na += x * x; nb += y * y
          i += 1
        }
        dot / math.sqrt(na) / math.sqrt(nb)
      }
      // Spark's ordering places NaN above every value (the window/join
      // baseline's max-by does too), so a NaN cos — zero-norm vector or
      // centroid — must displace any finite best, a finite cos must
      // never displace a NaN best, and NaN-vs-NaN is a tie (lowest id
      // wins by arrival order).
      val displaces =
        if (java.lang.Double.isNaN(cos)) !java.lang.Double.isNaN(bestCos)
        else !java.lang.Double.isNaN(bestCos) && cos > bestCos
      if (c == 0 || displaces) { bestCos = cos; bestId = ids(c) }
      c += 1
    }
    bestId
  }

  /** Min-L2 assignment — the metric a PQ/L2-served index uses end to
    * end (routing a metric's search through another metric's cells
    * costs real recall: measured 0.77 vs 0.93 at 100k vectors, q127
    * bench block). Distance accumulates (x−y)² left-to-right —
    * deterministic at any parallelism; dim mismatch truncates to the
    * common prefix like the cosine form. Min-by semantics mirror
    * Spark's ordering with NaN greatest: a NaN distance (NaN
    * coordinate) never displaces a finite best, and an all-NaN row
    * keeps the lowest id. */
  def bestL2(v: ArrayData, ids: Array[Long], matrix: Array[Array[Float]]): Long = {
    val n = v.numElements()
    var bestId = ids(0)
    var bestD = Double.NaN
    var c = 0
    while (c < matrix.length) {
      val cent = matrix(c)
      val dim = math.min(n, cent.length)
      var d = 0.0
      var i = 0
      while (i < dim) {
        val t = v.getFloat(i).toDouble - cent(i).toDouble
        d += t * t
        i += 1
      }
      val displaces =
        !java.lang.Double.isNaN(d) && (java.lang.Double.isNaN(bestD) || d < bestD)
      if (c == 0 || displaces) { bestD = d; bestId = ids(c) }
      c += 1
    }
    bestId
  }

  // no default here: the case-class apply already defaults `metric`,
  // and Scala forbids defaults on two overloads of the same name
  def apply(v: Column, cents: Seq[(Long, Array[Float])],
      metric: String): Column = {
    val sorted = cents.sortBy(_._1)
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(v),
      sorted.map(_._1), sorted.map(_._2.toIndexedSeq), metric))
  }
}
