package org.apache.spark.sql.graftshim

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k (score, id) pairs with the
  * highest score per group (ties broken toward the smaller id), as a
  * TypedImperativeAggregate with a fixed-size min-heap buffer.
  *
  * Why it exists: Spark's idiomatic per-key top-k is
  * row_number().over(Window.partitionBy(key).orderBy(score)) — which
  * must SHUFFLE EVERY SCORED ROW to the key's reducer before any can
  * be discarded (WindowGroupLimit prunes to k per map partition, but
  * only after sorting each partition). This aggregate keeps a k-sized
  * heap per key per partition, so the exchange carries at most
  * k × keys × partitions tiny rows and nothing is ever sorted beyond
  * the heap — the right shape for ANN scoring where the corpus side is
  * the whole dataset. Selection and ordering are identical to the
  * window form (same (score desc, id asc) total order).
  *
  * Output: array<struct<score double, id bigint>> ordered best-first.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(TopKByScore.entryType, containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    other.foreach((s, i) => buf.insert(s, i))
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.sortedBestFirst
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer = TopKBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKByScore =
    copy(score = c(0), id = c(1))
}

object TopKByScore {
  val entryType: StructType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))

  def apply(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(TopKByScore(
      ColumnBridge.expression(score), ColumnBridge.expression(id), k)
      .toAggregateExpression())
}

/** Fixed-capacity min-heap over (score, id); the root is the WORST
  * kept entry under the (score desc, id asc) ranking, so insert is
  * O(log k) and rejected candidates cost one comparison. */
final class TopKBuffer(val k: Int) {
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var n = 0

  /** true if a ranks WORSE than b (a = (sa, ia)). */
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  def insert(s: Double, i: Long): Unit = {
    if (n < k) {
      scores(n) = s; ids(n) = i; n += 1
      siftUp(n - 1)
    } else if (k > 0 && worse(scores(0), ids(0), s, i)) {
      scores(0) = s; ids(0) = i
      siftDown(0)
    }
  }

  private def siftUp(start: Int): Unit = {
    var c = start
    while (c > 0) {
      val p = (c - 1) / 2
      if (worse(scores(c), ids(c), scores(p), ids(p))) { swap(c, p); c = p }
      else return
    }
  }

  private def siftDown(start: Int): Unit = {
    var p = start
    while (true) {
      val l = 2 * p + 1; val r = l + 1
      var m = p
      if (l < n && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < n && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == p) return
      swap(p, m); p = m
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  def foreach(f: (Double, Long) => Unit): Unit = {
    var i = 0
    while (i < n) { f(scores(i), ids(i)); i += 1 }
  }

  def sortedBestFirst: Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](n)
    var i = 0
    while (i < n) { out(i) = (scores(i), ids(i)); i += 1 }
    out.sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + n * 16)
    bb.putInt(k).putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(scores(i)).putLong(ids(i)); i += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def fromBytes(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.insert(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }
}
