package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.BinaryType

/** Column bridge to Spark's OWN bloom-filter machinery — the
  * `BloomFilterAggregate` / `BloomFilterMightContain` expression pair
  * that powers AQE runtime join filters (InjectRuntimeFilter,
  * spark-catalyst `bloomFilterExpressions.scala`). Spark keeps them
  * catalyst-internal (they are planner tools, not registry
  * functions); graft exposes them for explicit scan-side semi-join
  * pruning, where the build side is small by construction (a
  * benchmark set) and the probe side is the 100 TB corpus.
  *
  * Inputs are XXH64 hashes (LongType), matching the aggregate's
  * native input contract; the serialized sketch rides as a plain
  * binary Literal, so the probe is a pure per-row scan expression —
  * no join, no shuffle, no broadcast machinery.
  */
object BloomSketch {

  /** Aggregate a LongType hash column into a serialized bloom filter
    * (one binary row). */
  def agg(hash: Column, estimatedItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(hash),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** Probe a serialized filter: true if `hash` might be a member
    * (no false negatives; false positives at the sized FPR). */
  def mightContain(bloom: Array[Byte], hash: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), ColumnBridge.expression(hash)))
}
