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
    * (one binary row).
    *
    * FAIL-LOUD GUARD: BloomFilterAggregate silently clamps numBits to
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` (default
    * 2^26 = 67,108,864 — verified in the 4.1.2 bytecode: numBits =
    * Math.min(requested, conf)). A silent clamp is the worst failure
    * mode for a prefilter: results stay correct (no false negatives)
    * while the FPR quietly approaches 1 and the pruning evaporates.
    * Sizing a bigger sketch therefore REQUIRES raising that conf, and
    * this wrapper refuses to build a sketch it knows would be
    * truncated. */
  def agg(hash: Column, estimatedItems: Long, numBits: Long): Column = {
    val maxBits: Long = org.apache.spark.sql.internal.SQLConf.get
      .getConf(org.apache.spark.sql.internal.SQLConf.RUNTIME_BLOOM_FILTER_MAX_NUM_BITS)
      .asInstanceOf[Long]
    require(numBits <= maxBits,
      s"numBits=$numBits exceeds spark.sql.optimizer.runtime.bloomFilter.maxNumBits=" +
        s"$maxBits; Spark would SILENTLY clamp the sketch (FPR blows up while " +
        "results stay correct). Raise the conf to size a bigger filter.")
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(hash),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())
  }

  /** Probe a serialized filter: true if `hash` might be a member
    * (no false negatives; false positives at the sized FPR). */
  def mightContain(bloom: Array[Byte], hash: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      new ElidedBinaryLiteral(bloom), ColumnBridge.expression(hash)))
}

/** A binary [[Literal]] that renders as a size tag instead of the full
  * hex dump. A 512 KB sketch literal otherwise stringifies to ~1 MB of
  * hex PER OCCURRENCE every time the plan is rendered (explain, SQL
  * listener, event log) — the 2–4 MB `maxPlanStringLength` truncation
  * WARNs the r12 verdict flagged came from exactly this. Semantics are
  * Literal's own (same value, same type, same eval/codegen);
  * ConstantFolding leaves Literals in place, so the elision survives
  * optimization. A rule that rebuilds the node via `Literal(...)`
  * merely restores the verbose rendering — never wrong results. */
private[graftshim] class ElidedBinaryLiteral(bytes: Array[Byte])
  extends Literal(bytes, BinaryType) {
  override def toString: String = s"binary_literal(${bytes.length} bytes elided)"
  override def sql: String = toString
}
