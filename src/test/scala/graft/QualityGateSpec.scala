package graft

import graft.operators.QualityGate
import org.apache.spark.sql.functions._

/** q129: the learned quality gate — fit determinism, provenance of the
  * exported fixed weights, exactness grid, and gate separation. */
class QualityGateSpec extends SparkSpecBase {

  private val sf01 = "/root/testdata/sf0.01"

  test("fit is deterministic and the exported constants are its quantization") {
    val (c1, b1) = QualityGate.fit(spark, sf01)
    val (c2, b2) = QualityGate.fit(spark, sf01)
    assert(c1 === c2 && b1 === b2, "two fits must produce identical coefficients")
    assert(c1.map(QualityGate.quantize) === QualityGate.weights,
      "exported weights must be the quantized fit on sf0.01")
    assert(QualityGate.quantize(b1) === QualityGate.bias)
  }

  test("logit is on the 2^-20 grid (exact in any summation order)") {
    val rows = SparkEntry.queries("q129_quality_gate_score")(spark, sf001)
      .limit(200).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val logit = r.getDouble(1)
      val scaled = logit * (1L << 20)
      assert(scaled == math.rint(scaled),
        s"logit $logit is off the exactness grid")
    }
  }

  test("gate separates the reference slice at the exported operating point") {
    val docs = graft.sources.Tables.documents(spark, sf01)
      .select(col("doc_id"), (col("source") === "src0").as("is_ref"))
    val scored = SparkEntry.queries("q129_quality_gate_score")(spark, sf01)
      .join(docs, "doc_id")
    val rates = scored.groupBy("is_ref")
      .agg(avg(col("keep").cast("double")).as("keep_rate"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(rates(true) >= 0.8, s"reference keep rate too low: ${rates(true)}")
    assert(rates(false) <= 0.3, s"non-reference keep rate too high: ${rates(false)}")
  }
}
