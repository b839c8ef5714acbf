package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PRIORITY SAMPLING (Duffield, Lund, Thorup — JACM'07): a weighted
  * sample WITHOUT replacement of k documents with an unbiased
  * Horvitz–Thompson total-weight estimator — the principled way to
  * subsample a corpus proportionally to size/importance while still
  * being able to ESTIMATE any weight total from the sample alone
  * (E[Σ max(wᵢ, τ)] over the sample = Σ wᵢ exactly, for any k).
  * The q61/q150 hash gates sample Bernoulli-style (random SIZE, no
  * estimator); this is the fixed-size, estimator-carrying tier.
  *
  * Determinism discipline: the "randomness" uᵢ is the q137-convention
  * md5 gate — a 32-bit integer from the first 8 hex chars of
  * md5('psamp:'||doc_id) — and the priority is the exact integer
  * qᵢ = (wᵢ·2³²) div (Uᵢ+1) (≈ wᵢ/uᵢ on the 2⁻³² grid; w ≤ 2²⁰ keeps
  * the product < 2⁵², no overflow, no doubles). Ties break on doc_id.
  * Both engines compute bit-identical priorities, so the sample, the
  * threshold τ (the (k+1)-th priority), and every estimator value are
  * reproducible run-to-run and engine-to-engine.
  *
  * Scale (100 TB): the only corpus-wide operation is top-(k+1) by an
  * integer scan-side key — `TakeOrderedAndProject`, map-side k+1
  * heaps, no global sort, no shuffle beyond k+1 rows per partition.
  * The rank/τ bookkeeping then runs on the k+1-row relation (driver-
  * bounded by construction). The priority qᵢ = wᵢ/uᵢ is computed on
  * the integer grid but lands in NATURAL weight units (uᵢ ≤ 1), so
  * the HT estimate ŵᵢ = max(wᵢ, τ) needs no unit conversion and every
  * output stays BIGINT — no decimal→double cast anywhere
  * (verify-skill rule).
  */
object PrioritySample {

  val k = 20
  val grid = 4294967296L // 2^32

  /** q217: the k-document priority sample with per-row HT estimates.
    * est_w = max(w, τ) — summing it over the sample estimates the
    * corpus' total n_chars (KmvPrioritySpec checks it lands near the
    * true total on the fixed corpus). */
  val qPrioritySample: GraftQuery = GraftQuery(
    "q217_priority_sample",
    s"""WITH pri AS (
       |  SELECT doc_id, n_chars AS w,
       |    (n_chars * $grid)
       |      // (CAST('0x' || substring(md5('psamp:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 1)
       |      AS priority
       |  FROM documents),
       |ranked AS (
       |  SELECT doc_id, w, priority,
       |    ROW_NUMBER() OVER (ORDER BY priority DESC, doc_id) AS rn
       |  FROM pri),
       |tau AS (
       |  SELECT MAX(CASE WHEN rn = ${k + 1} THEN priority END) AS tau
       |  FROM ranked WHERE rn <= ${k + 1})
       |SELECT r.doc_id, CAST(r.w AS BIGINT) AS w,
       |  CAST(r.priority AS BIGINT) AS priority,
       |  CAST(r.rn AS INTEGER) AS sample_rank,
       |  CAST(t.tau AS BIGINT) AS tau,
       |  CAST(greatest(r.w, t.tau) AS BIGINT) AS est_w
       |FROM ranked r CROSS JOIN tau t
       |WHERE r.rn <= $k
       |ORDER BY r.rn""".stripMargin) { (s, d) =>
    sample(Tables.documents(s, d), col("n_chars"), k)
  }

  /** Priority sample of `docs` by integer weight `w` (w ≥ 1 expected;
    * w·2³² must fit a long — callers with unbounded weights clamp
    * first). Returns one row per sampled doc, best-priority first. */
  def sample(docs: DataFrame, w: org.apache.spark.sql.Column, kk: Int): DataFrame = {
    val u1 = conv(substring(md5(
      concat(lit("psamp:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
      .cast("long") + 1
    val pri = docs
      .select(col("doc_id"), w.cast("long").as("w"), u1.as("u1"))
      .withColumn("priority", expr(s"(w * $grid) div u1"))
      .select("doc_id", "w", "priority")
    // top-(k+1) is TakeOrderedAndProject — the ONLY corpus-wide step
    val top = pri.orderBy(desc("priority"), asc("doc_id")).limit(kk + 1)
    // everything below runs on the bounded (k+1)-row relation; the
    // partitionless window is deliberate and bounded
    val ranked = top.withColumn("rn",
      row_number().over(Window.orderBy(desc("priority"), asc("doc_id"))))
    val tau = ranked.agg(
      max(when(col("rn") === kk + 1, col("priority"))).as("tau"))
    ranked.where(col("rn") <= kk)
      .crossJoin(broadcast(tau))
      .select(col("doc_id"), col("w"), col("priority"),
        col("rn").cast("int").as("sample_rank"), col("tau"),
        greatest(col("w"), col("tau")).as("est_w"))
      .orderBy("sample_rank")
  }

  def all: Seq[GraftQuery] = Seq(qPrioritySample)
}
