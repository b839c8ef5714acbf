package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** PER-GROUP priority sampling: q217's Duffield-Lund-Thorup scheme
  * applied independently WITHIN every source — the stratified form a
  * pipeline uses to build a per-domain inspection sample or a
  * size-capped per-source eval slice, with the SAME deterministic
  * priorities (so the global and per-source samples are consistent:
  * a doc's priority does not depend on its stratum).
  *
  * The scale shape is the interesting part: q217's global top-k is
  * `TakeOrderedAndProject`; the per-group top-k is a bounded
  * [[org.apache.spark.sql.graftshim.TopKByScore]] heap aggregate —
  * k-sized heaps per source per partition, map-side partials, no
  * window sort of any source's documents (the q199/q161 discipline).
  * Priorities (< 2⁴⁶) sit exactly on the double grid (< 2⁵³), so
  * using the heap's double score loses nothing: the kept set equals
  * the integer ordering's top-k, ties to the smaller doc_id — the
  * TopKByScore contract.
  *
  * Outputs per (source, rank): doc_id, weight, priority, plus the
  * per-source HT threshold τ (the (k+1)-th priority, NULL when the
  * source has ≤ k docs — every doc sampled, estimator exact).
  */
object GroupSample {

  val k = 3
  val grid = PrioritySample.grid

  val qGroupSample: GraftQuery = GraftQuery(
    "q228_group_priority_sample",
    s"""WITH pri AS (
       |  SELECT doc_id, source, n_chars AS w,
       |    (n_chars * $grid)
       |      // (CAST('0x' || substring(md5('psamp:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 1)
       |      AS priority
       |  FROM documents),
       |ranked AS (
       |  SELECT source, doc_id, w, priority,
       |    ROW_NUMBER() OVER (PARTITION BY source
       |      ORDER BY priority DESC, doc_id) AS rn
       |  FROM pri),
       |tau AS (
       |  SELECT source,
       |    MAX(CASE WHEN rn = ${k + 1} THEN priority END) AS tau
       |  FROM ranked WHERE rn <= ${k + 1}
       |  GROUP BY source)
       |SELECT r.source, CAST(r.rn AS INTEGER) AS sample_rank, r.doc_id,
       |  CAST(r.w AS BIGINT) AS w, CAST(r.priority AS BIGINT) AS priority,
       |  CAST(t.tau AS BIGINT) AS tau,
       |  CAST(greatest(r.w, t.tau) AS BIGINT) AS est_w
       |FROM ranked r JOIN tau t USING (source)
       |WHERE r.rn <= $k
       |ORDER BY r.source, r.rn""".stripMargin) { (s, d) =>
    val u1 = conv(substring(md5(
      concat(lit("psamp:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
      .cast("long") + 1
    val pri = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("w"),
        u1.as("u1"))
      .withColumn("priority", expr(s"(w * $grid) div u1"))
    // bounded per-source (k+1)-heaps, map-side partials — no window
    // over any source's full document set
    val tops = pri.groupBy("source")
      .agg(org.apache.spark.sql.graftshim.TopKByScore(
        col("priority").cast("double"), col("doc_id"), k + 1).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("i0", "e")))
      .select(col("source"), (col("i0") + 1).as("sample_rank"),
        col("e.id").as("doc_id"))
      .join(pri.select(col("doc_id"), col("w"), col("priority")), "doc_id")
    val tau = tops.where(col("sample_rank") === k + 1)
      .select(col("source"), col("priority").as("tau"))
    tops.where(col("sample_rank") <= k)
      .join(tau, Seq("source"), "left")
      .select(col("source"), col("sample_rank").cast("int").as("sample_rank"),
        col("doc_id"), col("w"), col("priority"), col("tau"),
        greatest(col("w"), col("tau")).as("est_w"))
      .orderBy("source", "sample_rank")
  }

  def all: Seq[GraftQuery] = Seq(qGroupSample)
}
