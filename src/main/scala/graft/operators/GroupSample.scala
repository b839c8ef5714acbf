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

  /** LARGEST-REMAINDER STRATIFIED SAMPLE: exactly K=100 documents,
    * strata (languages) allocated proportionally by the
    * Hamilton/largest-remainder method — base_i = ⌊K·n_i/N⌋ and the
    * K − Σbase leftover seats go to the largest remainders
    * (rem desc, lang tie-break). The allocation is pure integer
    * arithmetic over the |langs|-row census, so the TOTAL is exactly
    * K by construction (contrast q157's probabilistic cap, which is
    * exact only in expectation). Within a stratum the sample is the
    * alloc_i smallest keyed md5 values — deterministic, reproducible,
    * and independent of the allocation step.
    *
    * Scale (100 TB): per-stratum selection is a bounded TopKByScore
    * heap (K-sized per partition, map-side partials — no window sort
    * of any stratum's documents; hash values < 2³² sit exactly on the
    * double grid so the heap's double score loses nothing); the
    * allocation windows run over the |langs|-row census only. */
  val sampleK = 100

  val qStratifiedSample: GraftQuery = GraftQuery(
    "q263_stratified_sample",
    s"""WITH h AS (
       |  SELECT doc_id, lang,
       |    CAST('0x' || substring(md5('lrs:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS hv
       |  FROM documents),
       |strata AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_lang FROM h GROUP BY lang),
       |quota AS (
       |  SELECT lang, n_lang,
       |    ($sampleK * n_lang) // (SUM(n_lang) OVER ()) AS base,
       |    ($sampleK * n_lang) % (SUM(n_lang) OVER ()) AS rem
       |  FROM strata),
       |alloc AS (
       |  SELECT lang, n_lang,
       |    CAST(base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, lang)
       |      <= $sampleK - SUM(base) OVER () THEN 1 ELSE 0 END AS BIGINT) AS alloc
       |  FROM quota),
       |ranked AS (
       |  SELECT lang, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rn
       |  FROM h)
       |SELECT r.lang, CAST(r.rn AS INTEGER) AS sample_rank, r.doc_id,
       |  a.n_lang, a.alloc
       |FROM ranked r JOIN alloc a USING (lang)
       |WHERE r.rn <= a.alloc
       |ORDER BY r.lang, r.rn""".stripMargin) { (s, d) =>
    val h = Tables.documents(s, d).select(col("doc_id"), col("lang"),
      conv(substring(md5(concat(lit("lrs:"), col("doc_id").cast("string"))), 1, 8),
        16, 10).cast("long").as("hv"))
    val strata = h.groupBy("lang").agg(count(lit(1)).as("n_lang"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val quota = strata
      .withColumn("n_all", sum("n_lang").over(wAll))
      .withColumn("base", expr(s"($sampleK * n_lang) div n_all"))
      .withColumn("rem", expr(s"($sampleK * n_lang) % n_all"))
    val wRem = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("lang"))
    val alloc = quota
      .withColumn("sum_base", sum("base").over(wAll))
      .withColumn("alloc",
        (col("base") + when(row_number().over(wRem) <= lit(sampleK.toLong) - col("sum_base"),
          1L).otherwise(0L)).cast("long"))
      .select("lang", "n_lang", "alloc")
    // bounded K-heaps per stratum: score = -hash keeps the SMALLEST
    // hashes (ties to the smaller doc_id — the TopKByScore contract)
    val tops = h.groupBy("lang")
      .agg(org.apache.spark.sql.graftshim.TopKByScore(
        -col("hv").cast("double"), col("doc_id"), sampleK).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("i0", "e")))
      .select(col("lang"), (col("i0") + 1).cast("int").as("sample_rank"),
        col("e.id").as("doc_id"))
    tops.join(broadcast(alloc), "lang")
      .where(col("sample_rank") <= col("alloc"))
      .select(col("lang"), col("sample_rank"), col("doc_id"),
        col("n_lang"), col("alloc"))
      .orderBy("lang", "sample_rank")
  }

  def all: Seq[GraftQuery] = Seq(qGroupSample, qStratifiedSample)
}
