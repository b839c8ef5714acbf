package graft.operators

import graft.GraftQuery
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DUPLICATED-REGION COALESCING: q117 counts how many of a document's
  * 5-gram POSITIONS are corpus-duplicated; this operator resolves
  * those positions into maximal contiguous REGIONS (classic interval
  * coalescing — overlapping/adjacent [i, i+5) spans merged by the
  * gaps-and-islands pattern, q97's machinery at token grain) and
  * reports exact covered-token counts. The distinction matters for
  * curation policy: 40 duplicated positions could be one 44-token
  * boilerplate block (strip it — q126/q141 territory) or 40 scattered
  * clichés (keep the doc); dup_frac alone cannot tell them apart.
  *
  * Exactness: island detection compares integer positions against an
  * integer running maximum of span ends; coverage is a sum of exact
  * island lengths; the covered fraction is integer ppm
  * ((covered·10⁶) div n_tokens). Engine-stable at any partitioning.
  *
  * Scale (100 TB): the gram stream joins the Zipf-compact duplicated-
  * gram relation (q117's physics), then ONE doc_id exchange carries
  * only the duplicated positions (boilerplate-heavy docs contribute
  * more rows, but bounded by their own token count); the two window
  * passes (running max, island id) and the island/doc rollups all
  * reuse that single clustering. Output: one row per document that
  * has at least one duplicated position.
  */
object SpanCoalesce {

  val gramW = 5

  /** q223: per document — duplicated positions, coalesced islands,
    * exact covered tokens, and covered ppm of the doc's tokens. */
  val qSpanCoalesce: GraftQuery = GraftQuery(
    "q223_dup_region_coalesce",
    s"""WITH ${NgramStats.gramsPosCteSql},
       |gram_counts AS (
       |  SELECT g, count(*) AS n FROM grams_pos GROUP BY g),
       |dup AS (
       |  SELECT p.doc_id, p.i, p.n_tokens
       |  FROM grams_pos p JOIN gram_counts c USING (g)
       |  WHERE c.n >= 2),
       |flagged AS (
       |  SELECT doc_id, i, n_tokens,
       |    CASE WHEN max(i + $gramW) OVER (
       |        PARTITION BY doc_id ORDER BY i
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) >= i
       |      THEN 0 ELSE 1 END AS new_island
       |  FROM dup),
       |islands AS (
       |  SELECT doc_id, i, n_tokens,
       |    SUM(new_island) OVER (
       |      PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_id
       |  FROM flagged),
       |isl AS (
       |  SELECT doc_id, island_id, MAX(n_tokens) AS n_tokens,
       |    MIN(i) AS start_i, MAX(i) + $gramW AS end_i,
       |    COUNT(*) AS n_pos
       |  FROM islands GROUP BY doc_id, island_id)
       |SELECT doc_id,
       |  CAST(SUM(n_pos) AS BIGINT) AS n_dup_pos,
       |  CAST(COUNT(*) AS BIGINT) AS n_islands,
       |  CAST(SUM(end_i - start_i) AS BIGINT) AS covered_tokens,
       |  CAST((SUM(end_i - start_i) * 1000000) // MAX(n_tokens) AS BIGINT) AS covered_ppm
       |FROM isl
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val grams = NgramStats.gramPosStream(NgramStats.indexedDocToks(s, d))
    val counts = grams.groupBy("g").agg(count(lit(1)).as("n"))
    val dup = grams.join(counts, "g")
      .where(col("n") >= 2)
      .select(col("doc_id"), col("i"), col("n_tokens"))
    val wOrd = Window.partitionBy("doc_id").orderBy("i")
    val wPrev = wOrd.rowsBetween(Window.unboundedPreceding, -1)
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val islands = dup
      .withColumn("new_island",
        when(max(col("i") + gramW).over(wPrev) >= col("i"), 0L).otherwise(1L))
      .withColumn("island_id", sum(col("new_island")).over(wRun))
    islands.groupBy("doc_id", "island_id")
      .agg(max("n_tokens").as("n_tokens"),
        min("i").as("start_i"),
        (max("i") + gramW).as("end_i"),
        count(lit(1)).as("n_pos"))
      .groupBy("doc_id")
      .agg(sum("n_pos").as("n_dup_pos"),
        count(lit(1)).as("n_islands"),
        sum(col("end_i") - col("start_i")).as("covered_tokens"),
        expr(s"(SUM(end_i - start_i) * 1000000) div MAX(n_tokens)").as("covered_ppm"))
      .orderBy("doc_id")
  }

  def all: Seq[GraftQuery] = Seq(qSpanCoalesce)
}
