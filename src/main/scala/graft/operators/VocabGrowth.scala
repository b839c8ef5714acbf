package graft.operators

import graft.GraftQuery
import org.apache.spark.sql.functions._

/** VOCABULARY GROWTH CURVE (Heaps'-law diagnostic) over the shingle
  * space: at geometric corpus prefixes (first 1, 2, 4, … documents in
  * doc_id order), the cumulative shingle positions vs cumulative
  * DISTINCT shingles, plus the type/token ratio in exact ppm. The
  * curve is how a curation pipeline audits whether new data still
  * ADDS content: a corpus whose distinct-shingle curve flattens while
  * positions grow is recrawling itself (q158/q159's novelty signal,
  * aggregated to the corpus-growth view; q176 is the same idea for
  * tokenizer sizing over token frequencies).
  *
  * Exactness: "first d docs" prefixes are doc_id thresholds; a
  * shingle's first appearance is min(doc_id) — both
  * order-independent, so the curve is identical under any
  * partitioning; ratios are integer ppm.
  *
  * Scale (100 TB): one pass builds the two compact relations
  * (per-doc distinct-shingle counts; per-shingle first-seen doc); the
  * ~20 geometric checkpoints are a bounded broadcast joined against
  * those compact relations — never against the corpus. This is the
  * q63 compact-relation physics with a 20-row dimension.
  */
object VocabGrowth {

  val maxLog2 = 21

  val qVocabGrowth: GraftQuery = GraftQuery(
    "q227_vocab_growth",
    s"""WITH toks AS (
       |  SELECT doc_id, ${Dedup.shinglesSql} AS sh FROM documents),
       |ex AS (SELECT doc_id, unnest(sh) AS s FROM toks),
       |first_seen AS (SELECT s, MIN(doc_id) AS fdoc FROM ex GROUP BY s),
       |per_doc AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh FROM ex GROUP BY doc_id),
       |mx AS (SELECT MAX(doc_id) AS m FROM per_doc),
       |cps AS (
       |  SELECT CAST(1 AS BIGINT) << j AS d
       |  FROM range(0, $maxLog2) t(j), mx
       |  WHERE (CAST(1 AS BIGINT) << j) <= 2 * m),
       |cum_pos AS (
       |  SELECT c.d, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(p.n_sh) AS BIGINT) AS cum_positions
       |  FROM per_doc p JOIN cps c ON p.doc_id < c.d
       |  GROUP BY c.d),
       |cum_dist AS (
       |  SELECT c.d, CAST(COUNT(*) AS BIGINT) AS cum_distinct
       |  FROM first_seen f JOIN cps c ON f.fdoc < c.d
       |  GROUP BY c.d)
       |SELECT p.d, p.n_docs, p.cum_positions, s.cum_distinct,
       |  CAST((s.cum_distinct * 1000000) // p.cum_positions AS BIGINT) AS ttr_ppm
       |FROM cum_pos p JOIN cum_dist s USING (d)
       |ORDER BY d""".stripMargin) { (s, d) =>
    val ex = Dedup.indexedShingleSets(s, d)
      .select(col("doc_id"), explode(col("toks")).as("sh"))
    val firstSeen = ex.groupBy("sh").agg(min("doc_id").as("fdoc"))
    val perDoc = ex.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val mx = perDoc.agg(max("doc_id").as("m"))
    val cps = s.range(0, maxLog2)
      .select(expr("shiftleft(CAST(1 AS BIGINT), CAST(id AS INT))").as("d"))
      .crossJoin(broadcast(mx))
      .where(col("d") <= lit(2) * col("m"))
      .select("d")
    val cumPos = perDoc.crossJoin(broadcast(cps))
      .where(col("doc_id") < col("d"))
      .groupBy("d")
      .agg(count(lit(1)).as("n_docs"), sum("n_sh").as("cum_positions"))
    val cumDist = firstSeen.crossJoin(broadcast(cps))
      .where(col("fdoc") < col("d"))
      .groupBy("d")
      .agg(count(lit(1)).as("cum_distinct"))
    cumPos.join(cumDist, "d")
      .select(col("d"), col("n_docs"), col("cum_positions"), col("cum_distinct"),
        expr("(cum_distinct * 1000000) div cum_positions").as("ttr_ppm"))
      .orderBy("d")
  }

  def all: Seq[GraftQuery] = Seq(qVocabGrowth)
}
