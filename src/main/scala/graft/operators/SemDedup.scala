package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
  * embedding corpus into cells with a coarse quantizer, then drop
  * near-duplicates WITHIN each cell — the quadratic pairwise check is
  * bounded by the cell, never the corpus, which is exactly how the
  * published method scales to web corpora.
  *
  * This implementation reuses the IVF machinery end to end: the
  * deterministic fixed-stride quantizer (IvfAnn.fixedCentroids — cell
  * count grows with the corpus, so mean cell size stays bounded) and
  * the fused NearestCentroid assignment expression (no N×C join).
  * The drop rule is greedy-by-id: a vector is dropped iff some
  * LOWER-id vector in its cell has cosine ≥ τ with it — deterministic,
  * order-independent, and one equi-join; the kept set is exactly the
  * lexicographic-minimal independent set the published greedy computes
  * when scanning ids ascending with "keep unless similar to something
  * already kept or seen" relaxed to "seen" (documented difference: a
  * dropped vector still suppresses its own higher-id neighbors).
  *
  * τ = 0.4 sits ≥ 5.6e-4 from every within-cell pair cosine at all
  * three test SFs (measured; SemDedupSpec asserts the margin), so the
  * drop SET cannot flip on engine fp — same gate discipline as q48.
  *
  * Output is a per-cell audit (sizes, drops, identity-sensitive id
  * sum), the report a curation run reads before committing a corpus.
  */
object SemDedup {

  val minCos = 0.4

  private val cosSql =
    "list_cosine_similarity(CAST(%s AS DOUBLE[]), CAST(%s AS DOUBLE[]))"

  val qSemanticDedup: GraftQuery = GraftQuery(
    "q116_semantic_dedup",
    s"""WITH centroids AS (
       |  SELECT vec_id AS cell, embedding AS c_emb FROM embeddings
       |  WHERE vec_id % ${IvfAnn.fixedStride} = 0),
       |cells AS (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT e.vec_id, e.embedding, c.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosSql.format("e.embedding", "c.c_emb")} DESC, c.cell) AS rn
       |    FROM embeddings e CROSS JOIN centroids c)
       |  WHERE rn = 1),
       |dropped AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM cells a JOIN cells b
       |    ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE ${cosSql.format("a.embedding", "b.embedding")} >= $minCos)
       |SELECT c.cell,
       |  CAST(count(*) AS INTEGER) AS n_vecs,
       |  CAST(count(*) FILTER (d.vec_id IS NOT NULL) AS INTEGER) AS n_dropped,
       |  CAST(count(*) FILTER (d.vec_id IS NULL) AS INTEGER) AS n_kept,
       |  CAST(COALESCE(sum(d.vec_id), 0) AS BIGINT) AS dropped_id_sum
       |FROM cells c LEFT JOIN dropped d ON c.vec_id = d.vec_id
       |GROUP BY c.cell
       |ORDER BY c.cell""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val centroids = IvfAnn.fixedCentroids(emb, IvfAnn.fixedStride)
    val assigned = IvfAnn.assign(emb, centroids) // (vec_id, embedding, cell)
    val a = assigned.select(col("vec_id").as("va"), col("embedding").as("ea"),
      col("cell"))
    val b = assigned.select(col("vec_id").as("vb"), col("embedding").as("eb"),
      col("cell").as("cell_b"))
    val dropped = a
      .join(b, col("cell") === col("cell_b") && col("va") < col("vb"))
      .where(Similarity.cosine(col("ea"), col("eb")) >= minCos)
      .select(col("vb").as("vec_id")).distinct()
      .withColumn("is_drop", lit(1))
    assigned.join(dropped, Seq("vec_id"), "left")
      .groupBy("cell")
      .agg(
        count(lit(1)).cast("int").as("n_vecs"),
        count(col("is_drop")).cast("int").as("n_dropped"),
        count(when(col("is_drop").isNull, 1)).cast("int").as("n_kept"),
        coalesce(sum(when(col("is_drop") === 1, col("vec_id"))), lit(0L))
          .as("dropped_id_sum"))
      .orderBy("cell")
  }

  def all: Seq[GraftQuery] = Seq(qSemanticDedup)
}
