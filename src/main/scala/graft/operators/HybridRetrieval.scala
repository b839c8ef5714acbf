package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hybrid retrieval: BM25 lexical ranking fused with embedding-cosine
  * ranking by Reciprocal Rank Fusion (Cormack et al., SIGIR'09) — the
  * canonical RAG serving shape (sparse + dense retriever, rank-level
  * fusion, no score calibration needed between the two signals).
  *
  * The query is "by example": corpus item 0 supplies the dense query
  * vector (and is excluded from both pools); the lexical side reuses
  * q113's fixed 3-term BM25 with its libm-free rational-idf
  * arithmetic, so both component orderings are bit-reproducible
  * against DuckDB and the fused ranking is hash-checkable.
  *
  * 100 TB notes: NEITHER retriever global-sorts the corpus. Each one
  * reduces to a bounded top-64 candidate pool via the TopKByScore
  * partial aggregate (per-partition heaps, exchange carries ≤ 64 rows
  * per partition, one reduce task); ranks are then positions INSIDE
  * the 64-row pool, the fusion join is 64×64, and the final top-10 is
  * a TakeOrderedAndProject. The oracle's window-over-everything
  * row_number is the semantic spec, not the plan. RRF contributions
  * are 1/(60+rank) from each pool where present (absent = 0) — pure
  * integer-derived doubles, identical in both engines.
  */
object HybridRetrieval {

  val poolK = 64
  val topN = 10
  val rrfK = 60

  /** CTE chain ending at `fused` (the unlimited RRF pool with both
    * component ranks) — shared by q134 and the cross-encoder rerank
    * (q330), which re-scores exactly this pool. */
  private[operators] val rrfCtesSql: String =
    s"""${TextAdvanced.bm25CtesSql},
       |bm25 AS (
       |  SELECT doc_id, ${TextAdvanced.bm25TotalScoreSql} AS lex
       |  FROM feat CROSS JOIN stats WHERE doc_id <> 0),
       |lexr AS (
       |  SELECT doc_id,
       |    row_number() OVER (ORDER BY lex DESC, doc_id) AS rank_lex
       |  FROM bm25),
       |qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
       |vecs AS (
       |  SELECT e.vec_id AS doc_id,
       |    list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
       |                           CAST(e.embedding AS DOUBLE[])) AS cos
       |  FROM embeddings e CROSS JOIN qv q WHERE e.vec_id <> 0),
       |vecr AS (
       |  SELECT doc_id,
       |    row_number() OVER (ORDER BY cos DESC, doc_id) AS rank_vec
       |  FROM vecs),
       |fused AS (
       |  SELECT doc_id,
       |    CAST(l.rank_lex AS INTEGER) AS rank_lex,
       |    CAST(v.rank_vec AS INTEGER) AS rank_vec,
       |    COALESCE(CAST(1 AS DOUBLE) / ($rrfK + l.rank_lex), CAST(0 AS DOUBLE)) +
       |    COALESCE(CAST(1 AS DOUBLE) / ($rrfK + v.rank_vec), CAST(0 AS DOUBLE)) AS rrf
       |  FROM (SELECT * FROM lexr WHERE rank_lex <= $poolK) l
       |  FULL JOIN (SELECT * FROM vecr WHERE rank_vec <= $poolK) v USING (doc_id))""".stripMargin

  /** The unlimited fused pool (doc_id, rank_lex, rank_vec, rrf) —
    * ≤ 2·poolK rows, the engine mirror of the `fused` CTE. */
  private[operators] def rrfPool(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    def pool(scored: DataFrame, score: String, rankName: String): DataFrame =
      scored.groupBy()
        .agg(org.apache.spark.sql.graftshim.TopKByScore(
          col(score), col("doc_id"), poolK).as("top"))
        .select(posexplode(col("top")))
        .select(col("col.id").as("doc_id"),
          (col("pos") + 1).cast("int").as(rankName))
    val lex = pool(
      TextAdvanced.bm25FeatWithStats(s, d)
        .select(col("doc_id"), TextAdvanced.bm25TotalScore.as("lex"))
        .where(col("doc_id") =!= 0),
      "lex", "rank_lex")
    val qv = Tables.embeddings(s, d).where(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val vec = pool(
      Tables.embeddings(s, d).where(col("vec_id") =!= 0)
        .crossJoin(broadcast(qv))
        .select(col("vec_id").as("doc_id"),
          Similarity.cosine(col("q_emb"), col("embedding")).as("cos")),
      "cos", "rank_vec")
    lex.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(rrfK) + col("rank_lex")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("rank_vec")), lit(0.0)))
  }

  val qHybridRrf: GraftQuery = GraftQuery(
    "q134_hybrid_rrf",
    s"""WITH $rrfCtesSql
       |SELECT doc_id, rank_lex, rank_vec, rrf
       |FROM fused
       |ORDER BY rrf DESC, doc_id
       |LIMIT $topN""".stripMargin) { (s, d) =>
    rrfPool(s, d)
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(topN)
      .select("doc_id", "rank_lex", "rank_vec", "rrf")
  }

  /** RETRIEVAL ABLATION — the eval that justifies q134's fusion: how
    * much do the three rankings actually disagree? Pairwise overlap
    * and exact Jaccard (integer ppm over the 10+10 union) between the
    * BM25-only, cosine-only, and RRF-fused top-10 sets. Low
    * lexical↔dense overlap + high fused↔both overlap is the signature
    * that the two signals are complementary and the fusion is doing
    * work; three numbers a retrieval owner reads per index rebuild.
    *
    * Scale physics inherited wholesale from q134: both component
    * pools reduce through bounded heaps before anything joins; the
    * ablation adds three joins of 10-row relations. */
  val ablTopN = 10

  val qRetrievalAblation: GraftQuery = GraftQuery(
    "q195_retrieval_ablation",
    s"""WITH ${TextAdvanced.bm25CtesSql},
       |bm25 AS (
       |  SELECT doc_id, ${TextAdvanced.bm25TotalScoreSql} AS lex
       |  FROM feat CROSS JOIN stats WHERE doc_id <> 0),
       |lexr AS (
       |  SELECT doc_id,
       |    row_number() OVER (ORDER BY lex DESC, doc_id) AS rank_lex
       |  FROM bm25),
       |qv AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
       |vecs AS (
       |  SELECT e.vec_id AS doc_id,
       |    list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]),
       |                           CAST(e.embedding AS DOUBLE[])) AS cos
       |  FROM embeddings e CROSS JOIN qv q WHERE e.vec_id <> 0),
       |vecr AS (
       |  SELECT doc_id,
       |    row_number() OVER (ORDER BY cos DESC, doc_id) AS rank_vec
       |  FROM vecs),
       |fused AS (
       |  SELECT doc_id,
       |    COALESCE(CAST(1 AS DOUBLE) / ($rrfK + l.rank_lex), CAST(0 AS DOUBLE)) +
       |    COALESCE(CAST(1 AS DOUBLE) / ($rrfK + v.rank_vec), CAST(0 AS DOUBLE)) AS rrf
       |  FROM (SELECT * FROM lexr WHERE rank_lex <= $poolK) l
       |  FULL JOIN (SELECT * FROM vecr WHERE rank_vec <= $poolK) v USING (doc_id)),
       |l10 AS (SELECT doc_id FROM lexr WHERE rank_lex <= $ablTopN),
       |v10 AS (SELECT doc_id FROM vecr WHERE rank_vec <= $ablTopN),
       |r10 AS (SELECT doc_id FROM fused ORDER BY rrf DESC, doc_id LIMIT $ablTopN),
       |ov AS (
       |  SELECT 'bm25_vs_cos' AS pair, CAST(COUNT(*) AS BIGINT) AS n_overlap
       |  FROM l10 JOIN v10 USING (doc_id)
       |  UNION ALL
       |  SELECT 'bm25_vs_rrf', CAST(COUNT(*) AS BIGINT)
       |  FROM l10 JOIN r10 USING (doc_id)
       |  UNION ALL
       |  SELECT 'cos_vs_rrf', CAST(COUNT(*) AS BIGINT)
       |  FROM v10 JOIN r10 USING (doc_id))
       |SELECT pair, n_overlap,
       |  CAST(n_overlap * 1000000 // (${2 * ablTopN} - n_overlap) AS BIGINT)
       |    AS jaccard_ppm
       |FROM ov
       |ORDER BY pair""".stripMargin) { (s, d) =>
    def top10(scored: DataFrame, score: String): DataFrame =
      scored.groupBy()
        .agg(org.apache.spark.sql.graftshim.TopKByScore(
          col(score), col("doc_id"), ablTopN).as("top"))
        .select(explode(col("top")).as("t"))
        .select(col("t.id").as("doc_id"))
    val lex10 = top10(
      TextAdvanced.bm25FeatWithStats(s, d)
        .select(col("doc_id"), TextAdvanced.bm25TotalScore.as("lex"))
        .where(col("doc_id") =!= 0),
      "lex")
    val qv = Tables.embeddings(s, d).where(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val vec10 = top10(
      Tables.embeddings(s, d).where(col("vec_id") =!= 0)
        .crossJoin(broadcast(qv))
        .select(col("vec_id").as("doc_id"),
          Similarity.cosine(col("q_emb"), col("embedding")).as("cos")),
      "cos")
    val rrf10 = qHybridRrf.fn(s, d).select("doc_id")
    def overlap(name: String, a: DataFrame, b: DataFrame): DataFrame =
      a.join(b, Seq("doc_id"))
        .agg(count(lit(1)).as("n_overlap"))
        .select(lit(name).as("pair"), col("n_overlap"),
          expr(s"n_overlap * 1000000 div (${2 * ablTopN} - n_overlap)")
            .as("jaccard_ppm"))
    overlap("bm25_vs_cos", lex10, vec10)
      .unionByName(overlap("bm25_vs_rrf", lex10, rrf10))
      .unionByName(overlap("cos_vs_rrf", vec10, rrf10))
      .orderBy("pair")
  }

  /** Queries = every [[HardNegatives.anchorStride]]-th vector; metrics
    * over the top-[[metricsTopK]] retrieved neighbors. */
  val metricsTopK = 10

  /** RETRIEVAL QUALITY METRICS (MRR@10, precision@10) with LABEL
    * relevance — the standard IR eval sheet for an embedding index,
    * computed exactly: for each query vector, the top-10 corpus
    * neighbors by exact cosine (self excluded), a neighbor is
    * RELEVANT iff it carries the query's label, and the metrics are
    * integer rationals (ppm / permille) so both engines agree bit for
    * bit — mrr_ppm = 10⁶ div first_rel_rank (0 when no relevant doc
    * reaches the top 10, the MRR@k convention), p_at_k_permille =
    * 100·hits. q172 answers "does the ANN index find the true
    * neighbors?"; this answers the next question a retrieval system
    * asks: "are the true neighbors actually RELEVANT?" — recall of
    * the index vs usefulness of the embedding space.
    *
    * Plan: corpus × bounded-query broadcast (the q30/q199 contract),
    * reduced by the k=10 bounded-heap TopKByScore — ObjectHashAggregate
    * with map-side partials, the scored relation never shuffles; the
    * |queries|·10 result rows broadcast back onto the corpus for the
    * label lookup. The 100 TB path swaps the exact scorer for the
    * q127 IVF-PQ tier and keeps this exact form as its eval oracle. */
  val qRetrievalMetrics: GraftQuery = GraftQuery(
    "q211_retrieval_metrics",
    s"""WITH anchors AS (
       |  SELECT vec_id AS a_id, embedding AS a_emb, label AS a_label
       |  FROM embeddings WHERE vec_id % ${HardNegatives.anchorStride} = 0),
       |scored AS (
       |  SELECT a.a_id, a.a_label, e.vec_id, e.label,
       |    ${HardNegatives.cosExplicitSql("a.a_emb", "e.embedding")} AS cos
       |  FROM anchors a JOIN embeddings e ON e.vec_id <> a.a_id),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY a_id ORDER BY cos DESC, vec_id) AS rn
       |  FROM scored),
       |top AS (
       |  SELECT a_id, a_label, vec_id, label, rn,
       |    CAST(label = a_label AS INTEGER) AS rel
       |  FROM ranked WHERE rn <= $metricsTopK)
       |SELECT a_id, a_label,
       |  CAST(sum(rel) AS BIGINT) AS n_rel_at_k,
       |  CAST(sum(rel) * 100 AS BIGINT) AS p_at_k_permille,
       |  CAST(COALESCE(MIN(CASE WHEN rel = 1 THEN rn END), 0) AS BIGINT)
       |    AS first_rel_rank,
       |  CASE WHEN MIN(CASE WHEN rel = 1 THEN rn END) IS NULL THEN CAST(0 AS BIGINT)
       |       ELSE 1000000 // CAST(MIN(CASE WHEN rel = 1 THEN rn END) AS BIGINT)
       |  END AS mrr_ppm
       |FROM top
       |GROUP BY a_id, a_label
       |ORDER BY a_id""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val anchors = emb
      .where(pmod(col("vec_id"), lit(HardNegatives.anchorStride)) === 0)
      .select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
        col("label").as("a_label"))
    val scored = emb.join(broadcast(anchors), col("vec_id") =!= col("a_id"))
      .select(col("a_id"), col("a_label"), col("vec_id"),
        Similarity.cosine(col("a_emb"), col("embedding")).as("cos"))
    // bounded heap per query: (cos desc, vec_id asc), never a shuffle
    // of the scored relation; rank = position in the emitted array
    val top = scored.groupBy("a_id", "a_label")
      .agg(org.apache.spark.sql.graftshim.TopKByScore(
        col("cos"), col("vec_id"), metricsTopK).as("top"))
      .select(col("a_id"), col("a_label"), posexplode(col("top")))
      .select(col("a_id"), col("a_label"),
        (col("pos") + 1).cast("int").as("rn"), col("col.id").as("vec_id"))
    val labeled = emb.select(col("vec_id"), col("label"))
      .join(broadcast(top), "vec_id")
      .withColumn("rel", (col("label") === col("a_label")).cast("int"))
    labeled.groupBy("a_id", "a_label")
      .agg(
        sum("rel").as("n_rel_at_k"),
        (sum("rel") * 100).as("p_at_k_permille"),
        coalesce(min(when(col("rel") === 1, col("rn"))), lit(0))
          .cast("long").as("first_rel_rank"),
        min(when(col("rel") === 1, col("rn"))).as("__fr"))
      .select(col("a_id"), col("a_label"), col("n_rel_at_k"),
        col("p_at_k_permille"), col("first_rel_rank"),
        when(col("__fr").isNull, 0L)
          .otherwise(expr("1000000 DIV CAST(__fr AS BIGINT)")).as("mrr_ppm"))
      .orderBy("a_id")
  }

  def all: Seq[GraftQuery] = Seq(qHybridRrf, qRetrievalAblation, qRetrievalMetrics)
}
