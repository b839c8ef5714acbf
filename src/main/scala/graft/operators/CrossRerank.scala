package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** CROSS-ENCODER RERANK — the stage a production retrieval stack runs
  * AFTER fusion: the q134 RRF pool (≤ 2·poolK candidates) re-scored by
  * a pairwise model that sees the QUERY and the CANDIDATE together,
  * instead of combining two independently-computed ranks. This is the
  * bi-encoder → cross-encoder cascade (retrieve wide with cheap
  * independent scores, re-score the small pool with an expensive
  * joint model): the cross-encoder runs on ≤ 128 rows, NEVER the
  * corpus — which is the whole scale contract at 100 TB.
  *
  * Pair features (all exact integers before weighting):
  *  - both embeddings, ⌊v·4096⌋-quantized (the q156 grid: scaling a
  *    float by a power of two is exact, floor is exact, so both
  *    engines see identical integers) — query's 64 dims and
  *    candidate's 64 dims;
  *  - lexical overlap counts: the candidate's term frequencies for
  *    the three BM25 query terms (q113's integer tf columns).
  *  A pool candidate from the lexical side may lack an embedding row
  *  (and vice versa) — absent features are zero, the natural encoding
  *  for "no evidence from this modality".
  *
  * Scoring is the q142 fixed-weight MLP pattern: h_k = relu(Σ x·W1 +
  * b1), score = Σ h_k·W2[k], with every weight an exact half from the
  * deterministic LCG stream (the PqAnn-codebook discipline) — so every
  * product is a multiple of 0.5 with magnitude ≪ 2^53 and every sum is
  * EXACT in double in any association order; the DuckDB oracle rebuilds
  * the identical arithmetic from literals. The LCG weights stand in
  * for a trained pairwise model (training one needs relevance labels
  * this corpus doesn't define); what the operator pins down is the
  * exact-scoring machinery and the pool-only plan shape a real
  * checkpoint would drop into (swap [[w1]]/[[b1]]/[[w2]], keep the
  * grid).
  *
  * Output: the rerank top-10 with BOTH the fused-rank evidence
  * (rank_lex, rank_vec, rrf) and the cross-encoder score — the
  * before/after a ranking change is audited with. CrossRerankSpec
  * pins that the rerank changes the RRF order exactly where lexical
  * and dense evidence disagree. */
object CrossRerank {

  val hidden = 4
  private val embDims: Int = PqAnn.dims // 64
  private val terms: Seq[String] = TextAdvanced.bm25Terms
  val featDim: Int = 2 * embDims + terms.size // 131

  /** Deterministic exact-half stream, the PqAnn/NeuralEmbed.w2
    * generator family. */
  private def halves(seed: Long): Iterator[Double] =
    Iterator.iterate(seed)(s =>
      s * 6364136223846793005L + 1442695040888963407L)
      .drop(1)
      .map(s => (((s >>> 33) % 7 + 7) % 7 - 3) * 0.5)

  val w1: IndexedSeq[IndexedSeq[Double]] = {
    val it = halves(13L)
    IndexedSeq.fill(hidden)(IndexedSeq.fill(featDim)(it.next()))
  }
  val b1: IndexedSeq[Double] = {
    val it = halves(29L)
    IndexedSeq.fill(hidden)(it.next())
  }
  val w2: IndexedSeq[Double] = {
    val it = halves(17L)
    IndexedSeq.fill(hidden)(it.next())
  }

  // ---- generated DuckDB SQL ----

  private def featSqls: Seq[String] =
    (0 until embDims).map(i =>
      s"COALESCE(CAST(floor(CAST(q.q_emb[${i + 1}] AS DOUBLE) * " +
        "CAST(4096 AS DOUBLE)) AS DOUBLE), CAST(0 AS DOUBLE))") ++
      (0 until embDims).map(i =>
        s"COALESCE(CAST(floor(CAST(e.embedding[${i + 1}] AS DOUBLE) * " +
          "CAST(4096 AS DOUBLE)) AS DOUBLE), CAST(0 AS DOUBLE))") ++
      terms.map(t => s"COALESCE(CAST(ft.tf_$t AS DOUBLE), CAST(0 AS DOUBLE))")

  /** The 131-term weighted sums are CHUNKED into ≤40-term partial
    * columns in the oracle (DuckDB's binder recursion caps expression
    * nesting at 128): every term is a multiple of 0.5 with magnitude
    * ≪ 2^53, so the sum is EXACT in double under ANY association —
    * the chunked oracle and the single-reduce engine expression
    * produce identical bytes by arithmetic, not by op-order
    * mirroring. */
  private val chunk = 40

  private def hiddenPartSqls(k: Int): Seq[String] =
    featSqls.zip(w1(k)).map { case (f, w) =>
      s"($f * ${PqAnn.sqlNum(w)})"
    }.grouped(chunk).map(_.reduceLeft((a, b) => s"($a + $b)")).toSeq

  private def hiddenFromPartsSql(k: Int, nParts: Int): String = {
    val sum = (0 until nParts).map(i => s"p${k}_$i")
      .reduceLeft((a, b) => s"($a + $b)")
    s"greatest(($sum + ${PqAnn.sqlNum(b1(k))}), CAST(0 AS DOUBLE))"
  }

  private def scoreSql: String =
    (0 until hidden).map(k => s"(h$k * ${PqAnn.sqlNum(w2(k))})")
      .reduceLeft((a, b) => s"($a + $b)")

  // ---- Spark side ----

  private def eqCol(i: Int): Column =
    coalesce(floor(element_at(col("q_emb"), i + 1).cast("double") *
      lit(4096.0)).cast("double"), lit(0.0))
  private def ecCol(i: Int): Column =
    coalesce(floor(element_at(col("embedding"), i + 1).cast("double") *
      lit(4096.0)).cast("double"), lit(0.0))
  private def lxCol(t: String): Column =
    coalesce(col(s"tf_$t").cast("double"), lit(0.0))

  private def featCols: Seq[Column] =
    (0 until embDims).map(eqCol) ++ (0 until embDims).map(ecCol) ++
      terms.map(lxCol)

  private def hiddenCol(k: Int): Column =
    greatest(
      featCols.zip(w1(k)).map { case (c, w) => c * lit(w) }
        .reduceLeft(_ + _) + lit(b1(k)),
      lit(0.0))

  private def scoreCol: Column =
    (0 until hidden).map(k => hiddenCol(k) * lit(w2(k)))
      .reduceLeft(_ + _)

  val qCrossRerank: GraftQuery = GraftQuery(
    "q330_cross_encoder_rerank",
    {
      val nParts = hiddenPartSqls(0).size
      s"""WITH ${HybridRetrieval.rrfCtesSql},
       |cand AS (
       |  SELECT f.doc_id, f.rank_lex, f.rank_vec, f.rrf,
       |    ${(0 until hidden).flatMap(k => hiddenPartSqls(k).zipWithIndex
              .map { case (p, i) => s"$p AS p${k}_$i" }).mkString(",\n    ")}
       |  FROM fused f
       |  CROSS JOIN qv q
       |  LEFT JOIN embeddings e ON e.vec_id = f.doc_id
       |  LEFT JOIN feat ft ON ft.doc_id = f.doc_id),
       |hid AS (
       |  SELECT doc_id, rank_lex, rank_vec, rrf,
       |    ${(0 until hidden).map(k => s"${hiddenFromPartsSql(k, nParts)} AS h$k").mkString(",\n    ")}
       |  FROM cand),
       |scored AS (
       |  SELECT doc_id, rank_lex, rank_vec, rrf, $scoreSql AS ce_score
       |  FROM hid)
       |SELECT doc_id, rank_lex, rank_vec, rrf, ce_score,
       |  CAST(row_number() OVER (ORDER BY ce_score DESC, doc_id) AS INTEGER)
       |    AS rank_ce
       |FROM scored
       |ORDER BY ce_score DESC, doc_id
       |LIMIT ${HybridRetrieval.topN}""".stripMargin
    }) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    scoredPool(s, d)
      // the rank window runs over the ≤2·poolK-row pool, never data
      .withColumn("rank_ce", row_number().over(
        Window.orderBy(col("ce_score").desc, col("doc_id"))).cast("int"))
      .orderBy(col("ce_score").desc, col("doc_id"))
      .limit(HybridRetrieval.topN)
      .select("doc_id", "rank_lex", "rank_vec", "rrf", "ce_score", "rank_ce")
  }

  /** The whole pool with its cross-encoder score (≤ 2·poolK rows) —
    * the q330 body before ranking; CrossRerankSpec audits order
    * changes over it. */
  private[graft] def scoredPool(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    // the pool materializes ONCE (≤ 2·poolK rows) and then gates both
    // corpus-sized feature scans by a broadcast id set, so the join
    // build sides are pool-sized — never the corpus. localCheckpoint,
    // NOT persist: persist registers the pool's logical plan in the
    // session CacheManager, which would silently rewrite q134's OWN
    // identical plan to an InMemoryRelation scan (plan-audit
    // cross-talk); the checkpoint materializes once without touching
    // any other query's plan
    val pool = HybridRetrieval.rrfPool(s, d).localCheckpoint()
    val poolIds = pool.select("doc_id")
    val qv = Tables.embeddings(s, d).where(col("vec_id") === 0)
      .select(col("embedding").as("q_emb"))
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id").as("doc_id"), col("embedding"))
      .join(broadcast(poolIds), Seq("doc_id"))
    val ft = TextAdvanced.bm25FeatWithStats(s, d)
      .select(col("doc_id") +: terms.map(t => col(s"tf_$t")): _*)
      .join(broadcast(poolIds), Seq("doc_id"))
    pool
      .crossJoin(broadcast(qv))
      .join(broadcast(emb), Seq("doc_id"), "left")
      .join(broadcast(ft), Seq("doc_id"), "left")
      .select(col("doc_id"), col("rank_lex"), col("rank_vec"), col("rrf"),
        scoreCol.as("ce_score"))
  }

  def all: Seq[GraftQuery] = Seq(qCrossRerank)
}
