package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** MAXIMAL MARGINAL RELEVANCE re-ranking (Carbonell & Goldstein,
  * SIGIR'98): pick k results that are RELEVANT to the query but
  * DISSIMILAR to each other — the diversity stage a RAG/retrieval
  * pipeline runs on top of q30/q134's similarity rankings, where the
  * naive top-k of a duplicate-heavy corpus returns k copies of the
  * same passage. Greedy MMR: at each step select
  * argmax λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s), λ = 0.5, ties to the
  * smaller vec_id.
  *
  * Execution split (the honest production shape): the DISTRIBUTED
  * part is pool construction — exact cosine top-`poolK` against the
  * corpus (TakeOrderedAndProject, the q30 path) — plus the pool's
  * pairwise similarity matrix. The greedy selection is inherently
  * SEQUENTIAL over that bounded pool (k·poolK comparisons on ≤ poolK
  * rows), so it runs on the driver over the collected pool matrix — a
  * documented bounded artifact (poolK² tiny rows, constants of the
  * query), the same discipline as the collected IVF centroids.
  * Nothing corpus-sized ever reaches the driver.
  *
  * Output is (step, vec_id) only — ranks, not floating scores — the
  * q30 fp-safety discipline (DuckDB's cosine kernel can sit 1 ulp off
  * the engine's; random embeddings never tie within an ulp, so ranks
  * agree while raw doubles might hash-differ).
  */
object MmrRerank {

  val poolK = 20
  val k = 5
  val queryId = 0L

  /** q222: 5-of-20 MMR diversity selection for the vec_id-0 query.
    * Oracle: the same greedy unrolled as five chained CTE argmax
    * steps over the same pool and pairwise cosines. */
  val qMmr: GraftQuery = GraftQuery(
    "q222_mmr_rerank", {
      val steps = (2 to k).map { t =>
        val selPrev = (1 until t).map(i => s"SELECT vec_id FROM s$i").mkString(" UNION ALL ")
        s"""s$t AS (
           |  SELECT p.vec_id, p.rel FROM pool p
           |  WHERE p.vec_id NOT IN ($selPrev)
           |  ORDER BY 0.5 * p.rel - 0.5 * (
           |      SELECT MAX(s.s) FROM sim s
           |      WHERE s.ia = p.vec_id AND s.ib IN ($selPrev)) DESC,
           |    p.vec_id
           |  LIMIT 1)""".stripMargin
      }.mkString(",\n")
      val sel = (1 to k).map(i => s"SELECT $i AS step, vec_id FROM s$i")
        .mkString("\n  UNION ALL ")
      s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = $queryId),
         |scored AS MATERIALIZED (
         |  SELECT e.vec_id,
         |    list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), CAST(q.qe AS DOUBLE[])) AS rel
         |  FROM embeddings e, q WHERE e.vec_id <> $queryId),
         |pool AS MATERIALIZED (
         |  SELECT s.vec_id, s.rel, e.embedding
         |  FROM scored s JOIN embeddings e USING (vec_id)
         |  ORDER BY s.rel DESC, s.vec_id LIMIT $poolK),
         |sim AS MATERIALIZED (
         |  SELECT a.vec_id AS ia, b.vec_id AS ib,
         |    list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) AS s
         |  FROM pool a JOIN pool b ON a.vec_id <> b.vec_id),
         |s1 AS (SELECT vec_id, rel FROM pool ORDER BY rel DESC, vec_id LIMIT 1),
         |$steps
         |SELECT CAST(step AS INTEGER) AS step, vec_id
         |FROM ($sel)
         |ORDER BY step""".stripMargin
    }) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val q = emb.where(col("vec_id") === queryId).select(col("embedding").as("qe"))
    val scored = emb.where(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q)) // 1-row bounded broadcast (q63 shape)
      .select(col("vec_id"),
        Similarity.cosine(col("embedding"), col("qe")).as("rel"),
        col("embedding"))
    val pool = scored.orderBy(desc("rel"), asc("vec_id")).limit(poolK).persist()
    try {
      val rel: Map[Long, Double] = pool.select("vec_id", "rel")
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val sim: Map[(Long, Long), Double] = pool.as("a")
        .join(pool.as("b"), col("a.vec_id") =!= col("b.vec_id"))
        .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
          Similarity.cosine(col("a.embedding"), col("b.embedding")).as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // greedy MMR on the bounded pool (exactly the oracle's argmax:
      // score DESC, vec_id ASC)
      var selected = Vector.empty[Long]
      val ids = rel.keys.toSeq
      while (selected.size < k) {
        val best = ids.filterNot(selected.contains).map { id =>
          val score =
            if (selected.isEmpty) rel(id)
            else 0.5 * rel(id) - 0.5 * selected.map(sid => sim((id, sid))).max
          (score, id)
        }.minBy { case (score, id) => (-score, id) }
        selected :+= best._2
      }
      import s.implicits._
      selected.zipWithIndex
        .map { case (id, i) => (i + 1, id) }
        .toDF("step", "vec_id")
    } finally pool.unpersist(): Unit
  }

  def all: Seq[GraftQuery] = Seq(qMmr)
}
