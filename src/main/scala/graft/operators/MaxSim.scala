package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.CharGramVector

/** LATE-INTERACTION (MaxSim) RETRIEVAL — the ColBERT scoring shape:
  * a document is a SET of vectors (one per q122 chunk), a query is a
  * set of term vectors, and the score is
  * `Σ_term max_chunk cos(term, chunk)` — each query term finds its
  * best-matching passage independently, so a document that answers
  * all the query's aspects in different paragraphs outranks one that
  * matches a single aspect strongly. Single-vector retrieval (q143)
  * collapses the doc first and cannot express this.
  *
  * Vectors are the exact-integer [[CharGramVector]] (dim 64) — chunk
  * side computed scan-fused, query side three fixed literal phrases
  * whose vectors are computed at object init by a pure-Scala mirror
  * of the expression's hash pipeline ([[charGramVec]],
  * MaxSimSpec-pinned equal to the expression) so the oracle can embed
  * them as exact integer literals.
  *
  * Exactness: every dot/norm is a sum of exact-integer products
  * (< 2⁵³ — exact in double on both engines, left-assoc mirrored);
  * the emitted cosine is the two-division CosineSimilarity op order;
  * MAX over identical value sets is identical; the 3-term sum is
  * spelled left-assoc on both sides.
  *
  * 100 TB: chunking + embedding + the 3 cosines fuse into the corpus
  * scan (zero exchanges); per-doc maxes are ONE map-side-combinable
  * aggregate; the top-10 is a TakeOrderedAndProject. A query TABLE
  * (RAG batch) rides a broadcast join exactly like q303's probe side
  * — per-(chunk, query-term) cost is unchanged. */
object MaxSim {

  val dim: Int = TextVector.dim

  /** The fixed multi-term query (each term ≥ 3 chars → nonzero grams). */
  val queryTerms: Seq[String] = Seq(
    "data quality pipeline",
    "stream processing state",
    "token budget sampling")

  /** Pure-Scala mirror of [[CharGramVector]]'s hash pipeline (gram
    * hash ((u1·961 + u2·31 + u3) · 2654435761) mod 2³², bucket h mod
    * dim, sign by bit 16) — lets query vectors be STATIC literals in
    * both engines; MaxSimSpec pins it equal to the expression. */
  private[graft] def charGramVec(text: String, dim: Int): Array[Long] = {
    val v = new Array[Long](dim)
    val cps = text.codePoints().toArray
    var i = 0
    while (i < cps.length - 2) {
      val h = ((cps(i).toLong * 961 + cps(i + 1).toLong * 31 + cps(i + 2).toLong)
        * 2654435761L) % 4294967296L
      val b = (h % dim).toInt
      v(b) += (if ((h / 65536L) % 2 == 0) 1L else -1L)
      i += 1
    }
    v
  }

  private val queryVecs: Seq[Array[Long]] = queryTerms.map(charGramVec(_, dim))

  /** cos(v, w) with w a literal integer vector — dot and norms as
    * left-assoc exact-integer sums, then the two-division op order. */
  private def cosToLit(v: Column, w: Array[Long]): Column = {
    val dot = (0 until dim).map(j =>
      element_at(v, j + 1).cast("double") * lit(w(j).toDouble)).reduceLeft(_ + _)
    val na = (0 until dim).map { j =>
      val e = element_at(v, j + 1).cast("double"); e * e
    }.reduceLeft(_ + _)
    val nb = w.map(x => x.toDouble * x.toDouble).reduceLeft(_ + _)
    dot / sqrt(na) / lit(math.sqrt(nb))
  }

  private def cosToLitSql(vExpr: String, w: Array[Long]): String = {
    val dot = (0 until dim).map(j =>
      s"(CAST($vExpr[${j + 1}] AS DOUBLE) * ${w(j)}.0)").mkString("(", " + ", ")")
    val na = (0 until dim).map(j =>
      s"(CAST($vExpr[${j + 1}] AS DOUBLE) * CAST($vExpr[${j + 1}] AS DOUBLE))")
      .mkString("(", " + ", ")")
    // nb is an exact integer-valued double; render exactly
    val nb = w.map(x => x.toDouble * x.toDouble).reduceLeft(_ + _)
    val nbStr = BigDecimal(nb).toBigInt.toString + ".0"
    s"($dot / sqrt($na) / sqrt($nbStr))"
  }

  private val chunkGramsSql: String =
    """SELECT doc_id, list_transform(range(1, length(chunk) - 1), i ->
      |    ((unicode(substring(chunk, CAST(i AS INTEGER), 1)) * 961
      |      + unicode(substring(chunk, CAST(i AS INTEGER) + 1, 1)) * 31
      |      + unicode(substring(chunk, CAST(i AS INTEGER) + 2, 1))) * 2654435761) % 4294967296) AS hs
      |  FROM chunks""".stripMargin

  private val chunkVecSql: String =
    s"""SELECT doc_id, list_transform(range(0, $dim), d ->
       |    CAST(coalesce(list_sum(list_transform(list_filter(hs, h -> h % $dim = d),
       |      h -> CASE WHEN (h // 65536) % 2 = 0 THEN 1 ELSE -1 END)), 0) AS BIGINT)) AS v
       |  FROM cgrams""".stripMargin

  val qMaxSim: GraftQuery = GraftQuery(
    "q313_maxsim_retrieval",
    s"""WITH ${TrainingPipeline.chunksCteSql},
       |cgrams AS (
       |  $chunkGramsSql),
       |cvecs AS (
       |  $chunkVecSql),
       |nz AS (
       |  SELECT doc_id, v FROM cvecs
       |  WHERE list_sum(list_transform(v, x -> abs(x))) > 0),
       |cscored AS (
       |  SELECT doc_id,
       |    ${queryVecs.zipWithIndex.map { case (w, i) =>
             s"${cosToLitSql("v", w)} AS c$i" }.mkString(",\n    ")}
       |  FROM nz),
       |mx AS (
       |  SELECT doc_id,
       |    ${queryVecs.indices.map(i => s"MAX(c$i) AS m$i").mkString(", ")}
       |  FROM cscored GROUP BY doc_id)
       |SELECT doc_id, m0, m1, m2, ((m0 + m1) + m2) AS maxsim
       |FROM mx
       |ORDER BY maxsim DESC, doc_id
       |LIMIT 10""".stripMargin) { (s, d) =>
    maxsimScores(Tables.documents(s, d))
      .orderBy(col("maxsim").desc, col("doc_id"))
      .limit(10)
  }

  /** Per-doc MaxSim scores (doc_id, m0..m2, maxsim) over an arbitrary
    * (doc_id, text) relation — shared by q313 and MaxSimSpec. */
  private[graft] def maxsimScores(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val chunkVecs = TrainingPipeline.chunkRelationOf(docs)
      .select(col("doc_id"), CharGramVector(col("chunk"), dim).as("v"))
      .where(aggregate(col("v"), lit(0L), (a, x) => a + abs(x)) > 0)
    val scored = chunkVecs.select(
      col("doc_id") +: queryVecs.zipWithIndex.map { case (w, i) =>
        cosToLit(col("v"), w).as(s"c$i")
      }: _*)
    scored.groupBy("doc_id")
      .agg(max(col("c0")).as("m0"), max(col("c1")).as("m1"),
        max(col("c2")).as("m2"))
      .select(col("doc_id"), col("m0"), col("m1"), col("m2"),
        ((col("m0") + col("m1")) + col("m2")).as("maxsim"))
  }

  def all: Seq[GraftQuery] = Seq(qMaxSim)
}
