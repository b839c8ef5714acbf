package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.CharGramVector

/** Engine-side text→vector featurization (north-star): the bridge
  * that lets the similarity tier run end-to-end from raw
  * `documents.text` instead of requiring a pre-baked embeddings
  * table. The featurizer is the codegen expression
  * [[org.apache.spark.sql.graftshim.CharGramVector]] — char-3-gram
  * hashing trick, exact integer accumulators, fully reproducible in
  * SQL — in the same expression family as HyperplaneSignature.
  *
  * Scale: one narrow pass per document (no shuffle to featurize), and
  * the downstream near-dup path inherits the LSH equi-join physics of
  * q48 — candidates come from signature buckets, never doc × doc.
  * Cosine and hyperplane signs are scale-invariant, so the integer
  * vectors skip normalization entirely and every comparison both
  * engines make is over exact values.
  */
object TextVector {

  val dim = 64

  /** SQL rebuild of [[CharGramVector.accumulate]]: gram hashes per
    * document (code-point indexed — DuckDB substring/length are
    * character-based, matching the expression's code-point alphabet). */
  private[operators] val gramsSql: String =
    """SELECT doc_id, list_transform(range(1, length(text) - 1), i ->
      |    ((unicode(substring(text, CAST(i AS INTEGER), 1)) * 961
      |      + unicode(substring(text, CAST(i AS INTEGER) + 1, 1)) * 31
      |      + unicode(substring(text, CAST(i AS INTEGER) + 2, 1))) * 2654435761) % 4294967296) AS hs
      |  FROM documents""".stripMargin

  // CAST to BIGINT: DuckDB list_sum yields HUGEINT, which would
  // type-mismatch Spark's LongType in the driver compare
  private[operators] val vecSql: String =
    s"""SELECT doc_id, list_transform(range(0, $dim), d ->
       |    CAST(coalesce(list_sum(list_transform(list_filter(hs, h -> h % $dim = d),
       |      h -> CASE WHEN (h // 65536) % 2 = 0 THEN 1 ELSE -1 END)), 0) AS BIGINT)) AS v
       |  FROM grams""".stripMargin

  /** The featurizer itself, oracle-checked value by value: gram count,
    * sparsity, L1 mass, and the first 8 accumulator dimensions — all
    * exact integers, so the hash match proves the full hash→bucket→
    * sign pipeline, not a float rendering. */
  val qTextVectorize: GraftQuery = GraftQuery(
    "q102_text_vectorize",
    s"""WITH grams AS (
       |  $gramsSql),
       |vecs AS (
       |  $vecSql)
       |SELECT g.doc_id,
       |  CAST(greatest(length(d.text) - 2, 0) AS INTEGER) AS n_grams,
       |  CAST(len(list_filter(v, x -> x <> 0)) AS INTEGER) AS nnz,
       |  CAST(list_sum(list_transform(v, x -> abs(x))) AS BIGINT) AS sum_abs,
       |  v[1] AS v1, v[2] AS v2, v[3] AS v3, v[4] AS v4,
       |  v[5] AS v5, v[6] AS v6, v[7] AS v7, v[8] AS v8
       |FROM grams g JOIN vecs USING (doc_id) JOIN documents d USING (doc_id)
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        CharGramVector(col("text"), dim).as("v"))
      .select(
        col("doc_id"),
        greatest(length(col("text")) - 2, lit(0)).as("n_grams"),
        size(filter(col("v"), x => x =!= 0L)).as("nnz"),
        aggregate(col("v"), lit(0L), (acc, x) => acc + abs(x)).as("sum_abs"),
        element_at(col("v"), 1).as("v1"), element_at(col("v"), 2).as("v2"),
        element_at(col("v"), 3).as("v3"), element_at(col("v"), 4).as("v4"),
        element_at(col("v"), 5).as("v5"), element_at(col("v"), 6).as("v6"),
        element_at(col("v"), 7).as("v7"), element_at(col("v"), 8).as("v8"))
      .orderBy("doc_id")
  }

  private def planeSqlList(p: Array[Int]): String =
    p.map(x => s"$x.0").mkString("[", ", ", "]")

  /** Table-0 hyperplane signature over the DOUBLE-cast int vector. */
  private val vSignatureSql: String =
    Similarity.hyperplanes.map(p =>
      s"(CASE WHEN list_dot_product(CAST(v AS DOUBLE[]), ${planeSqlList(p)}) >= 0 THEN '1' ELSE '0' END)")
      .mkString(" || ")

  /** End-to-end near-dup from RAW TEXT: featurize → LSH bucket →
    * exact cosine gate — the q48 pipeline with the engine's own
    * vectors instead of the pre-baked embeddings table. Plane dots
    * and cosines are over integer-valued vectors (exact in double in
    * both engines). Gate placement is measured, not guessed: same-
    * language unrelated pairs crowd 3-gram space up to cos ≈ 0.943
    * at sf0.1 while true near-dups score ≥ 0.964, so 0.955 sits
    * mid-gap at every tested SF (margin ~100 trillion ulps). */
  val qTextEmbedNearDup: GraftQuery = GraftQuery(
    "q103_text_embed_neardup",
    s"""WITH grams AS (
       |  $gramsSql),
       |vecs AS (
       |  $vecSql),
       |sigs AS (
       |  SELECT doc_id, CAST(v AS DOUBLE[]) AS v, $vSignatureSql AS bucket
       |  FROM vecs
       |  WHERE list_sum(list_transform(v, x -> abs(x))) > 0)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |FROM sigs a JOIN sigs b
       |  ON a.bucket = b.bucket AND a.doc_id < b.doc_id
       |WHERE list_cosine_similarity(a.v, b.v) >= 0.955
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    val vecs = Tables.documents(s, d)
      .select(col("doc_id"), CharGramVector(col("text"), dim).as("vl"))
      .where(aggregate(col("vl"), lit(0L), (acc, x) => acc + abs(x)) > 0)
      .select(col("doc_id"), col("vl").cast("array<float>").as("embedding"))
    val sigs = vecs.select(col("doc_id"), col("embedding"),
      Similarity.lshSignature(col("embedding")).as("bucket"))
    val a = sigs.select(col("doc_id").as("doc_a"), col("embedding").as("e_a"),
      col("bucket"))
    val b = sigs.select(col("doc_id").as("doc_b"), col("embedding").as("e_b"),
      col("bucket").as("bucket_b"))
    a.join(b, col("bucket") === col("bucket_b") && col("doc_a") < col("doc_b"))
      .where(Similarity.cosine(col("e_a"), col("e_b")) >= 0.955)
      .select("doc_a", "doc_b")
      .orderBy("doc_a", "doc_b")
  }

  def all: Seq[GraftQuery] = Seq(qTextVectorize, qTextEmbedNearDup)
}
