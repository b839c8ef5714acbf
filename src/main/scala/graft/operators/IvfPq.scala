package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** IVF-PQ composition — the production serving shape for memory-bound
  * ANN, closing the gap q114 left open: q114's ADC scan touches every
  * code row, while a real PQ index routes through a coarse quantizer
  * first (probe a few cells, ADC only within them, exact re-rank of
  * the survivors). Both halves already exist — q55's deterministic
  * fixed-centroid routing and q114's exact-literal ADC — and q127 is
  * their composition, oracle-checked end to end.
  *
  * Pipeline (one fixed exact-half query vector, [[PqAnn.query]]):
  *  1. coarse cells: every `fixedStride`th corpus vector is a
  *     centroid; every vector is assigned to its max-cosine cell by
  *     the fused NearestCentroid scan expression (q55 machinery).
  *  2. route the query to its `nProbe` best cells (tiny: |cells| rows
  *     through a TakeOrderedAndProject).
  *  3. PQ-encode and ADC-score ONLY the probed cells: a broadcast
  *     left-semi join on the cell id gates the scan before any code
  *     arithmetic runs.
  *  4. top-`adcCand` by ADC distance, exact re-rank, top-`k`.
  *
  * 100 TB notes: the codes table is ~32× smaller than the vectors and
  * PARTITIONED BY CELL on disk in a production index, so step 3's
  * semi-join becomes partition pruning — the scan reads nProbe/|cells|
  * of the codes. Per query the engine touches |cells| centroid rows +
  * probed-cell codes + adcCand full vectors, never the corpus. The
  * probed fraction shrinks as the corpus grows (cell count scales with
  * the data at fixed stride). PlanAuditSpec pins the gating: the ADC
  * top-k's input subtree must contain the semi-join.
  *
  * Oracle discipline: centroids and assignment are deterministic
  * (q55), the codebook/query/LUT are exact binary fractions (q114), so
  * rows+schema+hash must match DuckDB's from-scratch rebuild.
  */
object IvfPq {

  val nProbe = 4
  val adcCand = 50
  val k = 10

  private def qLitSql: String =
    PqAnn.query.map(PqAnn.sqlNum).mkString("[", ", ", "]")

  /** Spark-side literal query as ARRAY<FLOAT> (exact halves are exact
    * in float, so the float path loses nothing). */
  private def qLitF = array(PqAnn.query.map(v => lit(v.toFloat)): _*)

  val qIvfPqTopK: GraftQuery = {
    val lutSql = (0 until PqAnn.subspaces).map { s =>
      val l = PqAnn.lut(s).map(PqAnn.sqlNum).mkString("[", ", ", "]")
      s"CAST($l[c$s + 1] AS DOUBLE)"
    }.mkString("(", " + ", ")")
    GraftQuery(
      "q127_ivfpq_topk",
      s"""WITH centroids AS (
         |  SELECT vec_id AS cell, embedding AS c_emb FROM embeddings
         |  WHERE vec_id % ${IvfAnn.fixedStride} = 0),
         |scored_assign AS (
         |  SELECT e.vec_id, e.embedding, c.cell,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${IvfAnn.cosSql.format("e.embedding", "c.c_emb")} DESC,
         |        c.cell) AS rn
         |  FROM embeddings e CROSS JOIN centroids c),
         |cells AS (
         |  SELECT vec_id, embedding, cell FROM scored_assign WHERE rn = 1),
         |probes AS (
         |  SELECT cell FROM (
         |    SELECT cell, row_number() OVER (ORDER BY
         |      list_cosine_similarity(CAST(c_emb AS DOUBLE[]),
         |        CAST($qLitSql AS DOUBLE[])) DESC, cell) AS r
         |    FROM centroids) WHERE r <= $nProbe),
         |coded AS (
         |  SELECT m.vec_id, m.embedding, m.cell,
         |    ${(0 until PqAnn.subspaces).map(s => s"${PqAnn.codeSql(s)} AS c$s").mkString(",\n    ")}
         |  FROM cells m JOIN probes p ON m.cell = p.cell),
         |adc AS (
         |  SELECT vec_id, embedding, cell, $lutSql AS adc_dist FROM coded),
         |cand AS (
         |  SELECT * FROM adc ORDER BY adc_dist, vec_id LIMIT $adcCand)
         |SELECT vec_id, cell, adc_dist, ${PqAnn.exactDistSql} AS exact_dist
         |FROM cand
         |ORDER BY exact_dist, vec_id
         |LIMIT $k""".stripMargin) { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val centroids = IvfAnn.fixedCentroids(emb, IvfAnn.fixedStride)
      val assigned = IvfAnn.assign(emb, centroids)
      val probes = centroids
        .select(col("cell"),
          org.apache.spark.sql.graftshim.CosineSimilarity(
            col("centroid"), qLitF).as("q_sim"))
        .orderBy(col("q_sim").desc, col("cell"))
        .limit(nProbe)
        .select(col("cell").cast("long").as("cell"))
      // gate BEFORE encoding: only probed-cell rows pay PqEncode + ADC
      val gated = assigned.join(broadcast(probes), Seq("cell"), "left_semi")
      val coded = gated
        .select(col("vec_id"), col("embedding"), col("cell"),
          org.apache.spark.sql.graftshim.PqEncode(col("embedding"), PqAnn.codebook)
            .as("codes"))
      val adcDist = (0 until PqAnn.subspaces).map { i =>
        element_at(array(PqAnn.lut(i).map(lit): _*),
          element_at(col("codes"), i + 1) + 1)
      }.reduceLeft(_ + _)
      val cand = coded
        .withColumn("adc_dist", adcDist)
        .orderBy(col("adc_dist"), col("vec_id"))
        .limit(adcCand)
      cand
        .select(col("vec_id"), col("cell"), col("adc_dist"),
          PqAnn.exactDist.as("exact_dist"))
        .orderBy(col("exact_dist"), col("vec_id"))
        .limit(k)
    }
  }

  def all: Seq[GraftQuery] = Seq(qIvfPqTopK)
}
