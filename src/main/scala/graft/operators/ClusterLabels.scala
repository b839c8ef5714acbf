package graft.operators

import graft.GraftQuery
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** c-TF-IDF CLUSTER LABELING (the BERTopic labeling idea, made
  * exact): for every near-dup cluster (q77's component labels), the
  * top-3 DISTINCTIVE terms — tokens over-represented in the cluster
  * relative to the corpus. Labels turn an opaque cluster id into a
  * reviewable artifact ("what IS this template family?") — the human-
  * audit surface over q77/q161's keep/drop decisions.
  *
  * Scoring is the exact rational lift ( tf_c / T_c ) ÷ ( tf / T ) on
  * the 2⁻²⁰ fixed-point grid via 128-bit cross-multiplication
  * (q150's DECIMAL(38,0) pattern) — BERTopic's log-IDF shaping is
  * dropped deliberately: ln() is not bit-specified across engines
  * (the q63/q115 rule), and within-cluster RANKING by lift is
  * log-invariant anyway. Ties break on the token.
  *
  * Scale (100 TB): the corpus tf relation and the (cluster, term)
  * relation are both Zipf-compact aggregates of one token-stream
  * pass; the score join is compact×compact on the term key; the
  * per-cluster rank window is bounded by the cluster's own
  * vocabulary. The corpus total is a 1-row bounded broadcast (q63's
  * shape). Nothing doc×doc anywhere.
  */
object ClusterLabels {

  val topK = 3
  val scale = 1048576L // 2^20

  val qClusterLabels: GraftQuery = GraftQuery(
    "q225_cluster_labels",
    s"""WITH RECURSIVE ${Dedup.pairsCte},
       |edges AS (
       |  SELECT doc_a AS u, doc_b AS v FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(n, m) AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT r.n, e.v FROM reach r JOIN edges e ON r.m = e.u),
       |lbl AS (
       |  SELECT n AS doc_id, least(n, MIN(m)) AS cluster_id
       |  FROM reach GROUP BY n),
       |tok AS (
       |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
       |  FROM documents),
       |corpus AS (SELECT term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY term),
       |tot AS (SELECT CAST(count(*) AS BIGINT) AS t_all FROM tok),
       |ctok AS (
       |  SELECT l.cluster_id, t.term FROM tok t JOIN lbl l ON l.doc_id = t.doc_id),
       |cstat AS (
       |  SELECT cluster_id, term, CAST(count(*) AS BIGINT) AS tf_c
       |  FROM ctok GROUP BY cluster_id, term),
       |ctot AS (
       |  SELECT cluster_id, CAST(count(*) AS BIGINT) AS t_c
       |  FROM ctok GROUP BY cluster_id),
       |scored AS (
       |  SELECT s.cluster_id, s.term, s.tf_c,
       |    CAST(CAST(s.tf_c AS HUGEINT) * t.t_all * $scale
       |      // (CAST(c.tf AS HUGEINT) * ct.t_c) AS BIGINT) AS lift_q20
       |  FROM cstat s
       |  JOIN corpus c USING (term)
       |  JOIN ctot ct USING (cluster_id)
       |  CROSS JOIN tot t),
       |ranked AS (
       |  SELECT cluster_id, term, tf_c, lift_q20,
       |    ROW_NUMBER() OVER (PARTITION BY cluster_id
       |      ORDER BY lift_q20 DESC, term) AS rnk
       |  FROM scored)
       |SELECT cluster_id, CAST(rnk AS INTEGER) AS rnk, term, tf_c, lift_q20
       |FROM ranked WHERE rnk <= $topK
       |ORDER BY cluster_id, rnk""".stripMargin) { (s, d) =>
    def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    val labels = Dedup.indexedComponents(s, d)
      .select(col("node").as("doc_id"), col("label").as("cluster_id"))
    val tok = NgramStats.indexedDocToks(s, d)
      .select(col("doc_id"), explode(col("t")).as("term"))
    val corpus = tok.groupBy("term").agg(count(lit(1)).as("tf"))
    val tot = tok.agg(count(lit(1)).as("t_all"))
    val ctok = tok.join(labels, "doc_id")
    val cstat = ctok.groupBy("cluster_id", "term").agg(count(lit(1)).as("tf_c"))
    val ctot = ctok.groupBy("cluster_id").agg(count(lit(1)).as("t_c"))
    val scored = cstat
      .join(corpus, "term")
      .join(ctot, "cluster_id")
      .crossJoin(broadcast(tot))
      .withColumn("lift_q20", expr(
        s"""CAST(CAST(tf_c AS DECIMAL(38,0)) * t_all * $scale
           |  DIV (CAST(tf AS DECIMAL(38,0)) * t_c) AS BIGINT)""".stripMargin))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("cluster_id").orderBy(desc("lift_q20"), asc("term"))))
      .where(col("rnk") <= topK)
      .select(col("cluster_id"), col("rnk"), col("term"), col("tf_c"), col("lift_q20"))
      .orderBy("cluster_id", "rnk")
  }

  def all: Seq[GraftQuery] = Seq(qClusterLabels)
}
