package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed PCA (top principal component) by EXACT integer power
  * iteration — the embedding-whitening primitive ahead of SemDeDup /
  * ANN (q116/q127 consume raw embeddings; production pipelines first
  * remove the dominant direction or whiten — Mu & Viswanath's
  * all-but-the-top observation for text embeddings).
  *
  * Everything is integer-exact, so the oracle matches bit-for-bit:
  *  - coordinates quantize to 2²⁰ units (floor — float→double is
  *    exact, one deterministic floor);
  *  - the SCATTER matrix S = n·Σxxᵀ − (Σx)(Σx)ᵀ (same eigenvectors
  *    as covariance, no division) accumulates in DECIMAL(38,0);
  *  - each power-iteration step is an integer matvec w = S·v followed
  *    by integer renormalization v′ = sign(w)·(|w|·2²⁰ div max|w|) —
  *    the div runs on NON-NEGATIVE operands only (trunc == floor, the
  *    cross-engine rule), with a fixed 8 iterations;
  *  - the reported eigenvalue is the exact Rayleigh pair
  *    (vᵀSv, vᵀv) plus its one double quotient.
  *
  * Scale (100 TB): the only corpus-sized work is ONE vec_id-keyed
  * self-join producing map-side-combinable (i, j) Gram sums — output
  * is the d×d census (4096 rows at d=64), after which all 8
  * iterations run on d² + d rows regardless of corpus size. At much
  * larger d the Gram pass batches coordinates (block outer products);
  * the iteration loop is unchanged. */
object Pca {

  val dim = 64
  val scaleU = 1048576L // 2^20
  val iters = 8

  private def isum(c: Column): Column = sum(c.cast("decimal(38,0)"))

  private def matvecSql(s: String, v: String, w: String): String =
    s"""$w AS MATERIALIZED (
       |  SELECT m.i, SUM(m.sv * v.vj) AS wi
       |  FROM $s m JOIN $v v ON v.j = m.j
       |  GROUP BY m.i)""".stripMargin

  private def rescaleSql(w: String, v: String): String =
    s"""${v}_m AS (SELECT greatest(MAX(abs(wi)), 1) AS m FROM $w),
       |$v AS MATERIALIZED (
       |  SELECT i AS j,
       |    (CASE WHEN wi < 0 THEN -1 ELSE 1 END)
       |      * ((abs(wi) * $scaleU) // (SELECT m FROM ${v}_m)) AS vj
       |  FROM $w)""".stripMargin

  val qPcaTop: GraftQuery = GraftQuery(
    "q275_pca_top_component",
    s"""WITH flat AS (
       |  SELECT vec_id, i.i,
       |    CAST(floor(CAST(embedding[i.i] AS DOUBLE) * $scaleU) AS BIGINT) AS q
       |  FROM embeddings
       |  CROSS JOIN (SELECT unnest(generate_series(1, $dim)) AS i) i),
       |nrow AS (SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n FROM flat),
       |sums AS (SELECT i, SUM(q) AS si FROM flat GROUP BY i),
       |gram AS (
       |  SELECT a.i AS i, b.i AS j, SUM(a.q * b.q) AS g
       |  FROM flat a JOIN flat b ON a.vec_id = b.vec_id
       |  GROUP BY a.i, b.i),
       |smat AS MATERIALIZED (
       |  SELECT g.i, g.j,
       |    (SELECT n FROM nrow) * g.g - sa.si * sb.si AS sv
       |  FROM gram g
       |  JOIN sums sa ON sa.i = g.i
       |  JOIN sums sb ON sb.i = g.j),
       |v0 AS (SELECT unnest(generate_series(1, $dim)) AS j, $scaleU AS vj),
       |${(1 to iters).map(k =>
          matvecSql("smat", s"v${k - 1}", s"w$k") + ",\n" +
            rescaleSql(s"w$k", s"v$k")).mkString(",\n")},
       |wf AS (
       |  SELECT m.i, SUM(m.sv * v.vj) AS wi
       |  FROM smat m JOIN v$iters v ON v.j = m.j
       |  GROUP BY m.i),
       |ray AS (
       |  SELECT SUM(w.wi * v.vj) AS num, SUM(v.vj * v.vj) AS den
       |  FROM wf w JOIN v$iters v ON v.j = w.i)
       |SELECT v.j AS idx, CAST(v.vj AS BIGINT) AS v_scaled,
       |  CAST(v.vj AS DOUBLE) / $scaleU.0 AS loading,
       |  CAST(r.num AS DOUBLE) / CAST(r.den AS DOUBLE) AS scatter_eig
       |FROM v$iters v CROSS JOIN ray r
       |ORDER BY idx""".stripMargin) { (s, d) =>
    val flat = Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("p", "x")))
      .select(col("vec_id"), (col("p") + 1).as("i"),
        floor(col("x").cast("double") * scaleU).cast("long").as("q"))
    val sums = flat.groupBy("i").agg(isum(col("q")).as("si"))
    val gram = flat.as("a")
      .join(flat.as("b").select(col("vec_id"), col("i").as("j"), col("q").as("qb")),
        "vec_id")
      .groupBy("i", "j").agg(isum(col("q") * col("qb")).as("g"))
    // n rides in on the census-wide window (gram is the d² census)
    val wAll = Window.partitionBy()
    val nRow = flat.select(countDistinct("vec_id").as("n"))
      .withColumn("one", lit(1))
    val smat = gram.withColumn("one", lit(1))
      .join(broadcast(nRow), "one")
      .join(broadcast(sums.select(col("i").as("ia"), col("si").as("sa"))),
        col("i") === col("ia"))
      .join(broadcast(sums.select(col("i").as("ib"), col("si").as("sb"))),
        col("j") === col("ib"))
      .select(col("i"), col("j"),
        (col("n") * col("g") - col("sa") * col("sb")).as("sv"))
      .localCheckpoint()

    def matvec(v: DataFrame): DataFrame =
      smat.join(v, "j").groupBy("i").agg(sum(col("sv") * col("vj")).as("wi"))

    def rescale(w: DataFrame): DataFrame = {
      val m = w.withColumn("m", greatest(max(abs(col("wi"))).over(wAll), lit(1L).cast("decimal(38,0)")))
      m.select(col("i").as("j"),
        (when(col("wi") < 0, -1L).otherwise(1L)
          * expr(s"(abs(wi) * $scaleU) div m")).cast("long").as("vj"))
    }

    var v: DataFrame = s.range(1, dim + 1)
      .select(col("id").as("j"), lit(scaleU).as("vj"))
    for (_ <- 1 to iters) v = rescale(matvec(v)).localCheckpoint()
    val wf = matvec(v)
    val ray = wf.join(v.withColumnRenamed("j", "i"), "i")
      .agg(sum(col("wi") * col("vj")).as("num"),
        sum(col("vj").cast("decimal(38,0)") * col("vj")).as("den"))
      .withColumn("one", lit(1))
    v.withColumn("one", lit(1)).join(broadcast(ray), "one")
      .select(col("j").as("idx"), col("vj").cast("long").as("v_scaled"),
        (col("vj").cast("double") / lit(scaleU.toDouble)).as("loading"),
        (col("num").cast("double") / col("den").cast("double")).as("scatter_eig"))
      .orderBy("idx")
  }

  val all: Seq[GraftQuery] = Seq(qPcaTop)
}
