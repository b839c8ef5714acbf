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

  /** Stage-2 renormalization (divide FIRST — the deflated operator's
    * magnitudes leave no room for the multiply-then-divide form):
    * vj = sign(w)·(|w| div max(m div 1024, 1)), landing near the
    * 2¹⁰ grid. Non-negative div only, mirrored exactly. */
  private def rescale2Sql(w: String, v: String): String =
    s"""${v}_m AS (SELECT greatest(MAX(abs(wi)) // 1024, 1) AS m FROM $w),
       |$v AS MATERIALIZED (
       |  SELECT i AS j,
       |    (CASE WHEN wi < 0 THEN -1 ELSE 1 END)
       |      * (abs(wi) // (SELECT m FROM ${v}_m)) AS vj
       |  FROM $w)""".stripMargin

  private def rescaleSql(w: String, v: String): String =
    s"""${v}_m AS (SELECT greatest(MAX(abs(wi)), 1) AS m FROM $w),
       |$v AS MATERIALIZED (
       |  SELECT i AS j,
       |    (CASE WHEN wi < 0 THEN -1 ELSE 1 END)
       |      * ((abs(wi) * $scaleU) // (SELECT m FROM ${v}_m)) AS vj
       |  FROM $w)""".stripMargin

  /** The CTE body computing v$iters (the scaled top component) from
    * the embeddings table — shared by q275's oracle and composers
    * (q277). Ends with the `v<iters>` relation (j, vj) in scope. */
  private[operators] def pcaCtesSql: String =
    s"""flat AS (
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
            rescaleSql(s"w$k", s"v$k")).mkString(",\n")}""".stripMargin

  /** Solved census: the scatter matrix as a relation (downstream
    * renderings join it), its collected cells (≤ d² rows — bounded
    * index metadata, the centroid-literal discipline; q300's deflation
    * algebra runs on them driver-side), and the top component as a
    * d-row local relation. */
  private[operators] final case class PcaParts(smat: DataFrame,
      cells: IndexedSeq[(Int, Int, BigInt)], v: DataFrame)

  /** Quantized (vec_id, qv) relation over an embeddings slice. */
  private[operators] def qvecOf(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), transform(col("embedding"),
      x => floor(x.cast("double") * scaleU).cast("long")).as("qv"))

  /** The per-slice MOMENT partials — upper-triangle Gram cells plus
    * coordinate sums plus the row count, all ADDITIVE (a monoid):
    * per-batch partials re-sum to the whole corpus's moments, which
    * is what makes PCA incrementally maintainable (q298). */
  private[graft] def gramPartial(emb: DataFrame): DataFrame = {
    val qvec = qvecOf(emb)
    val tri = qvec
      .agg(org.apache.spark.sql.graftshim.GramMatrix(col("qv"), dim).as("tri"),
        count(lit(1)).as("n"))
      .select(col("n"), explode(col("tri")).as("e"))
      .select(col("e.i").as("i"), col("e.j").as("j"),
        col("e.g").cast("decimal(38,0)").as("g"), col("n"))
    val sums = qvec.select(posexplode(col("qv")).as(Seq("p", "x")))
      .groupBy((col("p") + 1).as("i")).agg(isum(col("x")).as("si"))
    // one row per (i, j) cell carrying the slice's n and the i-sum
    // (duplicated per j — compact: ≤ d·(d+1)/2 rows per slice)
    tri.join(sums, "i")
  }

  /** Fold moment partials and run the fixed-iteration eigensolver —
    * shared by q275 (one partial over the whole corpus) and q298
    * (per-batch partials appended by the stream). */
  private[graft] def pcaFromPartials(s: org.apache.spark.sql.SparkSession,
      partials: DataFrame): PcaParts = {
    val tri = partials.groupBy("i", "j")
      .agg(sum("g").cast("decimal(38,0)").as("g"))
      .localCheckpoint()
    val gram = tri.unionByName(tri.where(col("i") =!= col("j"))
      .select(col("j").as("i"), col("i").as("j"), col("g")))
    // si and n ride duplicated across a slice's (i, j) rows: the
    // diagonal (j = i) carries each (slice, i) exactly once, and cell
    // (1, 1) carries each slice's n exactly once — so the folds below
    // are exact sums over slices, never double-counted
    buildAndIterate(s, gram,
      partials.where(col("j") === col("i"))
        .groupBy("i").agg(sum(col("si")).as("si")),
      partials.where(col("i") === 1 && col("j") === 1)
        .agg(sum(col("n")).as("n")))
  }

  private def buildAndIterate(s: org.apache.spark.sql.SparkSession,
      gram: DataFrame, sums: DataFrame, nRow0: DataFrame): PcaParts = {
    val nRow = nRow0.withColumn("one", lit(1))
    val smat = gram.withColumn("one", lit(1))
      .join(broadcast(nRow), "one")
      .join(broadcast(sums.select(col("i").as("ia"), col("si").as("sa"))),
        col("i") === col("ia"))
      .join(broadcast(sums.select(col("i").as("ib"), col("si").as("sb"))),
        col("j") === col("ib"))
      .select(col("i"), col("j"),
        (col("n") * col("g") - col("sa") * col("sb")).as("sv"))
      .localCheckpoint()

    // The power iteration runs DRIVER-SIDE over the collected census:
    // smat is ≤ d² rows (4096 at d=64) of exact integers — bounded
    // index metadata, the centroid-literal discipline. The r12 form
    // ran each of the 8 rounds as join + agg + global-window +
    // localCheckpoint Spark jobs over those same ≤4096 rows (~0.3 s of
    // pure stage latency per round, ×3 catalog queries in the family);
    // the arithmetic here is IDENTICAL and exact — BigInt matvec,
    // m = max(max|wi|, 1), v′ = sign(wi)·(|wi|·2²⁰ div m) on
    // non-negative operands (trunc == floor, the cross-engine rule).
    // PcaSpec's independent BigInt replay pins the equality.
    val cells: IndexedSeq[(Int, Int, BigInt)] = smat.collect().toIndexedSeq
      .map(r => (r.get(0).asInstanceOf[Number].intValue,
        r.get(1).asInstanceOf[Number].intValue,
        BigInt(r.getDecimal(2).toBigInteger)))
    // |wi|·2²⁰ must stay inside the ORACLE's HUGEINT/DECIMAL(38,0)
    // budget (|wi| can reach ~2⁶⁷·n² — binds near 10⁶ worst-case
    // vectors). BigInt cannot overflow, but past the bound the DuckDB
    // side would — fail LOUDLY on the same contract as before; past
    // it, adopt the deflated operator's divide-first rescale2 form on
    // BOTH engines. Bound 9e31 ≈ (10³⁸−1)/2²⁰ with margin.
    val budget = BigInt("9" + "0" * 31)
    var v: IndexedSeq[BigInt] = IndexedSeq.fill(dim)(BigInt(scaleU))
    for (_ <- 1 to iters) {
      val w = Array.fill(dim)(BigInt(0))
      cells.foreach { case (i, j, sv) => w(i - 1) += sv * v(j - 1) }
      val m = w.iterator.map(_.abs).max.max(BigInt(1))
      require(m <= budget,
        "q275 rescale: max|wi| exceeds the 38-digit multiply-" +
          "then-divide budget — switch to the divide-first form")
      v = w.toIndexedSeq.map(wi =>
        (if (wi < 0) BigInt(-1) else BigInt(1)) * (wi.abs * scaleU / m))
    }
    import s.implicits._
    // j is INT (the census cell index's type — downstream renderings
    // and specs read it as such); vj is the scaled LONG component
    val vDf = v.zipWithIndex
      .map { case (vj, idx) => (idx + 1, vj.toLong) }
      .toDF("j", "vj")
    PcaParts(smat, cells, vDf)
  }

  /** The exact scatter matrix and scaled integer top component over
    * the whole embeddings table — ONE moment partial folded. */
  private[operators] def pcaParts(s: org.apache.spark.sql.SparkSession,
      d: String): PcaParts =
    pcaFromPartials(s, gramPartial(Tables.embeddings(s, d)))

  val qPcaTop: GraftQuery = GraftQuery(
    "q275_pca_top_component",
    s"""WITH $pcaCtesSql,
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
    pcaReport(pcaParts(s, d))
  }

  /** q275's output rendering over a solved PcaParts — shared with the
    * streaming maintenance (q298). */
  private[graft] def pcaReport(parts: PcaParts): DataFrame = {
    val v = parts.v
    val wf = parts.smat.join(v, "j").groupBy("i")
      .agg(sum(col("sv") * col("vj")).as("wi"))
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

  /** ALL-BUT-THE-TOP residual similarity: remove q275's dominant
    * direction from every embedding and rank neighbors on the
    * RESIDUAL — the Mu & Viswanath post-processing that stops one
    * frequency/length axis from dominating every cosine (the hubness
    * fix ahead of SemDeDup). Exact end-to-end: the residual is the
    * integer vector r = e·(vᵀv) − (eᵀv)·v (orthogonal to v by
    * construction — the spec checks rᵀv = 0 exactly), re-quantized to
    * int8-style codes by non-negative integer division with a sign
    * split, and neighbors rank on sign(dot)·(dot²·10⁶ div na·nb) —
    * monotone in the residual cosine, pure integers.
    *
    * Scale (100 TB): the pairwise stage is a COORDINATE equi-join
    * (the 8×d query codes join the corpus codes on the dimension
    * index — never a nested-loop or an all-pairs), one shuffle, then
    * a map-side-combinable (query, neighbor) sum; everything upstream
    * is q275's census physics plus two narrow per-vector joins. */
  val qResidualTopK: GraftQuery = GraftQuery(
    "q277_residual_topk",
    s"""WITH $pcaCtesSql,
       |vv AS (SELECT SUM(vj * vj) AS s FROM v$iters),
       |dots AS (
       |  SELECT f.vec_id, SUM(f.q * v.vj) AS p
       |  FROM flat f JOIN v$iters v ON v.j = f.i
       |  GROUP BY f.vec_id),
       |resid AS (
       |  SELECT f.vec_id, f.i,
       |    f.q * (SELECT s FROM vv) - d.p * v.vj AS r
       |  FROM flat f
       |  JOIN dots d ON d.vec_id = f.vec_id
       |  JOIN v$iters v ON v.j = f.i),
       |mx AS (
       |  SELECT vec_id, greatest(MAX(abs(r)), 1) AS m
       |  FROM resid GROUP BY vec_id),
       |codes AS MATERIALIZED (
       |  SELECT r.vec_id, r.i,
       |    (CASE WHEN r.r < 0 THEN -1 ELSE 1 END) * ((abs(r.r) * 127) // m.m) AS c
       |  FROM resid r JOIN mx m ON m.vec_id = r.vec_id),
       |norms AS (
       |  SELECT vec_id, SUM(c * c) AS nn FROM codes GROUP BY vec_id),
       |pairs AS (
       |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
       |    SUM(q.c * n.c) AS dot
       |  FROM (SELECT * FROM codes WHERE vec_id < 8) q
       |  JOIN codes n ON n.i = q.i AND n.vec_id <> q.vec_id
       |  GROUP BY q.vec_id, n.vec_id),
       |scored AS (
       |  SELECT p.query_id, p.neighbor_id, CAST(p.dot AS BIGINT) AS dot,
       |    CAST((CASE WHEN p.dot < 0 THEN -1 ELSE 1 END)
       |      * ((p.dot * p.dot * 1000000) // greatest(na.nn * nb.nn, 1))
       |      AS BIGINT) AS skey
       |  FROM pairs p
       |  JOIN norms na ON na.vec_id = p.query_id
       |  JOIN norms nb ON nb.vec_id = p.neighbor_id),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY skey DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, dot, skey
       |FROM ranked WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
    val parts = pcaParts(s, d)
    val v = parts.v
    val flat = Tables.embeddings(s, d)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("p", "x")))
      .select(col("vec_id"), (col("p") + 1).as("i"),
        floor(col("x").cast("double") * scaleU).cast("long").as("q"))
    val vv = v.agg(sum(col("vj").cast("decimal(38,0)") * col("vj")).as("s"))
      .withColumn("one", lit(1))
    val dots = flat.join(broadcast(v.withColumnRenamed("j", "i")), "i")
      .groupBy("vec_id").agg(isum(col("q") * col("vj")).as("p"))
    val resid = flat
      .join(dots, "vec_id")
      .join(broadcast(v.withColumnRenamed("j", "i")
        .withColumnRenamed("vj", "vji")), "i")
      .withColumn("one", lit(1))
      .join(broadcast(vv), "one")
      .select(col("vec_id"), col("i"),
        (col("q").cast("decimal(38,0)") * col("s")
          - col("p") * col("vji")).as("r"))
    val mx = resid.groupBy("vec_id")
      .agg(greatest(max(abs(col("r"))), lit(1L).cast("decimal(38,0)")).as("m"))
    val codes = resid.join(mx, "vec_id")
      .select(col("vec_id"), col("i"),
        (when(col("r") < 0, -1L).otherwise(1L)
          * expr("(abs(r) * 127) div m")).cast("long").as("c"))
      .localCheckpoint()
    val norms = codes.groupBy("vec_id").agg(sum(col("c") * col("c")).as("nn"))
    val pairs = codes.where(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("i"), col("c").as("qc"))
      .join(codes.select(col("vec_id").as("neighbor_id"), col("i"), col("c")),
        Seq("i"))
      .where(col("neighbor_id") =!= col("query_id"))
      .groupBy("query_id", "neighbor_id")
      .agg(sum(col("qc") * col("c")).as("dot"))
    val scored = pairs
      .join(norms.select(col("vec_id").as("query_id"), col("nn").as("na")), "query_id")
      .join(norms.select(col("vec_id").as("neighbor_id"), col("nn").as("nb")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), col("dot").cast("long").as("dot"),
        (when(col("dot") < 0, -1L).otherwise(1L)
          * expr("(dot * dot * 1000000) div greatest(na * nb, 1)"))
          .cast("long").as("skey"))
    val w = Window.partitionBy("query_id").orderBy(col("skey").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= 5)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("dot"), col("skey"))
      .orderBy("query_id", "rank")
  }

  /** SECOND PRINCIPAL COMPONENT by EXACT integer deflation. The top
    * component v₁ (re-quantized to 2¹⁰ units so every deflated term
    * fits DECIMAL(38,0)) is removed from the scatter matrix by the
    * projector identity S′ = c²·S − c·(u·wᵀ + w·uᵀ) + r·u·uᵀ with
    * u = v₁, w = S·u, c = uᵀu, r = uᵀS·u — algebra gives S′·u = 0
    * EXACTLY (the spec replays it in BigInt), so the same fixed
    * 8-iteration integer solver on S′ converges to the second
    * direction. Deflation is against the QUANTIZED v₁ (the honest
    * contract: the removed direction is exactly the one q275
    * reports, to its own grid).
    *
    * Scale (100 TB): zero new corpus work — S, u, w, c, r all derive
    * from the d² census q275 already built; deflation and the second
    * iteration run on d²+d rows. This is why the scatter-census
    * factoring matters: every additional component is census-only. */
  val qPcaSecond: GraftQuery = GraftQuery(
    "q300_pca_second_component",
    s"""WITH $pcaCtesSql,
       |u AS (SELECT j,
       |  (CASE WHEN vj < 0 THEN -1 ELSE 1 END) * ((abs(vj) * 256) // $scaleU) AS uj
       |  FROM v$iters),
       |c1 AS (SELECT SUM(uj * uj) AS c FROM u),
       |w AS (
       |  SELECT m.i, SUM(m.sv * u.uj) AS wi
       |  FROM smat m JOIN u ON u.j = m.j
       |  GROUP BY m.i),
       |r1 AS (
       |  SELECT SUM(w.wi * u.uj) AS r
       |  FROM w JOIN u ON u.j = w.i),
       |smat2raw AS MATERIALIZED (
       |  SELECT m.i, m.j,
       |    (SELECT c FROM c1) * (SELECT c FROM c1) * m.sv
       |      - (SELECT c FROM c1) * (ua.uj * wb.wi + wa.wi * ub.uj)
       |      + (SELECT r FROM r1) * ua.uj * ub.uj AS sv
       |  FROM smat m
       |  JOIN u ua ON ua.j = m.i
       |  JOIN u ub ON ub.j = m.j
       |  JOIN w wa ON wa.i = m.i
       |  JOIN w wb ON wb.i = m.j),
       |smat2 AS MATERIALIZED (
       |  SELECT i, j, sv // $scaleU AS sv
       |  FROM smat2raw),
       |y0 AS (SELECT unnest(generate_series(1, $dim)) AS j, 1024 AS vj),
       |${(1 to iters).map(k =>
          matvecSql("smat2", s"y${k - 1}", s"z$k") + ",\n" +
            rescale2Sql(s"z$k", s"y$k")).mkString(",\n")},
       |zf AS (
       |  SELECT m.i, SUM(m.sv * v.vj) AS wi
       |  FROM smat2 m JOIN y$iters v ON v.j = m.j
       |  GROUP BY m.i),
       |ray2 AS (
       |  SELECT SUM(z.wi * v.vj) AS num, SUM(v.vj * v.vj) AS den
       |  FROM zf z JOIN y$iters v ON v.j = z.i),
       |ortho AS (
       |  SELECT SUM(v.vj * u.uj) AS uv, SUM(abs(v.vj)) AS vabs
       |  FROM y$iters v JOIN u ON u.j = v.j)
       |SELECT v.j AS idx, CAST(v.vj AS BIGINT) AS v_scaled,
       |  CAST(v.vj AS DOUBLE) / 1024.0 AS loading,
       |  CAST(r.num AS DOUBLE) / CAST(r.den AS DOUBLE) AS deflated_eig,
       |  CAST(o.uv AS BIGINT) AS u_dot_v
       |FROM y$iters v CROSS JOIN ray2 r CROSS JOIN ortho o
       |ORDER BY idx""".stripMargin) { (s, d) =>
    val parts = pcaParts(s, d)
    // The deflation algebra and second iteration run DRIVER-SIDE over
    // the collected census (PcaParts.cells, ≤ d² exact integers) —
    // zero new Spark jobs beyond the census q275 already built. The
    // r12 form staged u/w/c/r/smat2 as five checkpointed relations and
    // ran 8 more join+agg+window rounds over ≤4096 rows (q300 measured
    // 4.8 s isolated at sf0.1; ~1.8 s after). Every operation below is
    // the same exact integer arithmetic (BigInt; floor division made
    // explicit where operands can be negative), so the oracle hash and
    // PcaSpec's BigInt deflation replay are unchanged.
    import s.implicits._
    val vTop: IndexedSeq[BigInt] = parts.v.collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      .map(t => BigInt(t._2)).toIndexedSeq
    // sign-split re-quantization to 2^10 units: trunc == floor on the
    // non-negative |vj| (the cross-engine rule)
    val u: IndexedSeq[BigInt] = vTop.map { vj =>
      val a = vj.abs * 256 / scaleU; if (vj < 0) -a else a
    }
    val w = Array.fill(dim)(BigInt(0))
    parts.cells.foreach { case (i, j, sv) => w(i - 1) += sv * u(j - 1) }
    val c = u.map(x => x * x).sum
    val r = (0 until dim).map(i => w(i) * u(i)).sum
    // S′ = c²·S − c·(u·wᵀ + w·uᵀ) + r·u·uᵀ, quantized to its own
    // 2^-20 grid by FLOOR division (svr can be negative — BigInt `/`
    // truncates, so adjust; matches DuckDB `//` and the r12
    // (x − pmod(x, s))/s spelling)
    def floorDiv(x: BigInt, d0: BigInt): BigInt = {
      val q = x / d0; if (x.sign < 0 && q * d0 != x) q - 1 else q
    }
    val grid = BigInt(scaleU)
    val cells2: IndexedSeq[(Int, Int, BigInt)] = parts.cells.map {
      case (i, j, sv) =>
        val svr = c * c * sv - c * (u(i - 1) * w(j - 1) + w(i - 1) * u(j - 1)) +
          r * u(i - 1) * u(j - 1)
        (i, j, floorDiv(svr, grid))
    }
    def matvec2(y: IndexedSeq[BigInt]): IndexedSeq[BigInt] = {
      val z = Array.fill(dim)(BigInt(0))
      cells2.foreach { case (i, j, sv) => z(i - 1) += sv * y(j - 1) }
      z.toIndexedSeq
    }
    var y: IndexedSeq[BigInt] = IndexedSeq.fill(dim)(BigInt(1024))
    for (_ <- 1 to iters) {
      val z = matvec2(y)
      // divide-first rescale: m = max(⌊max|wi|/2^10⌋, 1), then
      // sign·(|wi| div m) — all divisions on non-negative operands
      val m = (z.iterator.map(_.abs).max / 1024).max(BigInt(1))
      y = z.map(wi => (if (wi < 0) BigInt(-1) else BigInt(1)) * (wi.abs / m))
    }
    val zf = matvec2(y)
    val num = (0 until dim).map(i => zf(i) * y(i)).sum
    val den = y.map(x => x * x).sum
    val uv = (0 until dim).map(i => y(i) * u(i)).sum
    // idx stays INT (the census index type, as the iterative form
    // produced); scaled values stay LONG
    (1 to dim).map { j =>
      (j, y(j - 1).toLong, y(j - 1).toDouble / 1024.0,
        num.toDouble / den.toDouble, uv.toLong)
    }.toDF("idx", "v_scaled", "loading", "deflated_eig", "u_dot_v")
      .orderBy("idx")
  }

  val all: Seq[GraftQuery] = Seq(qPcaTop, qResidualTopK, qPcaSecond)
}
