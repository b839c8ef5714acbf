package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.CharGramVector

/** LEARNED quality gate — the CCNet-style classifier filter: train a
  * model to recognize "reference-like" text (here: label = source ==
  * 'src0' vs rest, the q65/q123 decontamination convention for which
  * slice plays the reference), then gate the corpus on the model
  * score. Complements the HEURISTIC gates (q22 ratios, q115 LM
  * fluency) as the funnel's learned stage.
  *
  * Two halves, split exactly like the IVF family (q50 fit / q55
  * fixed):
  *  - [[fit]]: a seeded, deterministic spark.ml logistic regression on
  *    [[CharGramVector]] features with class-balancing weights (25
  *    positives vs 475 negatives at sf0.01 — unweighted LR would
  *    collapse to the majority class). QualityGateSpec asserts the fit
  *    is reproducible and that quantizing its output reproduces the
  *    exported constants below.
  *  - q129: scoring with the FIXED exported weights. Quantizing every
  *    coefficient to the 2^-20 grid makes the logit a PURE EXACT
  *    expression: weight × integer-count products and their sums are
  *    exact doubles in ANY summation order, so Spark and DuckDB agree
  *    bit for bit and the gate decision (logit ≥ 0) can never flip on
  *    engine fp. (Sigmoid is deliberately NOT applied: exp() is not
  *    bit-specified across libm implementations; the logit carries the
  *    same ordering.)
  *
  * 100 TB: scoring is one narrow codegen pass per document (no
  * shuffle, no joins) — the cheapest gate in the funnel; training cost
  * is one pass over a bounded labeled sample, amortized across the
  * corpus like the IVF/PQ codebooks.
  */
object QualityGate {

  /** Exported from [[fit]] on sf0.01 (see QualityGateSpec provenance
    * test), quantized to k/2^20. Measured operating point there: keep
    * rate 0.92 on src0 vs 0.16 on the rest. */
  val bias: Double = -1.142411231994629
  val weights: IndexedSeq[Double] = IndexedSeq(
    -0.16290569305419922, -0.12430763244628906, -0.32548046112060547, -0.16827774047851562,
    -0.03877449035644531, 0.1688671112060547, -0.8552894592285156, -0.0801544189453125,
    -0.6421384811401367, 0.1550617218017578, -0.0777444839477539, 0.04508781433105469,
    -0.3737020492553711, 0.03616523742675781, 0.35146331787109375, 0.25523853302001953,
    -0.037690162658691406, 0.022741317749023438, -0.12296199798583984, -0.1789989471435547,
    -0.24200725555419922, -0.03730964660644531, 0.1735515594482422, 0.1421041488647461,
    -0.13147735595703125, -0.2600412368774414, -0.09338760375976562, 0.051918983459472656,
    0.0023651123046875, -0.1515064239501953, 0.1143798828125, -0.13912105560302734,
    -0.040986061096191406, -0.1576700210571289, -0.11336708068847656, -0.007912635803222656,
    0.08152389526367188, -0.4198465347290039, -0.028371810913085938, 0.14507293701171875,
    0.0728158950805664, -0.11701393127441406, 0.052402496337890625, 0.13298797607421875,
    -0.2266225814819336, 0.6622734069824219, -0.21930885314941406, -0.1291952133178711,
    0.04949760437011719, -0.16147899627685547, 0.1972208023071289, 0.23000621795654297,
    -0.04291534423828125, 0.3714714050292969, 0.22593212127685547, -0.2747840881347656,
    0.06164360046386719, 0.2592601776123047, 0.1760845184326172, 0.40121936798095703,
    0.028586387634277344, 0.0965261459350586, -0.007525444030761719, 0.3282327651977539
  )

  /** Deterministic training run (the provenance of the constants
    * above): balanced logistic regression over CharGramVector counts. */
  def fit(spark: SparkSession, sfDir: String): (IndexedSeq[Double], Double) = {
    val train = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        CharGramVector(col("text"), TextVector.dim).as("v"),
        (col("source") === "src0").cast("double").as("label"))
      .select(col("doc_id"),
        array_to_vector(col("v").cast("array<double>")).as("features"),
        col("label"))
      .withColumn("w", when(col("label") === 1.0, 19.0).otherwise(1.0))
      .repartition(32)
    val m = new LogisticRegression()
      .setMaxIter(100).setRegParam(0.01).setWeightCol("w")
      .fit(train)
    (m.coefficients.toArray.toIndexedSeq, m.intercept)
  }

  /** Quantize a fitted coefficient onto the exactness grid. */
  def quantize(x: Double): Double = math.rint(x * (1 << 20)) / (1 << 20)

  /** Exact logit of a CharGramVector column under the fixed weights. */
  def logitOf(v: Column): Column =
    weights.zipWithIndex.map { case (w, i) =>
      element_at(v, i + 1).cast("double") * lit(w)
    }.reduceLeft(_ + _) + lit(bias)

  /** The gate decision for a text column (used by the funnel). */
  def keepCol(textCol: Column): Column =
    logitOf(CharGramVector(textCol, TextVector.dim)) >= 0

  /** Every weight is k/2^20 with |k| < 2^21 and the toString form
    * round-trips, so embedding the plain decimal rendering in SQL
    * reparses to the identical double. */
  private def wSql(v: Double): String = {
    val s = v.toString
    assert(s.toDouble == v && v * (1 << 20) == math.rint(v * (1 << 20)),
      s"weight off the exactness grid: $v")
    // E0 forces DuckDB to type the literal DOUBLE directly: a bare
    // decimal is typed DECIMAL(18,17) and its DECIMAL->DOUBLE cast
    // double-rounds (unscaled->double then /10^17) — measured 1 ulp
    // off the correctly-rounded parse on 3/500 docs
    if (s.contains("E") || s.contains("e")) s else s + "E0"
  }

  // explicit left-assoc sum, NOT list_dot_product: DuckDB's
  // list_dot_product kernel is ~1 ulp off plain double arithmetic
  // (measured vs exact rational evaluation — Spark's fold IS exact),
  // and on-grid exactness is the whole point of the quantization
  private[operators] def dotSql: String =
    weights.zipWithIndex.map { case (w, i) =>
      s"(CAST(v[${i + 1}] AS DOUBLE) * ${wSql(w)})"
    }.mkString("(", " + ", s" + (${wSql(bias)}))")

  val qQualityGateScore: GraftQuery = GraftQuery(
    "q129_quality_gate_score",
    s"""WITH grams AS (
       |  ${TextVector.gramsSql}),
       |vecs AS (
       |  ${TextVector.vecSql})
       |SELECT doc_id,
       |  $dotSql AS logit,
       |  CAST($dotSql >= 0 AS INTEGER) AS keep
       |FROM vecs
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), CharGramVector(col("text"), TextVector.dim).as("v"))
      .select(col("doc_id"), logitOf(col("v")).as("logit"))
      .select(col("doc_id"), col("logit"),
        (col("logit") >= 0).cast("int").as("keep"))
      .orderBy("doc_id")
  }

  /** Histogram bin width for the bounded-state AUC form: 2^-4. The
    * bin index floor(logit·16) is exact integer arithmetic (scaling a
    * double by a power of two is exact), so binning is reproducible
    * bit for bit in both engines. */
  val aucBinScale = 16

  /** ROC-AUC of the learned gate against its own training label
    * (source = 'src0'), computed EXACTLY with integer arithmetic —
    * the model-eval query a curation pipeline runs after every
    * classifier refresh (CCNet ablates its quality filter the same
    * way).
    *
    * Two estimators in one row, deliberately:
    *  - `auc_exact`: Mann-Whitney rank-sum with tie correction.
    *    AUC = Σ_s pos_at(s)·(2·neg_below(s) + neg_at(s)) / (2·P·N)
    *    over distinct logit values s ascending. The numerator and
    *    denominator are pure BIGINT sums/products (order-independent,
    *    no fp accumulation), so the single final division is the only
    *    double op — correctly rounded identically in Spark and DuckDB.
    *  - `auc_binned`: the same rank-sum over logits bucketed to the
    *    2^-4 grid. This is the 100 TB form: per-doc bin is a narrow
    *    codegen pass, the groupBy carries BOUNDED cardinality (the
    *    logit range is data-bounded, ~few hundred bins), and the
    *    cumulative window runs over that bounded relation — no global
    *    sort of per-doc scores anywhere. Binning only converts
    *    within-bin orderings to ties, so |auc_binned − auc_exact| is
    *    bounded by the tie mass; the query reports both so the gap is
    *    measured, not assumed.
    *
    * Scale: `auc_exact` windows over DISTINCT logit values — fine
    * while distinct scores fit a task (they are near-unique per doc),
    * the honest reason the binned estimator exists. A 100 TB run
    * keeps only `auc_binned`. */
  val qGateAuc: GraftQuery = GraftQuery(
    "q167_gate_auc",
    s"""WITH grams AS (
       |  ${TextVector.gramsSql}),
       |vecs AS (
       |  ${TextVector.vecSql}),
       |scored AS (
       |  SELECT v.doc_id, $dotSql AS logit,
       |    CAST(d.source = 'src0' AS BIGINT) AS label
       |  FROM vecs v JOIN documents d ON v.doc_id = d.doc_id),
       |by_score AS (
       |  SELECT logit,
       |    CAST(SUM(label) AS BIGINT) AS pos_at,
       |    CAST(SUM(1 - label) AS BIGINT) AS neg_at
       |  FROM scored GROUP BY logit),
       |cum AS (
       |  SELECT pos_at, neg_at,
       |    CAST(COALESCE(SUM(neg_at) OVER (ORDER BY logit
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS neg_below
       |  FROM by_score),
       |exact AS (
       |  SELECT
       |    CAST(SUM(pos_at * (2 * neg_below + neg_at)) AS BIGINT) AS num,
       |    CAST(SUM(pos_at) AS BIGINT) AS npos,
       |    CAST(SUM(neg_at) AS BIGINT) AS nneg,
       |    CAST(COUNT(*) AS INTEGER) AS n_scores
       |  FROM cum),
       |by_bin AS (
       |  SELECT CAST(FLOOR(logit * $aucBinScale) AS BIGINT) AS bin,
       |    CAST(SUM(label) AS BIGINT) AS pos_at,
       |    CAST(SUM(1 - label) AS BIGINT) AS neg_at
       |  FROM scored GROUP BY 1),
       |bcum AS (
       |  SELECT pos_at, neg_at,
       |    CAST(COALESCE(SUM(neg_at) OVER (ORDER BY bin
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS neg_below
       |  FROM by_bin),
       |binned AS (
       |  SELECT
       |    CAST(SUM(pos_at * (2 * neg_below + neg_at)) AS BIGINT) AS bnum,
       |    CAST(COUNT(*) AS INTEGER) AS n_bins
       |  FROM bcum)
       |SELECT
       |  CAST(e.num AS DOUBLE) / CAST(2 * e.npos * e.nneg AS DOUBLE) AS auc_exact,
       |  CAST(b.bnum AS DOUBLE) / CAST(2 * e.npos * e.nneg AS DOUBLE) AS auc_binned,
       |  e.npos, e.nneg, e.n_scores, b.n_bins
       |FROM exact e CROSS JOIN binned b""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val scored = Tables.documents(s, d)
      .select(col("doc_id"),
        logitOf(CharGramVector(col("text"), TextVector.dim)).as("logit"),
        (col("source") === "src0").cast("bigint").as("label"))
    // rank-sum numerator over a grouped score relation: groupBy is
    // map-side-combined; the unpartitioned window is over the grouped
    // relation only (see scaladoc for why that is acceptable exactly
    // once, and what the 100 TB form keeps)
    def rankSum(grouped: DataFrame, orderCol: String): DataFrame = {
      val w = Window.orderBy(orderCol)
        .rowsBetween(Window.unboundedPreceding, -1)
      grouped
        .withColumn("neg_below", coalesce(sum("neg_at").over(w), lit(0L)))
        .agg(
          sum(col("pos_at") * (col("neg_below") * 2 + col("neg_at"))).as("num"),
          sum("pos_at").as("npos"), sum("neg_at").as("nneg"),
          count(lit(1)).cast("int").as("n_groups"))
    }
    val exact = rankSum(
      scored.groupBy("logit")
        .agg(sum("label").as("pos_at"), sum(lit(1L) - col("label")).as("neg_at")),
      "logit")
      .select(col("num"), col("npos"), col("nneg"), col("n_groups").as("n_scores"))
    val binned = rankSum(
      scored.select(floor(col("logit") * aucBinScale).as("bin"), col("label"))
        .groupBy("bin")
        .agg(sum("label").as("pos_at"), sum(lit(1L) - col("label")).as("neg_at")),
      "bin")
      .select(col("num").as("bnum"), col("n_groups").as("n_bins"))
    exact.crossJoin(binned)   // two 1-row aggregates
      .select(
        (col("num").cast("double") / (col("npos") * col("nneg") * 2).cast("double")).as("auc_exact"),
        (col("bnum").cast("double") / (col("npos") * col("nneg") * 2).cast("double")).as("auc_binned"),
        col("npos"), col("nneg"), col("n_scores"), col("n_bins"))
  }

  /** CALIBRATION TABLE (reliability diagram) — q167 compresses
    * ranking power to one number; this keeps the per-bin resolution:
    * for each 2^-4 logit bin, how many documents landed there and
    * what fraction are actually reference-class. Monotone-increasing
    * pos-rate across bins = the score is well-ordered; the bin
    * straddling zero shows exactly what the q129 keep decision trades
    * at the threshold. Counts and ppm rates are pure integers (the
    * q170 cross-multiplied discipline) — no estimator, no doubles
    * except none at all.
    *
    * 100 TB: one narrow codegen pass to (bin, label), one map-side-
    * combined groupBy over the BOUNDED bin alphabet. Cheapest
    * possible model-monitoring query; re-run per corpus snapshot and
    * diffed, it is the learned-gate drift monitor (q160's role for
    * the classifier). */
  val qGateCalibration: GraftQuery = GraftQuery(
    "q177_gate_calibration",
    s"""WITH grams AS (
       |  ${TextVector.gramsSql}),
       |vecs AS (
       |  ${TextVector.vecSql}),
       |scored AS (
       |  SELECT v.doc_id,
       |    CAST(FLOOR(($dotSql) * $aucBinScale) AS BIGINT) AS bin,
       |    CAST(d.source = 'src0' AS BIGINT) AS label
       |  FROM vecs v JOIN documents d ON v.doc_id = d.doc_id)
       |SELECT bin,
       |  CAST(bin >= 0 AS BOOLEAN) AS kept,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(label) AS BIGINT) AS n_ref,
       |  CAST(SUM(label) * 1000000 // COUNT(*) AS BIGINT) AS ref_rate_ppm
       |FROM scored
       |GROUP BY bin
       |ORDER BY bin""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(
        floor(logitOf(CharGramVector(col("text"), TextVector.dim)) * aucBinScale)
          .as("bin"),
        (col("source") === "src0").cast("bigint").as("label"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_docs"), sum("label").as("n_ref"))
      .select(col("bin"), (col("bin") >= 0).as("kept"), col("n_docs"),
        col("n_ref"),
        expr("n_ref * 1000000 div n_docs").as("ref_rate_ppm"))
      .orderBy("bin")
  }

  /** CROSS-SOURCE SCORE NORMALIZATION: each document's quality logit
    * mapped to its exact percentile WITHIN its source (integer ppm) —
    * the calibration step before mixing sources whose raw score
    * distributions differ (a web source's logits are not comparable
    * to a curated source's; percentiles are). pct_ppm =
    * (rank−1)·10⁶ div (n−1), with the degenerate single-doc source
    * pinned to 500000.
    *
    * The SCALE story is the ranking itself: a per-source window would
    * put each whole source on ONE task (the q175 exchange is fine,
    * per-source total order is not). Instead the q148 two-level
    * trick, applied to scores: shard each source by the logit's OWN
    * 2^-4 bin (a PREFIX of the sort order, so shards are value
    * ranges), rank within (source, bin) windows — bounded partitions
    * — and recover the exact source-wide rank by adding the
    * cumulative count of earlier bins (a bounded per-(source, bin)
    * histogram, broadcast back). The oracle states the semantics as
    * the plain per-source row_number; the hash match proves the
    * decomposition is exact. */
  val qScoreNormalize: GraftQuery = GraftQuery(
    "q181_score_normalize",
    s"""WITH grams AS (
       |  ${TextVector.gramsSql}),
       |vecs AS (
       |  ${TextVector.vecSql}),
       |scored AS (
       |  SELECT v.doc_id, d.source, $dotSql AS logit
       |  FROM vecs v JOIN documents d ON v.doc_id = d.doc_id),
       |ranked AS (
       |  SELECT doc_id, source, logit,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY logit, doc_id) AS rnk,
       |    COUNT(*) OVER (PARTITION BY source) AS n
       |  FROM scored)
       |SELECT doc_id, source, logit,
       |  CAST(rnk AS BIGINT) AS src_rank,
       |  CAST(CASE WHEN n > 1 THEN (rnk - 1) * 1000000 // (n - 1)
       |            ELSE 500000 END AS BIGINT) AS pct_ppm
       |FROM ranked
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val scored = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        logitOf(CharGramVector(col("text"), TextVector.dim)).as("logit"))
      .withColumn("bin", floor(col("logit") * aucBinScale))
    // bounded per-(source, bin) histogram → cumulative offset of all
    // EARLIER bins within the source
    val wOffset = Window.partitionBy("source").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = scored.groupBy("source", "bin")
      .agg(count(lit(1)).as("bin_n"))
      .withColumn("offset", coalesce(sum("bin_n").over(wOffset), lit(0L)))
      .select(col("source"), col("bin"), col("offset"))
    val totals = scored.groupBy("source").agg(count(lit(1)).as("n"))
    val wLocal = Window.partitionBy("source", "bin")
      .orderBy(col("logit"), col("doc_id"))
    scored
      .withColumn("local_rnk", row_number().over(wLocal))
      .join(broadcast(offsets), Seq("source", "bin"))
      .join(broadcast(totals), Seq("source"))
      .select(col("doc_id"), col("source"), col("logit"),
        (col("offset") + col("local_rnk")).as("src_rank"),
        when(col("n") > 1,
          expr("(offset + local_rnk - 1) * 1000000 div (n - 1)"))
          .otherwise(lit(500000L)).as("pct_ppm"))
      .orderBy("doc_id")
  }

  /** PER-FOLD AUC: q167's binned rank-sum evaluated independently on
    * the five doc_id-mod folds — the variance check behind a single
    * headline AUC (a gate whose fold AUCs disagree wildly is fit to
    * noise, whatever its pooled number says). Folds are deterministic
    * (doc_id % 5, the corpus's own split convention), the estimator
    * is the BOUNDED-state binned form only (the one a 100 TB eval
    * keeps, per q167's scaladoc), and everything is integer except
    * each fold's one final division.
    *
    * Plan: one narrow pass to (fold, bin, label), a map-side-combined
    * groupBy over fold × bin (bounded alphabet), a cumulative window
    * PARTITIONED BY FOLD over that bounded relation, five-row
    * output. */
  val qGateFoldAuc: GraftQuery = GraftQuery(
    "q185_gate_fold_auc",
    s"""WITH grams AS (
       |  ${TextVector.gramsSql}),
       |vecs AS (
       |  ${TextVector.vecSql}),
       |scored AS (
       |  SELECT CAST('0x' || substring(md5(CAST(v.doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 5 AS fold,
       |    CAST(FLOOR(($dotSql) * $aucBinScale) AS BIGINT) AS bin,
       |    CAST(d.source = 'src0' AS BIGINT) AS label
       |  FROM vecs v JOIN documents d ON v.doc_id = d.doc_id),
       |by_bin AS (
       |  SELECT fold, bin,
       |    CAST(SUM(label) AS BIGINT) AS pos_at,
       |    CAST(SUM(1 - label) AS BIGINT) AS neg_at
       |  FROM scored GROUP BY fold, bin),
       |cum AS (
       |  SELECT fold, pos_at, neg_at,
       |    CAST(COALESCE(SUM(neg_at) OVER (PARTITION BY fold ORDER BY bin
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS neg_below
       |  FROM by_bin)
       |SELECT fold,
       |  CAST(SUM(pos_at) AS BIGINT) AS npos,
       |  CAST(SUM(neg_at) AS BIGINT) AS nneg,
       |  CAST(COUNT(*) AS INTEGER) AS n_bins,
       |  CASE WHEN SUM(pos_at) = 0 OR SUM(neg_at) = 0 THEN NULL
       |       ELSE CAST(SUM(pos_at * (2 * neg_below + neg_at)) AS DOUBLE) /
       |            CAST(2 * SUM(pos_at) * SUM(neg_at) AS DOUBLE) END AS auc_binned
       |FROM cum
       |GROUP BY fold
       |ORDER BY fold""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val byBin = Tables.documents(s, d)
      .select(pmod(TrainingPipeline.gate32(col("doc_id")), lit(5L)).as("fold"),
        floor(logitOf(CharGramVector(col("text"), TextVector.dim)) * aucBinScale)
          .as("bin"),
        (col("source") === "src0").cast("bigint").as("label"))
      .groupBy("fold", "bin")
      .agg(sum("label").as("pos_at"), sum(lit(1L) - col("label")).as("neg_at"))
    val w = Window.partitionBy("fold").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, -1)
    byBin
      .withColumn("neg_below", coalesce(sum("neg_at").over(w), lit(0L)))
      .groupBy("fold")
      .agg(sum("pos_at").as("npos"), sum("neg_at").as("nneg"),
        count(lit(1)).cast("int").as("n_bins"),
        when(sum("pos_at") === 0 || sum("neg_at") === 0, lit(null).cast("double"))
          .otherwise(
            sum(col("pos_at") * (col("neg_below") * 2 + col("neg_at"))).cast("double") /
              (sum("pos_at") * sum("neg_at") * 2).cast("double"))
          .as("auc_binned"))
      .orderBy("fold")
  }

  /** CUMULATIVE GAINS / LIFT CHART for the quality gate — "if I keep
    * only the top-k/10 of documents by gate score, what fraction of
    * the src0 positives do I capture, and at what lift over random?"
    * (q167 compresses ranking power to one AUC; q177 checks
    * calibration; this is the third standard sheet — the one a
    * budget decision actually reads.) Deciles are cut best-first over
    * the DISTINCT-LOGIT census by the census-arithmetic rule
    * (min(9, 10·pw div tot), pw = docs with strictly higher score —
    * identical doubles group exactly in both engines); gains and lift
    * are exact cross-multiplied ppm.
    *
    * Scale (100 TB): the score census is one map-side-combinable
    * aggregate; deciles, gains and lift are windows over that census
    * — the q167 physics with decile resolution. */
  val qGateGains: GraftQuery = GraftQuery(
    "q297_gate_gains",
    s"""WITH grams AS (
       |  ${TextVector.gramsSql}),
       |vecs AS (
       |  ${TextVector.vecSql}),
       |scored AS (
       |  SELECT v.doc_id, $dotSql AS logit,
       |    CAST(d.source = 'src0' AS BIGINT) AS label
       |  FROM vecs v JOIN documents d ON v.doc_id = d.doc_id),
       |census AS (
       |  SELECT logit, CAST(COUNT(*) AS BIGINT) AS c,
       |    CAST(SUM(label) AS BIGINT) AS pos
       |  FROM scored GROUP BY logit),
       |cum AS (
       |  SELECT logit, c, pos,
       |    SUM(c) OVER (ORDER BY logit DESC ROWS UNBOUNDED PRECEDING) AS cw,
       |    SUM(c) OVER () AS tot
       |  FROM census),
       |binned AS (
       |  SELECT least(9, ((cw - c) * 10) // tot) AS decile,
       |    CAST(SUM(c) AS BIGINT) AS n_docs, CAST(SUM(pos) AS BIGINT) AS n_pos
       |  FROM cum GROUP BY 1),
       |gains AS (
       |  SELECT CAST(decile AS INTEGER) AS decile, n_docs, n_pos,
       |    CAST(SUM(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos,
       |    SUM(n_pos) OVER () AS tot_pos,
       |    SUM(n_docs) OVER () AS tot_docs
       |  FROM binned)
       |SELECT decile, n_docs, n_pos, cum_pos,
       |  CAST((cum_pos * 1000000) // tot_pos AS BIGINT) AS gains_ppm,
       |  CAST((n_pos * tot_docs * 1000000) // (n_docs * tot_pos) AS BIGINT) AS lift_ppm
       |FROM gains ORDER BY decile""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val scored = Tables.documents(s, d)
      .select(col("doc_id"),
        logitOf(CharGramVector(col("text"), TextVector.dim)).as("logit"),
        (col("source") === "src0").cast("bigint").as("label"))
    val census = scored.groupBy("logit")
      .agg(count(lit(1)).as("c"), sum("label").as("pos"))
    val cum = census
      .withColumn("cw", sum("c").over(Window.orderBy(col("logit").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum("c").over(Window.partitionBy()))
    val binned = cum
      .groupBy(least(lit(9L), expr("((cw - c) * 10) div tot")).as("decile"))
      .agg(sum("c").as("n_docs"), sum("pos").as("n_pos"))
    val gains = binned
      .withColumn("cum_pos", sum("n_pos").over(Window.orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot_pos", sum("n_pos").over(Window.partitionBy()))
      .withColumn("tot_docs", sum("n_docs").over(Window.partitionBy()))
    gains.select(col("decile").cast("int").as("decile"),
      col("n_docs"), col("n_pos"), col("cum_pos"),
      expr("(cum_pos * 1000000) div tot_pos").as("gains_ppm"),
      expr("(n_pos * tot_docs * 1000000) div (n_docs * tot_pos)").as("lift_ppm"))
      .orderBy("decile")
  }

  def all: Seq[GraftQuery] =
    Seq(qQualityGateScore, qGateAuc, qGateCalibration, qScoreNormalize,
      qGateFoldAuc, qGateGains)
}
