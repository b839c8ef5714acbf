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

  def all: Seq[GraftQuery] = Seq(qQualityGateScore)
}
