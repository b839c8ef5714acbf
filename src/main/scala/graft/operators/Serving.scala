package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The serving-layer parity capstone — the reference's interactive
  * fare-prediction tool (/root/reference/Data-Insights/Application.py:
  * 28-124) re-expressed as ONE engine plan instead of a per-request
  * Python loop:
  *
  *   NL request text → T1 regex extract-all numerics
  *   (Application.py:34-35) → T4 positional mapping + imputation
  *   cascade (Application.py:37-75) → M5 model predict, 2dp-rounded
  *   (Application.py:16-23)
  *
  * The reference handles ONE request per call; the engine form is the
  * same cascade as per-row column expressions over a request RELATION
  * — at 100 TB of request logs this is one codegen'd projection plus
  * a distributed model transform, zero per-request driver work.
  *
  * Cascade semantics pinned to the reference, including its corners:
  *   - numerics map positionally to [distance, passengers, duration,
  *     speed, rate_code, payment] (Application.py:37-43);
  *   - `int()` on the float passenger/rate/payment values truncates —
  *     floor, for the regex's non-negative matches;
  *   - missing distance → 5.0, passengers → 1, duration → 15.0,
  *     rate/payment → 1 (defaults; rate/payment do NOT count toward
  *     the defaults list, Application.py:42-43 assign them inline);
  *   - the "duration inferred from distance and speed" branch
  *     (Application.py:53-55) is DEAD CODE in the reference: speed
  *     present (≥4 numerics) implies duration present (≥3), so the
  *     engine omits it — ServingSpec pins the reachable arms;
  *   - missing speed → distance/(duration/60), where duration is the
  *     ALREADY-DEFAULTED value (reference applies defaults in order);
  *     a zero duration raises ZeroDivisionError there and falls to
  *     20.0 (Application.py:59-65) — the engine guards explicitly.
  *
  * q338 is the parse/impute table, ORACLE-PAIRED (the cascade is pure
  * SQL); q339 composes it with the trained regressor — rows-only, as
  * model outputs aren't SQL-expressible (the q36 rule).
  */
object Serving {

  /** Positional field labels of the request fixture. */
  private val reqLabels =
    Seq("miles", "passengers", "minutes", "mph", "rate", "pay", "tip")

  /** Which request fields render as one-decimal values (distance and
    * speed; passenger/duration/rate/payment are integers — duration
    * integral so the fixture can hit the zero-duration arm: doc 219
    * has k = 3 numerics with duration exactly 0). */
  private val reqDecimal = Set(0, 3)

  /** Deterministic NL request fixture over the documents table: doc d
    * carries the first (d mod 8) fields, so every cascade arm (0–7
    * numerics) appears. Values are small exact formulas mirrored in
    * the q338 oracle SQL. */
  def nlRequests(spark: SparkSession, sfDir: String): DataFrame = {
    val k = pmod(col("doc_id"), lit(8))
    def raw(i: Int): Column = pmod(col("doc_id") * 5 + lit(13 * i), lit(59))
    def frac(i: Int): Column = pmod(col("doc_id") + lit(3 * i), lit(10))
    def numStr(i: Int): Column =
      if (reqDecimal(i))
        concat(raw(i).cast("string"), lit("."), frac(i).cast("string"))
      else raw(i).cast("string")
    val frags = reqLabels.zipWithIndex.map { case (label, i) =>
      when(k > i, concat(lit(" "), numStr(i), lit(" " + label)))
        .otherwise(lit(""))
    }
    Tables.documents(spark, sfDir).select(col("doc_id"),
      concat((lit("trip request:") +: frags): _*).as("request"))
  }

  /** T1 + T4 as column expressions: extract numerics, map
    * positionally, run the reference's imputation cascade. Appends
    * n_nums, the six features, and n_defaults (the length of the
    * reference's defaults list). */
  def parseNlTrip(requests: DataFrame, textCol: String = "request"): DataFrame = {
    val nums = regexp_extract_all(col(textCol), lit("\\d+(?:\\.\\d+)?"), lit(0))
    val withNums = requests.withColumn("__nums", nums)
    def num(i: Int): Column =
      try_element_at(col("__nums"), lit(i + 1)).cast("double")
    val dist = coalesce(num(0), lit(5.0))
    val dur = coalesce(num(2), lit(15.0))
    val speed = when(num(3).isNotNull, num(3))
      .when(dur =!= 0.0, dist / (dur / 60.0))
      .otherwise(lit(20.0))
    val nDefaults = num(0).isNull.cast("int") + num(1).isNull.cast("int") +
      num(2).isNull.cast("int") + num(3).isNull.cast("int")
    withNums
      .withColumn("n_nums", size(col("__nums")))
      .withColumn("trip_distance", dist)
      .withColumn("passenger_count",
        coalesce(floor(num(1)), lit(1L)).cast("int"))
      .withColumn("trip_duration_minutes", dur)
      .withColumn("avg_speed_mph", speed)
      .withColumn("rate_code_id", coalesce(floor(num(4)), lit(1L)).cast("int"))
      .withColumn("payment_type", coalesce(floor(num(5)), lit(1L)).cast("int"))
      .withColumn("n_defaults", nDefaults)
      .drop("__nums")
  }

  /** The q338 oracle's mirror of [[nlRequests]] + [[parseNlTrip]] in
    * DuckDB SQL (list indexing is 1-based and NULL out of bounds —
    * the try_element_at analog). */
  private val parseSql: String = {
    val frags = reqLabels.zipWithIndex.map { case (label, i) =>
      val raw = s"CAST((doc_id * 5 + ${13 * i}) % 59 AS VARCHAR)"
      val v =
        if (reqDecimal(i)) s"$raw || '.' || CAST((doc_id + ${3 * i}) % 10 AS VARCHAR)"
        else raw
      s"CASE WHEN doc_id % 8 > $i THEN ' ' || $v || ' $label' ELSE '' END"
    }.mkString(" ||\n      ")
    s"""WITH req AS (
       |  SELECT doc_id, 'trip request:' ||
       |      $frags AS request
       |  FROM documents),
       |extracted AS (
       |  SELECT doc_id,
       |    regexp_extract_all(request, '\\d+(?:\\.\\d+)?') AS nums
       |  FROM req),
       |mapped AS (
       |  SELECT doc_id, CAST(len(nums) AS INTEGER) AS n_nums,
       |    CAST(nums[1] AS DOUBLE) AS n1, CAST(nums[2] AS DOUBLE) AS n2,
       |    CAST(nums[3] AS DOUBLE) AS n3, CAST(nums[4] AS DOUBLE) AS n4,
       |    CAST(nums[5] AS DOUBLE) AS n5, CAST(nums[6] AS DOUBLE) AS n6
       |  FROM extracted)
       |SELECT doc_id, n_nums,
       |  COALESCE(n1, CAST(5.0 AS DOUBLE)) AS trip_distance,
       |  CAST(COALESCE(floor(n2), 1) AS INTEGER) AS passenger_count,
       |  COALESCE(n3, CAST(15.0 AS DOUBLE)) AS trip_duration_minutes,
       |  CASE WHEN n4 IS NOT NULL THEN n4
       |       WHEN COALESCE(n3, CAST(15.0 AS DOUBLE)) <> 0
       |         THEN COALESCE(n1, CAST(5.0 AS DOUBLE)) /
       |              (COALESCE(n3, CAST(15.0 AS DOUBLE)) / 60.0)
       |       ELSE CAST(20.0 AS DOUBLE) END AS avg_speed_mph,
       |  CAST(COALESCE(floor(n5), 1) AS INTEGER) AS rate_code_id,
       |  CAST(COALESCE(floor(n6), 1) AS INTEGER) AS payment_type,
       |  CAST((n1 IS NULL) AS INTEGER) + CAST((n2 IS NULL) AS INTEGER) +
       |    CAST((n3 IS NULL) AS INTEGER) + CAST((n4 IS NULL) AS INTEGER)
       |    AS n_defaults
       |FROM mapped
       |ORDER BY doc_id""".stripMargin
  }

  /** T1 → T4 parse/impute table, oracle-paired. */
  val qNlTripParse: GraftQuery = GraftQuery(
    "q338_nl_trip_parse", parseSql) { (s, d) =>
    parseNlTrip(nlRequests(s, d))
      .select("doc_id", "n_nums", "trip_distance", "passenger_count",
        "trip_duration_minutes", "avg_speed_mph", "rate_code_id",
        "payment_type", "n_defaults")
      .orderBy("doc_id")
  }

  /** The six serving features, reference order (train.py:37-38,
    * Application.py:19-21). */
  val tripFeatureCols: Array[String] = Array(
    "trip_distance", "passenger_count", "trip_duration_minutes",
    "avg_speed_mph", "rate_code_id", "payment_type")

  /** Trip-unit training pull: the S6 shape (train.py:26-33) with the
    * six features + fare label in TRIP units derived from lineitem
    * columns (the testdata has no taxi table; what matters for the
    * plumbing capstone is that units and schema match the parse
    * output, so the model transform composes). */
  def tripTrainingPull(spark: SparkSession, sfDir: String): DataFrame =
    Tables.lineitem(spark, sfDir).select(
      col("l_quantity").cast("double").as("trip_distance"),
      (lit(1) + pmod(col("l_linenumber"), lit(6))).cast("int")
        .as("passenger_count"),
      (col("l_quantity").cast("double") /
        (lit(8.0) + pmod(col("l_suppkey"), lit(32)).cast("double")) * 60.0)
        .as("trip_duration_minutes"),
      (lit(8.0) + pmod(col("l_suppkey"), lit(32)).cast("double"))
        .as("avg_speed_mph"),
      (lit(1) + pmod(col("l_orderkey"), lit(6))).cast("int")
        .as("rate_code_id"),
      (lit(1) + pmod(col("l_partkey"), lit(4))).cast("int")
        .as("payment_type"),
      (col("l_extendedprice") / 100.0).as("label"))
      .where(col("trip_distance") > 0 && col("label") > 0)

  /** The fitted serving model, memoized per (session, corpus) — the
    * reference loads one pickled model per process
    * (Application.py:14); repeated Verify/Bench invocations must not
    * retrain. Models hold no cached blocks — release is a no-op. */
  private val servingModelMemo =
    new graft.spark.SessionMemo[String, org.apache.spark.ml.PipelineModel](
      "serving.model")(_ => ())

  def servingModel(spark: SparkSession, sfDir: String): org.apache.spark.ml.PipelineModel =
    servingModelMemo.getOrElseUpdate(spark, sfDir)(
      graft.ml.Predictor.fit(tripTrainingPull(spark, sfDir),
        numTrees = 20, features = tripFeatureCols).model)

  /** THE CAPSTONE: NL text → parse/impute → validate → predict, one
    * plan. Rows-only (trained-model outputs aren't SQL-expressible);
    * the validation mirrors Application.py:126-128 — non-positive
    * distance or duration rows are answered with a NULL fare instead
    * of a prediction (the reference returns an error string there).
    * Fare is bround(pred, 2): Python round() is half-even, like the
    * reference's round(float(pred), 2). */
  val qServingCapstone: GraftQuery = GraftQuery.noOracle(
    "q339_serving_capstone") { (s, d) =>
    val parsed = parseNlTrip(nlRequests(s, d))
    val model = servingModel(s, d)
    val valid = col("trip_distance") > 0 && col("trip_duration_minutes") > 0
    model.transform(parsed)
      .select(col("doc_id"), col("n_nums"),
        col("trip_distance"), col("passenger_count"),
        col("trip_duration_minutes"), col("avg_speed_mph"),
        col("rate_code_id"), col("payment_type"),
        when(valid, bround(col("prediction"), 2)).otherwise(lit(null))
          .as("predicted_fare"),
        valid.as("is_valid"))
      .orderBy("doc_id")
  }

  def all: Seq[GraftQuery] = Seq(qNlTripParse, qServingCapstone)
}
