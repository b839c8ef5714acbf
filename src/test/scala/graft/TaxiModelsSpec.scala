package graft

import graft.models.TaxiModels
import graft.dq.DataQuality
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-parity semantics of the core_texi pipeline
  * (core_texi.sql:8-101) on synthesized raw taxi rows exercising every
  * edge FIXTURES.md §A calls out. */
class TaxiModelsSpec extends SparkSpecBase {

  private val rawSchema = StructType(Seq(
    "VendorID", "tpep_pickup_datetime", "tpep_dropoff_datetime",
    "passenger_count", "trip_distance", "pickup_longitude", "pickup_latitude",
    "RateCodeID", "store_and_fwd_flag", "dropoff_longitude", "dropoff_latitude",
    "payment_type", "fare_amount", "extra", "mta_tax", "tip_amount",
    "tolls_amount", "improvement_surcharge", "total_amount")
    .map(StructField(_, StringType)))

  private def raw(rows: Seq[Seq[String]]): DataFrame =
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map(r => Row(r: _*)): _*), rawSchema)

  private def mkRow(pickup: String, dropoff: String, dist: String,
      vendor: String = "1", fare: String = "10.5"): Seq[String] =
    Seq(vendor, pickup, dropoff, "2", dist, "-73.9", "40.7", "1", "N",
      "-73.8", "40.6", "1", fare, "0.5", "0.5", "1.0", "0.0", "0.3", "12.8")

  private val ok = mkRow("2015-01-15 19:05:39", "2015-01-15 19:25:39", "5.0")

  test("F1: rows with null pickup/dropoff timestamps are dropped") {
    val df = raw(Seq(ok,
      mkRow(null, "2015-01-15 19:25:39", "5.0"),
      mkRow("2015-01-15 19:05:39", null, "5.0")))
    assert(TaxiModels.coreTexi(df).count() === 1)
  }

  test("dedup keeps exactly one row per duplicate surrogate key") {
    val df = raw(Seq(ok, ok, ok))
    val out = TaxiModels.coreTexi(df)
    assert(out.count() === 1)
    assert(DataQuality.runAll(out, DataQuality.coreTexiSuite).forall(_.passed))
  }

  test("F2: zero/negative duration rows are dropped") {
    val df = raw(Seq(ok,
      mkRow("2015-01-15 19:05:39", "2015-01-15 19:05:39", "5.0"), // zero
      mkRow("2015-01-15 19:25:39", "2015-01-15 19:05:39", "5.0"))) // negative
    assert(TaxiModels.coreTexi(df).count() === 1)
  }

  test("F3: speed > 300 dropped; zero-distance passes with NULL speed") {
    // distinct vendors: trip_distance is NOT part of the surrogate key
    // (core_texi.sql:11-30), so same-key rows would dedup, not filter
    val df = raw(Seq(ok,
      // 200 miles in 20 min = 600 mph → dropped by the unguarded filter
      mkRow("2015-01-15 19:05:39", "2015-01-15 19:25:39", "200.0", vendor = "2"),
      // 0 distance: speed expr = 0 <= 300 → kept, guarded speed NULL
      mkRow("2015-01-15 19:05:39", "2015-01-15 19:25:39", "0.0", vendor = "3")))
    val out = TaxiModels.coreTexi(df).orderBy("trip_distance")
    assert(out.count() === 2)
    val zeroDist = out.first()
    assert(zeroDist.getAs[Double]("trip_distance") === 0.0)
    assert(zeroDist.isNullAt(zeroDist.fieldIndex("avg_speed_mph")))
  }

  test("derived columns: duration minutes and guarded speed") {
    val out = TaxiModels.coreTexi(raw(Seq(ok))).first()
    assert(out.getAs[Double]("trip_duration_minutes") === 20.0)
    assert(math.abs(out.getAs[Double]("avg_speed_mph") - 15.0) < 1e-12)
    assert(!out.getAs[Boolean]("is_long_trip"))
  }

  test("E8: is_long_trip flags distance > 10") {
    val df = raw(Seq(mkRow("2015-01-15 19:05:39", "2015-01-15 20:05:39", "10.5")))
    assert(TaxiModels.coreTexi(df).first().getAs[Boolean]("is_long_trip"))
  }

  test("E2: surrogate key uses Postgres concat semantics — NULL renders empty, separators kept") {
    import spark.implicits._
    val df = Seq(("a", null: String, "c")).toDF("x", "y", "z")
    val got = df.select(
      TaxiModels.surrogateKeyInput(Seq(col("x"), col("y"), col("z"))).as("k"),
      TaxiModels.uniqueId(Seq(col("x"), col("y"), col("z"))).as("id")).first()
    assert(got.getString(0) === "a--c") // concat_ws would give "a-c"
    assert(got.getString(1) === java.security.MessageDigest.getInstance("MD5")
      .digest("a--c".getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("scale-path agg dedup keeps the same key set as the window form") {
    val df = raw(Seq(ok, ok,
      mkRow("2015-01-16 10:00:00", "2015-01-16 10:30:00", "3.0"),
      mkRow("2015-01-16 10:00:00", "2015-01-16 10:30:00", "3.0", vendor = "2")))
    val windowed = TaxiModels.coreTexi(df)
    val aggForm = TaxiModels.dedupNewestAggForm(windowed, "unique_id", "ingestion_date")
    assert(windowed.select("unique_id").distinct().count() === aggForm.count())
    assert(aggForm.select("unique_id").distinct().count() === aggForm.count())
  }

  test("ML pull: projection + positive filters (S6 shape)") {
    val core = TaxiModels.coreTexi(raw(Seq(ok)))
    val pull = TaxiModels.mlTrainingPull(core)
    assert(pull.columns.toSeq === Seq("trip_distance", "passenger_count",
      "trip_duration_minutes", "avg_speed_mph", "rate_code_id", "payment_type",
      "fare_amount"))
    assert(pull.count() === 1)
  }
}
