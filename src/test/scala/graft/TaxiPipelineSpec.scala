package graft

import graft.models.TaxiPipeline
import org.apache.spark.sql.functions.lit

/** End-to-end reference flow: CSV → ingest → raw_texi → core_texi →
  * five data-quality assertions (SURVEY §7.2's vertical slice). */
class TaxiPipelineSpec extends SparkSpecBase {
  import spark.implicits._

  private def writeTaxiCsv(path: String): Unit = {
    val rows = Seq(
      // clean trip
      ("1", "2015-01-15 19:05:39", "2015-01-15 19:25:39", "2", "5.0", "-73.9", "40.7", "1", "N", "-73.8", "40.6", "1", "10.5", "0.5", "0.5", "1.0", "0.0", "0.3", "12.8"),
      // duplicate of the clean trip (dedup target)
      ("1", "2015-01-15 19:05:39", "2015-01-15 19:25:39", "2", "5.0", "-73.9", "40.7", "1", "N", "-73.8", "40.6", "1", "10.5", "0.5", "0.5", "1.0", "0.0", "0.3", "12.8"),
      // null dropoff (dropped by F1)
      ("2", "2015-01-16 10:00:00", null, "1", "3.0", "-73.9", "40.7", "1", "N", "-73.8", "40.6", "1", "8.0", "0.5", "0.5", "0.0", "0.0", "0.3", "9.3"),
      // zero duration (dropped by F2)
      ("3", "2015-01-16 11:00:00", "2015-01-16 11:00:00", "1", "2.0", "-73.9", "40.7", "1", "N", "-73.8", "40.6", "2", "5.0", "0.5", "0.5", "0.0", "0.0", "0.3", "6.3"),
      // 600 mph (dropped by F3)
      ("4", "2015-01-16 12:00:00", "2015-01-16 12:20:00", "1", "200.0", "-73.9", "40.7", "1", "N", "-73.8", "40.6", "1", "99.0", "0.5", "0.5", "0.0", "0.0", "0.3", "100.3"),
      // long trip (is_long_trip = true)
      ("5", "2015-01-16 13:00:00", "2015-01-16 14:00:00", "3", "15.0", "-73.9", "40.7", "2", "Y", "-73.8", "40.6", "2", "45.0", "0.5", "0.5", "5.0", "0.0", "0.3", "51.3"))
    rows.toDF("VendorID", "tpep_pickup_datetime", "tpep_dropoff_datetime",
        "passenger_count", "trip_distance", "pickup_longitude", "pickup_latitude",
        "RateCodeID", "store_and_fwd_flag", "dropoff_longitude", "dropoff_latitude",
        "payment_type", "fare_amount", "extra", "mta_tax", "tip_amount",
        "tolls_amount", "improvement_surcharge", "total_amount")
      .write.option("header", true).mode("overwrite").csv(path)
  }

  test("CSV → ingest → models → DQ suite, end to end") {
    val dir = java.nio.file.Files.createTempDirectory("taxi_e2e").toString
    writeTaxiCsv(s"$dir/raw.csv")
    val result = TaxiPipeline.runFromCsv(spark, s"$dir/raw.csv", s"$dir/out",
      ingestionDate = lit("2026-01-01"))

    assert(result.tables("raw_texi").count() === 6)
    val core = result.tables("core_texi")
    // 6 raw - 1 dup - 1 null-dropoff - 1 zero-duration - 1 speeding = 2
    assert(core.count() === 2)
    assert(core.columns.length === 24) // the full core_texi schema (FIXTURES.md §B)
    assert(result.passed, s"DQ failures: ${result.dqReport.filterNot(_.passed)}")
    val longTrips = core.where($"is_long_trip").collect()
    assert(longTrips.length === 1 && longTrips(0).getAs[Int]("vendor_id") === 5)
  }
}
