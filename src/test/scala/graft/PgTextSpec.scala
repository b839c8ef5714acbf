package graft

import graft.models.TaxiModels
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.PgFloat8Text
import org.apache.spark.sql.types._

/** PG `float8out` parity of [[PgFloat8Text]] (operator E2, SURVEY §7.4):
  * pinned Postgres-known renderings, round-trip/shortest properties, the
  * codegen path, and the taxi fixture end-to-end — a float8-keyed
  * core_texi run whose md5 surrogate keys are hand-computed from the
  * exact text Postgres would concatenate (core_texi.sql:10-31). */
class PgTextSpec extends SparkSpecBase {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("pinned PG float8out renderings") {
    val cases: Seq[(Double, String)] = Seq(
      0.0 -> "0",
      -0.0 -> "-0",
      15.0 -> "15",
      -15.0 -> "-15",
      2.5 -> "2.5",
      0.1 -> "0.1",
      0.04 -> "0.04",
      13309.6 -> "13309.6",
      -73.98455 -> "-73.98455",
      1e7 -> "10000000",          // Java renders 1.0E7
      1e-4 -> "0.0001",           // Java renders 1.0E-4
      0.00001 -> "1e-05",
      1.5e-5 -> "1.5e-05",
      1e14 -> "100000000000000",
      999999999999999.0 -> "999999999999999",
      1e15 -> "1e+15",            // PG switches to scientific at e=15
      1234567890123456.0 -> "1.234567890123456e+15",
      1.230454e16 -> "1.230454e+16",
      9e16 -> "9e+16",
      1e100 -> "1e+100",
      4.9e-324 -> "5e-324",
      1.0000000000000002 -> "1.0000000000000002", // 17 digits, 1 ulp above 1
      Double.NaN -> "NaN",
      Double.PositiveInfinity -> "Infinity",
      Double.NegativeInfinity -> "-Infinity")
    for ((d, want) <- cases)
      assert(PgFloat8Text.render(d) === want, s"render($d)")
  }

  test("round-trip and no-longer-than-Java shortest property") {
    val rnd = new scala.util.Random(42)
    val doubles = Seq.fill(2000) {
      rnd.nextInt(4) match {
        case 0 => rnd.nextDouble() * 2e5 - 1e5                  // taxi-ish range
        case 1 => java.lang.Double.longBitsToDouble(rnd.nextLong()) // full space
        case 2 => (rnd.nextInt(2000001) - 1000000).toDouble     // integral
        case _ => rnd.nextDouble() * 2e-3                       // small fixed/sci edge
      }
    }.filterNot(d => d.isNaN) ++ Seq(Double.MinPositiveValue, Double.MaxValue,
      java.lang.Double.MIN_NORMAL)
    for (d <- doubles) {
      val s = PgFloat8Text.render(d)
      assert(java.lang.Double.parseDouble(s) === d, s"round-trip of $d via '$s'")
      val sigDigits = s.dropWhile(c => c == '-' || c == '0' || c == '.')
        .takeWhile(c => c.isDigit || c == '.').count(_.isDigit)
      val javaDigits = java.lang.Double.toString(math.abs(d))
        .takeWhile(c => c != 'E' && c != 'e').count(_.isDigit)
      assert(sigDigits <= javaDigits, s"'$s' uses more digits than Java for $d")
    }
  }

  test("expression matches interpreted render under codegen, null-safe") {
    import spark.implicits._
    val vals: Seq[java.lang.Double] =
      Seq[java.lang.Double](15.0, 0.1, -73.98455, 1e15, 9e16, 1e-4, 0.0, null)
    val df = vals.toDF("d")
    val got = df.select(PgFloat8Text(col("d")).as("t")).collect().map(r =>
      if (r.isNullAt(0)) null else r.getString(0))
    val want = vals.map(v => if (v == null) null else PgFloat8Text.render(v))
    assert(got.toSeq === want)
    // and through the registered SQL surface
    org.apache.spark.sql.graftshim.GraftFunctions.register(spark)
    df.createOrReplaceTempView("pg_vals")
    val sqlGot = spark.sql("SELECT pg_float8_text(d) AS t FROM pg_vals")
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(sqlGot.toSeq === want)
  }

  /** Taxi-shaped fixture with FLOAT8 key columns (the reference's raw
    * staging types after pandas→Postgres: coords and amounts are float8,
    * ids int, datetimes text — ETL/ETL.py, core_texi.sql:10-31). */
  test("coreTexi surrogate keys byte-match hand-built PG concat on float8 columns") {
    val schema = StructType(Seq(
      StructField("VendorID", IntegerType),
      StructField("tpep_pickup_datetime", StringType),
      StructField("tpep_dropoff_datetime", StringType),
      StructField("passenger_count", IntegerType),
      StructField("trip_distance", DoubleType),
      StructField("pickup_longitude", DoubleType),
      StructField("pickup_latitude", DoubleType),
      StructField("RateCodeID", IntegerType),
      StructField("store_and_fwd_flag", StringType),
      StructField("dropoff_longitude", DoubleType),
      StructField("dropoff_latitude", DoubleType),
      StructField("payment_type", IntegerType),
      StructField("fare_amount", DoubleType),
      StructField("extra", DoubleType),
      StructField("mta_tax", DoubleType),
      StructField("tip_amount", DoubleType),
      StructField("tolls_amount", DoubleType),
      StructField("improvement_surcharge", DoubleType),
      StructField("total_amount", DoubleType)))
    val rows = Seq(
      // integral fare 15.0 → PG "15"; longitude -73.8 → "-73.8"
      Row(1, "2015-01-15 19:05:39", "2015-01-15 19:25:39", 2, 5.0,
        -73.9, 40.7, 1, "N", -73.8, 40.6, 1, 15.0, 0.5, 0.5, 1.0, 0.0, 0.3, 17.3),
      // fractional fare, null dropoff coords → PG '' with separators kept
      Row(2, "2015-01-16 08:00:00", "2015-01-16 08:30:00", 1, 3.0,
        -73.95, 40.75, 1, "N", null, null, 2, 12.35, 0.0, 0.5, 0.0, 0.0, 0.3, 13.15))
    val raw = spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
    val out = TaxiModels.coreTexi(raw).select("vendor_id", "unique_id")
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(out(1) === md5hex(
      "1-2015-01-15 19:05:39-2015-01-15 19:25:39-2-1-1--73.8-40.6-15"))
    assert(out(2) === md5hex(
      "2-2015-01-16 08:00:00-2015-01-16 08:30:00-1-1-2---12.35"))
  }
}
