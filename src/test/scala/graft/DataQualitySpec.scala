package graft

import graft.dq.DataQuality
import graft.dq.DataQuality.{notNull, runAll, runAllFused, speedLimit, unique}
import org.apache.spark.sql.functions._

class DataQualitySpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Some(5.0), "a"), (2L, Some(-1.0), "b"), (3L, None, "c"),
    (4L, Some(500.0), "d"), (4L, Some(2.0), "e"))
    .toDF("id", "speed", "tag")

  test("notNull returns the null rows") {
    assert(notNull(col("speed"))(df).count() === 1)
  }

  test("unique returns keys with count > 1 (dbt compiled form)") {
    val v = unique(col("id"))(df).collect()
    assert(v.length === 1 && v(0).getLong(0) === 4L)
  }

  test("unique ignores NULL keys like dbt (duplicate NULLs are not_null's job)") {
    val withNulls = Seq(Some(1L), None, None, Some(2L))
      .toDF("id")
    assert(unique(col("id"))(withNulls).count() === 0)
  }

  test("positive flags <= 0 (custom_positive_test.sql:1-5)") {
    assert(DataQuality.positive(col("speed"))(df).count() === 1)
  }

  test("speedLimit flags > 300, NULL passes (custom_speed_limit.sql:1-5)") {
    assert(speedLimit(col("speed"))(df).count() === 1)
  }

  test("runAll reports per-test violation counts (A3 contract)") {
    val res = runAll(df, Seq(
      "speed_not_null" -> notNull(col("speed")),
      "id_unique" -> unique(col("id"))))
    assert(res.map(r => r.name -> r.violations).toMap ===
      Map("speed_not_null" -> 1L, "id_unique" -> 1L))
    assert(res.forall(!_.passed))
  }

  test("fused single-pass counts match per-test counts") {
    val fused = runAllFused(df, Seq(
      "speed_null" -> col("speed").isNull,
      "speed_nonpositive" -> (col("speed") <= 0),
      "speed_over_limit" -> (col("speed") > 300)))
    assert(fused.map(r => r.name -> r.violations).toMap ===
      Map("speed_null" -> 1L, "speed_nonpositive" -> 1L, "speed_over_limit" -> 1L))
  }
}
