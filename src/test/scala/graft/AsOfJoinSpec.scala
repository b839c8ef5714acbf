package graft

import graft.operators.AsOfJoin
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("attaches latest right row at or before left time, per key") {
    val left = Seq(
      (1L, 10L, ts("2024-01-05 00:00:00")),
      (2L, 10L, ts("2024-01-01 00:00:00")), // before any order → null
      (3L, 10L, ts("2024-01-10 00:00:00")),
      (4L, 20L, ts("2024-01-05 00:00:00"))) // other key
      .toDF("event_id", "user_id", "t")
    val right = Seq(
      (10L, ts("2024-01-03 00:00:00"), 100L),
      (10L, ts("2024-01-08 00:00:00"), 101L),
      (20L, ts("2024-01-05 00:00:00"), 200L)) // exactly simultaneous
      .toDF("user_id", "ot", "orderkey")
    val out = AsOfJoin.asOf(left, right, "user_id", "t", "ot",
        Seq("orderkey" -> "last_orderkey"))
      .orderBy("event_id").collect()
    assert(out.map(r => Option(r.get(r.fieldIndex("last_orderkey")))).toSeq === Seq(
      Some(100L), None, Some(101L), Some(200L)))
  }

  test("left columns survive unchanged") {
    val left = Seq((1L, 10L, ts("2024-01-05 00:00:00"), "x"))
      .toDF("event_id", "user_id", "t", "tag")
    val right = Seq((10L, ts("2024-01-03 00:00:00"), 1.5))
      .toDF("user_id", "ot", "price")
    val out = AsOfJoin.asOf(left, right, "user_id", "t", "ot", Seq("price" -> "p"))
    assert(out.columns.toSeq === Seq("event_id", "user_id", "t", "tag", "p"))
    val r = out.first()
    assert(r.getString(3) === "x" && r.getDouble(4) === 1.5)
  }
}
