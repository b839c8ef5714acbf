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

  test("property: as-of equals the brute-force definition on random instances") {
    val rnd = new scala.util.Random(42)
    (0 until 10).foreach { _ =>
      // right side pre-reduced: distinct (key, time), unique payload
      val right0 = rnd.shuffle((for {
        k <- 0L to 3L; t <- 0 until 50 if rnd.nextDouble() < 0.15
      } yield (k, t)).toList).zipWithIndex
        .map { case ((k, t), i) => (k, t.toLong, 1000L + i) }
      val left0 = (0 until 40).map { i =>
        (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(60).toLong)
      }
      def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
      val left = left0.map { case (id, k, t) => (id, k, ts(t)) }
        .toDF("event_id", "user_id", "t")
      val right = right0.map { case (k, t, p) => (k, ts(t), p) }
        .toDF("user_id", "ot", "payload")
      val got = AsOfJoin.asOf(left, right, "user_id", "t", "ot", Seq("payload" -> "p"))
        .collect().map(r => r.getLong(0) -> Option(r.get(r.fieldIndex("p")))).toMap
      val expected = left0.map { case (id, k, t) =>
        val candidates = right0.filter(r => r._1 == k && r._2 <= t)
        id -> (if (candidates.isEmpty) None
               else Some(candidates.maxBy(_._2)._3))
      }.toMap
      assert(got === expected)
    }
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
