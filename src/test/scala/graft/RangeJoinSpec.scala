package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("band join is exact: inclusive bounds, bin-crossing intervals, no dupes") {
    // intervals deliberately straddle the binWidth=10 boundaries
    val probe = Seq((1L, 5.0, 15.0), (2L, 10.0, 10.0), (3L, 29.9, 40.1))
      .toDF("pid", "lo", "hi")
    val build = Seq((100L, 5.0), (101L, 10.0), (102L, 15.0), (103L, 15.000001),
      (104L, 30.0), (105L, 40.1), (106L, 99.0))
      .toDF("bid", "pt")
    val got = RangeJoin.bandJoin(probe, build,
        lo = col("lo"), hi = col("hi"), point = col("pt"), binWidth = 10.0)
      .select("pid", "bid")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set(
      (1L, 100L), (1L, 101L), (1L, 102L), // [5,15] inclusive both ends
      (2L, 101L),                         // degenerate [10,10]
      (3L, 104L), (3L, 105L)))            // crosses three bins, hi inclusive
  }

  test("property: band join equals brute force on random boundary-heavy instances") {
    val rnd = new scala.util.Random(7)
    (0 until 5).foreach { _ =>
      // values biased onto exact bin multiples to stress inclusivity
      def v(): Double =
        if (rnd.nextBoolean()) rnd.nextInt(10) * 10.0 else rnd.nextDouble() * 100
      val probe0 = (0 until 30).map { i =>
        val a = v(); val b = v()
        (i.toLong, math.min(a, b), math.max(a, b))
      }
      val build0 = (0 until 40).map(i => (100L + i, v()))
      val probe = probe0.toDF("pid", "lo", "hi")
      val build = build0.toDF("bid", "pt")
      val got = RangeJoin.bandJoin(probe, build,
          col("lo"), col("hi"), col("pt"), binWidth = 10.0)
        .select("pid", "bid")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (for {
        (pid, lo, hi) <- probe0
        (bid, pt) <- build0 if pt >= lo && pt <= hi
      } yield (pid, bid)).toSet
      assert(got === expected)
    }
  }

  test("binned plan equals the naive inequality join on real data") {
    val events = graft.sources.Tables.events(spark, sf001)
      .select(col("event_id"), col("value"))
    val part = graft.sources.Tables.part(spark, sf001)
      .select(col("p_partkey"), col("p_retailprice"))
    val binned = RangeJoin.bandJoin(events, part,
        col("value") * 10 - 25, col("value") * 10 + 25, col("p_retailprice"), 50.0)
      .select("event_id", "p_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = events.join(part,
        col("p_retailprice") >= col("value") * 10 - 25 &&
        col("p_retailprice") <= col("value") * 10 + 25)
      .select("event_id", "p_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned === naive)
  }
}
