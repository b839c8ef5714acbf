package graft

import graft.operators.{GroupSample, MarketBasket}

/** Allocation exactness for the largest-remainder sample and ranking
  * invariants for the item-CF neighborhood. */
class StratifiedSampleSpec extends SparkSpecBase {

  test("q263: sample is exactly K with per-stratum counts equal to the allocation") {
    val rows = GroupSample.qStratifiedSample.fn(spark, sf001).collect()
    assert(rows.length == GroupSample.sampleK, "largest remainder sums exactly to K")
    val byLang = rows.groupBy(_.getString(0))
    byLang.foreach { case (lang, rs) =>
      val alloc = rs.head.getLong(4)
      assert(rs.length == alloc, s"$lang: ${rs.length} sampled != alloc $alloc")
      // ranks are 1..alloc with no gaps
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to alloc.toInt))
      // allocation is within 1 of the exact proportional share
      val n = rs.head.getLong(3)
      val nAll = byLang.values.map(_.head.getLong(3)).sum
      val exact = GroupSample.sampleK.toDouble * n / nAll
      assert(math.abs(alloc - exact) < 1.0,
        s"$lang alloc $alloc vs proportional $exact")
    }
  }

  test("q262: neighbor lists are ranked, bounded by 3, and symmetric in score") {
    val rows = MarketBasket.qItemSimTopK.fn(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(6)))
    rows.groupBy(_._1).foreach { case (item, rs) =>
      val ranks = rs.map(_._2).sorted.toSeq
      assert(ranks == (1 to rs.length) && rs.length <= 3, s"item $item ranks $ranks")
      // scores non-increasing in rank
      val byRank = rs.sortBy(_._2).map(_._4)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    // symmetry of the underlying score: if (a -> b) and (b -> a) both
    // survive the top-3 cut, their cos2_ppm must be equal
    val score = rows.map(r => (r._1, r._3) -> r._4).toMap
    score.foreach { case ((a, b), s) =>
      score.get((b, a)).foreach(s2 => assert(s2 == s, s"asymmetric score $a<->$b"))
    }
  }
}
