package graft

import graft.operators.OlapGrouping
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.ExpandExec
import org.apache.spark.sql.execution.aggregate.HashAggregateExec

class OlapGroupingSpec extends SparkSpecBase {

  private def collectRows(q: GraftQuery): Array[Row] =
    q.fn(spark, sf001).collect()

  test("q243 rollup: subtotal hierarchy is internally consistent") {
    val rows = collectRows(OlapGrouping.qRollupRevenue)
    val leaf = rows.filter(r => r.getLong(2) == 0 && r.getLong(3) == 0)
    val regionSub = rows.filter(r => r.getLong(2) == 0 && r.getLong(3) == 1)
    val grand = rows.filter(r => r.getLong(2) == 1 && r.getLong(3) == 1)
    assert(grand.length == 1)
    // counts are exact longs: leaves == region subtotals == grand total
    val leafN = leaf.map(_.getLong(4)).sum
    assert(regionSub.map(_.getLong(4)).sum == leafN)
    assert(grand.head.getLong(4) == leafN)
    // revenue came through exact decimal sums, so the levels agree to
    // the cent even after the final double render
    assert(math.abs(grand.head.getDouble(5) - leaf.map(_.getDouble(5)).sum) < 1e-2)
    // subtotal rows carry NULL in the rolled-up key, leaves never do
    assert(regionSub.forall(r => !r.isNullAt(0) && r.isNullAt(1)))
    assert(leaf.forall(r => !r.isNullAt(0) && !r.isNullAt(1)))
  }

  test("q244 cube: all four grains present, marker combos exact") {
    val rows = collectRows(OlapGrouping.qCubeLineitem)
    val combos = rows.map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(combos == Set((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L)))
    val grand = rows.filter(r => r.getLong(2) == 1 && r.getLong(3) == 1)
    assert(grand.length == 1)
    val leafN = rows.filter(r => r.getLong(2) == 0 && r.getLong(3) == 0)
      .map(_.getLong(4)).sum
    assert(grand.head.getLong(4) == leafN)
  }

  test("q246 grouping sets: exactly the two requested sets, no leaf grain") {
    val rows = collectRows(OlapGrouping.qGroupingSets)
    val combos = rows.map(r => (r.getLong(2), r.getLong(3))).toSet
    assert(combos == Set((0L, 1L), (1L, 0L)),
      "only (priority) and (status) sets — no (priority,status) leaf, no grand total")
    val byPriority = rows.filter(_.getLong(3) == 1).map(_.getLong(4)).sum
    val byStatus = rows.filter(_.getLong(2) == 1).map(_.getLong(4)).sum
    assert(byPriority == byStatus, "both sets partition the same input")
  }

  test("q245 ntile: balanced buckets covering every customer exactly once") {
    val rows = collectRows(OlapGrouping.qNtileDeciles)
    assert(rows.map(_.getLong(0)).toSeq == (1L to 10L))
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, "ntile buckets differ by at most one row")
    // deciles are ordered: each bucket's max <= next bucket's min
    val byDecile = rows.sortBy(_.getLong(0))
    byDecile.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2) + 1e-9)
    }
  }

  test("rollup/cube/sets run their Expand over the pre-aggregated grain, not the fact scan") {
    Seq(OlapGrouping.qRollupRevenue, OlapGrouping.qCubeLineitem, OlapGrouping.qGroupingSets)
      .foreach { q =>
        val plan = q.fn(spark, sf001).queryExecution.executedPlan
        def subtree(p: SparkPlan): Seq[SparkPlan] = p match {
          // AQE hides the real operator tree behind a childless wrapper
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            p +: subtree(a.executedPlan)
          case _ => p +: p.children.flatMap(subtree)
        }
        val expands = subtree(plan).collect { case e: ExpandExec => e }
        assert(expands.nonEmpty, s"${q.name}: grouping-set operator should plan Expand")
        expands.foreach { e =>
          assert(subtree(e.child).exists(_.isInstanceOf[HashAggregateExec]),
            s"${q.name}: Expand must replicate the finished fine-grain aggregate, " +
              "never the raw scan — the two-level rewrite is the 100 TB shape")
        }
      }
  }

  // driver-side reference for the selection specs: plain global sort
  private def refPercentiles(df: org.apache.spark.sql.DataFrame,
      pcts: Seq[Int]): Map[Int, (Long, Long, Double)] = {
    val sorted = df.orderBy("value", "event_id").collect().map(_.getDouble(1))
    val n = sorted.length.toLong
    pcts.map { p =>
      val k = (n * p + 99) / 100
      p -> ((n, k, sorted((k - 1).toInt)))
    }.toMap
  }

  test("q310 re-bisect: a hot bin re-histograms at width/8, result unchanged") {
    import spark.implicits._
    // 10,000 rows over 64 distinct values inside ONE width-8 bin [0,8):
    // every re-bisection level stays hot at hotBinLimit=100 (width-1
    // sub-bins hold 1,250 rows; width-0.125 sub-bins are SINGLE-VALUED
    // with ~156 rows), so p50/p90 walk hot→re-bisect→re-bisect→
    // single-valued floor. The 500-row tail bin [16,24) resolves after
    // ONE re-bisect (width-1 sub-bins hold exactly 100 ≤ limit rows),
    // so p99 exercises the recurse-then-TakeOrdered path.
    val hot = (0 until 10000).map(i => (i.toLong, (i % 64).toDouble / 8.0))
    val tail = (0 until 500).map(i => (10000L + i, 16.0 + i.toDouble / 100))
    val df = (hot ++ tail).toDF("event_id", "value")
    val want = refPercentiles(df, Seq(50, 90, 99))
    val got = graft.operators.OlapGrouping
      .percentilesByBins(df, Seq(50, 90, 99), 8.0, hotBinLimit = 100)
      .collect()
    assert(got.length == 3)
    got.foreach { r =>
      val (n, k, v) = want(r.getInt(0))
      assert(r.getLong(1) == n && r.getLong(2) == k,
        s"pct ${r.getInt(0)}: n/rank mismatch")
      assert(r.getDouble(3) == v,
        s"pct ${r.getInt(0)}: value ${r.getDouble(3)} != reference $v")
    }
    // same data through the q310 default (no re-bisect triggered) —
    // identical answer proves the re-bisect path changes nothing
    val plain = graft.operators.OlapGrouping
      .percentilesByBins(df, Seq(50, 90, 99), 8.0, hotBinLimit = Int.MaxValue)
      .collect().map(r => (r.getInt(0), r.getDouble(3))).toMap
    got.foreach(r => assert(plain(r.getInt(0)) == r.getDouble(3)))
  }

  test("q310: empty input short-circuits to zero rows with the output schema") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Double)].toDF("event_id", "value")
    val out = graft.operators.OlapGrouping
      .percentilesByBins(empty, Seq(50, 90, 99), 8.0, Int.MaxValue)
    assert(out.columns.toSeq == Seq("pct", "n", "rank", "value"))
    assert(out.collect().isEmpty)
  }
}
