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
}
