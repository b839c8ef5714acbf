package graft

import graft.plans.MvRewrite
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The materialized-view rewrite rule: soundness (rewritten ≡ direct,
  * row for row), the plan actually re-targets the MV storage, and the
  * refusal paths leave non-derivable aggregates untouched. */
class MvRewriteSpec extends SparkSpecBase {

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def directAgg(): DataFrame =
    Tables.lineitem(spark, sf001)
      .where(col("l_linestatus") === "F")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(12,1)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double").as("sum_price"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))

  test("rewritten plan scans the MV parquet, not the fact table") {
    val (mvPath, _) = MvRewrite.mvFor(spark, sf001)
    MvRewrite.withRule(spark, sf001) {
      val p = directAgg().queryExecution.executedPlan.toString
      assert(p.contains("graft_mv"), s"expected MV scan in plan:\n$p")
      assert(!p.contains("lineitem.parquet"),
        "fact scan should be gone once the rollup is served from the MV")
      assert(new java.io.File(mvPath).exists(), "MV must be real on-disk storage")
    }
  }

  test("rewrite is exact: rule-on equals rule-off, including types") {
    val off = directAgg()
    val on = MvRewrite.withRule(spark, sf001)(directAgg().localCheckpoint())
    assert(on.schema == off.schema,
      s"rewrite must preserve output types\n on=${on.schema}\noff=${off.schema}")
    assert(rows(on) == rows(off))
  }

  test("coarser grain than the MV (group by linestatus alone) recombines") {
    val q = (df: DataFrame) => df.groupBy("l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(12,1)")).as("s"))
    val off = q(Tables.lineitem(spark, sf001))
    MvRewrite.withRule(spark, sf001) {
      val on = q(Tables.lineitem(spark, sf001))
      assert(on.queryExecution.executedPlan.toString.contains("graft_mv"))
      assert(rows(on.localCheckpoint()) == rows(off))
    }
  }

  test("refusal: distinct agg, unregistered measure, non-group filter, ungrouped") {
    MvRewrite.withRule(spark, sf001) {
      val l = Tables.lineitem(spark, sf001)
      val cases = Seq(
        // count(distinct) is not derivable from distributive partials
        l.groupBy("l_returnflag").agg(countDistinct(col("l_orderkey")).as("n")),
        // l_tax has no registered partial
        l.groupBy("l_returnflag")
          .agg(sum(col("l_tax").cast("decimal(12,2)")).as("s")),
        // filter on a non-group column cannot be answered at MV grain
        l.where(col("l_quantity") > 10)
          .groupBy("l_returnflag").agg(count(lit(1)).as("n")),
        // ungrouped aggregate (empty-input row-count divergence)
        l.agg(count(lit(1)).as("n")))
      cases.foreach { df =>
        val p = df.queryExecution.executedPlan.toString
        assert(!p.contains("graft_mv"), s"must fall back to the fact scan:\n$p")
        assert(p.contains("lineitem.parquet"))
      }
      // and the fallback is still correct
      val n = l.where(col("l_quantity") > 10)
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      assert(rows(n.localCheckpoint()) ==
        rows(Tables.lineitem(spark, sf001).where(col("l_quantity") > 10)
          .groupBy("l_returnflag").agg(count(lit(1)).as("n"))))
    }
  }

  test("q226: incremental maintenance reads the persisted base MV, scans only the batch") {
    val df = SparkEntry.queries("q226_mv_increment")(spark, sf001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_mv_base"),
      "merge must read the persisted base partials, not recompute them")
    // the one lineitem scan is the batch slice (pmod filter present)
    assert(p.contains("lineitem.parquet"))
    assert(p.contains("pmod(l_orderkey"),
      s"the fact scan must carry the batch predicate:\n$p")
    // and the merge equals the full recompute (the oracle's claim,
    // asserted here against the direct aggregate too)
    val direct = Tables.lineitem(spark, sf001)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(12,1)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double").as("sum_price"),
        min(col("l_shipdate")).as("mn_ship"),
        max(col("l_shipdate")).as("mx_ship"))
    assert(rows(df) == rows(direct))
  }

  test("rule install/restore leaves the session's optimizer set unchanged") {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    val before = exp.extraOptimizations
    MvRewrite.withRule(spark, sf001) {
      assert(exp.extraOptimizations.size == before.size + 1)
    }
    assert(exp.extraOptimizations == before)
    // rule gone → plans revert to the fact scan
    val p = directAgg().queryExecution.executedPlan.toString
    assert(!p.contains("graft_mv") && p.contains("lineitem.parquet"))
  }

  test("q239: compaction folds the partial log to one generation, serving unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mv_cpt").toString
    (0 to 3).foreach { r =>
      MvRewrite.mvPartial(Tables.lineitem(spark, sf001)
        .where(pmod(col("l_orderkey"), lit(4)) === r))
        .coalesce(1).write.mode("append").parquet(dir)
    }
    def partFiles(): Int = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    val before = MvRewrite.mvServe(spark.read.parquet(dir))
      .collect().map(_.toSeq).toSeq
    assert(partFiles() >= 4, "expected one file per generation")
    MvRewrite.compactPartials(spark, dir)
    assert(partFiles() === 1, "compaction must leave a single generation file")
    val after = MvRewrite.mvServe(spark.read.parquet(dir))
      .collect().map(_.toSeq).toSeq
    assert(after === before, "compaction must not change serving results")
    // compacted store holds exactly the grain cells
    assert(spark.read.parquet(dir).count() === before.size.toLong)
    // and the compacted rows still carry the canonical partial schema,
    // so later triggers can keep appending to the same store
    val sch = spark.read.parquet(dir).schema
    assert(sch("s_qty").dataType.toString == "DecimalType(22,1)", sch.toString)
  }
}
