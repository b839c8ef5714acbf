package graft

import graft.plans.JoinElim
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FK join elimination: the plan really drops the dim scan, results
  * are identical with the rule off, and every unsound shape refuses. */
class JoinElimSpec extends SparkSpecBase {

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def leftQ(): DataFrame =
    Tables.orders(spark, sf001).as("o")
      .join(Tables.customer(spark, sf001).as("c"),
        col("o.o_custkey") === col("c.c_custkey"), "left")
      .groupBy(col("o.o_orderpriority"))
      .agg(count(lit(1)).as("n"))

  test("left-outer join to an unused unique-key dim is dropped from the plan") {
    JoinElim.withRule(spark) {
      val p = leftQ().queryExecution.executedPlan.toString
      assert(!p.contains("customer.parquet"), s"dim scan must be gone:\n$p")
      assert(!p.toLowerCase.contains("join"), s"no join should remain:\n$p")
    }
  }

  test("inner FK join rewrites to a not-null filter on the fact side") {
    JoinElim.withRule(spark) {
      val df = Tables.lineitem(spark, sf001).as("l")
        .join(Tables.orders(spark, sf001).as("o"),
          col("l.l_orderkey") === col("o.o_orderkey"))
        .groupBy(col("l.l_returnflag")).agg(count(lit(1)).as("n"))
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("orders.parquet"), s"dim scan must be gone:\n$p")
      assert(p.contains("isnotnull(l_orderkey"),
        s"inner elimination must keep the null filter:\n$p")
    }
  }

  test("elimination is exact: rule-on equals rule-off") {
    val off = rows(leftQ())
    val on = JoinElim.withRule(spark)(rows(leftQ().localCheckpoint()))
    assert(on == off)
  }

  test("refusals: used dim columns, non-FK inner join, non-key equality") {
    JoinElim.withRule(spark) {
      // dim column referenced → join must stay
      val used = Tables.orders(spark, sf001).as("o")
        .join(Tables.customer(spark, sf001).as("c"),
          col("o.o_custkey") === col("c.c_custkey"), "left")
        .groupBy(col("c.c_mktsegment")).agg(count(lit(1)).as("n"))
      assert(used.queryExecution.executedPlan.toString.contains("customer.parquet"))

      // inner join on a NON-declared edge (customer⋈nation is declared,
      // customer⋈orders via c_custkey=o_custkey is a pk=fk flip where
      // the FACT side is customer — fk 'o_custkey' belongs to orders,
      // so eliminating ORDERS (the right side) must refuse: o_custkey
      // is not a declared unique key of orders
      val flipped = Tables.customer(spark, sf001).as("c")
        .join(Tables.orders(spark, sf001).as("o"),
          col("c.c_custkey") === col("o.o_custkey"))
        .groupBy(col("c.c_mktsegment")).agg(count(lit(1)).as("n"))
      assert(flipped.queryExecution.executedPlan.toString.contains("orders.parquet"),
        "a many-rows-per-key dim side must never be eliminated")

      // equality on a non-key dim column → refuse
      val nonKey = Tables.orders(spark, sf001).as("o")
        .join(Tables.customer(spark, sf001).as("c"),
          col("o.o_custkey") === col("c.c_nationkey"), "left")
        .groupBy(col("o.o_orderpriority")).agg(count(lit(1)).as("n"))
      assert(nonKey.queryExecution.executedPlan.toString.contains("customer.parquet"))
    }
  }

  test("the refused many-per-key shape would actually change results — the guard matters") {
    // count(*) through customer⋈orders multiplies customer rows by
    // their order counts; dropping that join would be WRONG. Verify
    // the rule-on result still equals the real join.
    val q = () => Tables.customer(spark, sf001).as("c")
      .join(Tables.orders(spark, sf001).as("o"),
        col("c.c_custkey") === col("o.o_custkey"))
      .agg(count(lit(1)).as("n"))
    val real = q().collect()(0).getLong(0)
    val on = JoinElim.withRule(spark)(q().localCheckpoint().collect()(0).getLong(0))
    val bare = Tables.customer(spark, sf001).count()
    assert(on == real && real != bare,
      s"join fan-out must survive ($real real vs $bare bare)")
  }
}
