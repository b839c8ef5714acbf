package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Lives in the shim package: SparkSessionExtensions.registerFunctions
  * is private[sql]. The real config-path drive (spark.sql.extensions in
  * a fresh JVM) happens in the verification runs; here we assert the
  * injection itself lands in a registry. */
class GraftExtensionsSpec extends graft.SparkSpecBase {

  test("GraftExtensions injects cosine_sim and simhash64 into a registry") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val registry = FunctionRegistry.builtin.clone()
    assert(!registry.functionExists(FunctionIdentifier("cosine_sim")))
    ext.registerFunctions(registry)
    assert(registry.functionExists(FunctionIdentifier("cosine_sim")))
    assert(registry.functionExists(FunctionIdentifier("simhash64")))
    // the builder produces the real expression
    val e = registry.lookupFunction(FunctionIdentifier("cosine_sim"),
      Seq(org.apache.spark.sql.catalyst.expressions.Literal(null),
        org.apache.spark.sql.catalyst.expressions.Literal(null)))
    assert(e.isInstanceOf[CosineSimilarity])
    // the full function surface stays in lockstep with GraftFunctions
    for (name <- Seq("simhash_md5", "pg_float8_text", "nfc_normalize",
        "shingle_set", "minhash_bands", "dot_product", "char_gram_vector"))
      assert(registry.functionExists(FunctionIdentifier(name)), name)
  }

  test("config-path injection carries the FK join-elimination rule and it fires") {
    import org.apache.spark.sql.functions._
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val rules = ext.buildOptimizerRules(spark)
    val rule = rules.collectFirst {
      case r: graft.plans.JoinElim.FkJoinElimination => r
    }.getOrElse(fail("FkJoinElimination not injected"))
    // extraOptimizations / injected user rules both run after the main
    // optimizer batches — applying the built rule to the standard
    // optimized plan reproduces exactly that position.
    val q = graft.sources.Tables.orders(spark, sf001).as("o")
      .join(graft.sources.Tables.customer(spark, sf001).as("c"),
        col("o.o_custkey") === col("c.c_custkey"), "left")
      .groupBy(col("o.o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val before = q.queryExecution.optimizedPlan
    assert(before.toString.contains("Join LeftOuter"), before.toString)
    val after = rule(before)
    assert(!after.toString.toLowerCase.contains("join"),
      s"injected rule must eliminate the unused-dim join:\n$after")
  }
}
