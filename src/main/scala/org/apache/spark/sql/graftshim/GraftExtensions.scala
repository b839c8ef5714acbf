package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: deployments that can't call
  * GraftFunctions.register in code get the graft-native expressions via
  * configuration —
  *   spark.sql.extensions=org.apache.spark.sql.graftshim.GraftExtensions
  *
  * No optimizer Rule or planner Strategy is injected deliberately:
  * every graft operator either composes built-ins Catalyst already
  * optimizes or is an Expression/TypedImperativeAggregate, which hook
  * in at the function layer (SURVEY §4.3/§7.3 — revisit only if a
  * physical ANN strategy becomes necessary).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash_md5"),
      new ExpressionInfo(classOf[SimHashMd5].getName, "simhash_md5"),
      (exprs: Seq[Expression]) => SimHashMd5(exprs.head)))
  }
}
