package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: deployments that can't call
  * GraftFunctions.register in code get the graft-native expressions via
  * configuration —
  *   spark.sql.extensions=org.apache.spark.sql.graftshim.GraftExtensions
  *
  * Besides the function surface, the PK/FK join-elimination rule
  * ([[graft.plans.JoinElim.FkJoinElimination]]) is injected as a real
  * optimizer rule: it is self-contained (its constraint declarations
  * travel with it and it refuses every undeclared shape), so the
  * config path gets the same semantic-layer join pruning that
  * `JoinElim.withRule` provides programmatically. The MV rewrite rule
  * ([[graft.plans.MvRewrite.LineitemMvRule]]) is NOT injected — it is
  * parameterized by a per-deployment materialized-view relation, so
  * it stays an explicit `MvRewrite.withRule(spark, dir)` opt-in. No
  * planner Strategy is injected: every graft operator either composes
  * built-ins Catalyst already optimizes or is an Expression/
  * TypedImperativeAggregate, which hook in at the function layer
  * (SURVEY §4.3/§7.3 — revisit only if a physical ANN strategy
  * becomes necessary).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => new graft.plans.JoinElim.FkJoinElimination)
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
    ext.injectFunction((
      FunctionIdentifier("pg_float8_text"),
      new ExpressionInfo(classOf[PgFloat8Text].getName, "pg_float8_text"),
      (exprs: Seq[Expression]) => PgFloat8Text(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier("shingle_set"),
      new ExpressionInfo(classOf[ShingleSet].getName, "shingle_set"),
      (exprs: Seq[Expression]) =>
        ShingleSet(exprs(0), GraftFunctions.intLit(exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinHashBandHashes].getName, "minhash_bands"),
      (exprs: Seq[Expression]) => MinHashBandHashes(exprs(0),
        GraftFunctions.intLit(exprs(1)), GraftFunctions.intLit(exprs(2)),
        GraftFunctions.intLit(exprs(3)))))
    ext.injectFunction((
      FunctionIdentifier("char_gram_vector"),
      new ExpressionInfo(classOf[CharGramVector].getName, "char_gram_vector"),
      (exprs: Seq[Expression]) =>
        CharGramVector(exprs(0), GraftFunctions.intLit(exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, null, "dot_product",
        "dot_product(a, b) - Dot product of two ARRAY<FLOAT> columns. " +
          "On a dimension mismatch the arrays are truncated to the common " +
          "prefix (matching cosine_sim), and NULL elements contribute 0.0; " +
          "callers needing strict dimensional checks must validate " +
          // 5th arg "" (not null): in the 11-arg ExpressionInfo ctor this
          // slot is `arguments`, which must be non-null — null trips the
          // ctor assertion under -ea and renders "Extended Usage: null".
          "cardinality/size upstream.", ""),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
  }
}
