package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession

/** SQL registration of the graft-native expressions so the text-SQL
  * surface reaches them too:
  *   SELECT cosine_sim(a.embedding, b.embedding), simhash64(toks) ...
  * Column-API callers use the object apply()s directly; this makes the
  * same codegen'd expressions first-class SQL functions.
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("cosine_sim",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "scala_udf")
    registry.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction("simhash_md5",
      exprs => SimHashMd5(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction("pg_float8_text",
      exprs => PgFloat8Text(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction("nfc_normalize",
      exprs => NfcNormalize(exprs.head), "scala_udf")
    registry.createOrReplaceTempFunction("shingle_set",
      exprs => ShingleSet(exprs(0), intLit(exprs(1))), "scala_udf")
    registry.createOrReplaceTempFunction("minhash_bands",
      exprs => MinHashBandHashes(exprs(0), intLit(exprs(1)), intLit(exprs(2)),
        intLit(exprs(3))), "scala_udf")
    registry.createOrReplaceTempFunction("char_gram_vector",
      exprs => CharGramVector(exprs(0), intLit(exprs(1))), "scala_udf")
    registry.createOrReplaceTempFunction("dot_product",
      exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
  }

  /** SQL-literal int argument (width/hash/band counts are plan-time
    * constants, not data). */
  private[graftshim] def intLit(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Int =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"expected an integer literal argument, got $other")
    }
}
