package graft

import org.apache.spark.sql.graftshim.GraftFunctions

class GraftFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  test("native expressions are callable from text SQL after registration") {
    GraftFunctions.register(spark)
    Seq((Seq(1f, 0f), Seq(1f, 0f), Seq("a", "b", "c")))
      .toDF("x", "y", "toks").createOrReplaceTempView("vecs")
    val r = spark.sql(
      "SELECT cosine_sim(x, y) AS cs, simhash64(toks) AS sh, simhash_md5(toks) AS shm FROM vecs").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    // must equal the Column-API forms — same expressions underneath
    val viaColumn = spark.table("vecs")
      .select(graft.operators.Dedup.simhash64($"toks"),
        org.apache.spark.sql.graftshim.SimHashMd5($"toks")).head()
    assert(r.getLong(1) === viaColumn.getLong(0))
    assert(r.getLong(2) === viaColumn.getLong(1))
  }

  test("dedup/text expressions reach SQL: shingle_set, minhash_bands, nfc_normalize, pg_float8_text") {
    GraftFunctions.register(spark)
    Seq((Seq("a", "b", "c", "d"), "café", 15.0))
      .toDF("toks", "txt", "d").createOrReplaceTempView("gfuncs")
    val r = spark.sql(
      """SELECT shingle_set(toks, 3) AS sh, minhash_bands(toks, 4, 2, 3) AS mb,
        |  nfc_normalize(txt) AS nrm, pg_float8_text(d) AS pgd FROM gfuncs""".stripMargin).head()
    assert(r.getSeq[String](0) === Seq("a b c", "b c d"))
    val viaColumn = spark.table("gfuncs")
      .select(graft.operators.Dedup.shinglesFromToks($"toks"),
        org.apache.spark.sql.graftshim.MinHashBandHashes($"toks", 4, 2, 3)).head()
    assert(r.getSeq[String](0) === viaColumn.getSeq[String](0))
    assert(r.getSeq[String](1) === viaColumn.getSeq[String](1))
    assert(r.getString(2) === "café")
    assert(r.getString(3) === "15")
    // non-literal config arguments are a registration-time error
    val err = intercept[Exception](
      spark.sql("SELECT minhash_bands(toks, CAST(length(txt) AS INT), 2, 3) FROM gfuncs").head())
    assert(err.getMessage.contains("literal"))
  }
}
