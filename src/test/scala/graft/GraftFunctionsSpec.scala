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
}
