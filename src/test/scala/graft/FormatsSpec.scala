package graft

import graft.sources.Tables

/** Source/sink format coverage: parquet is the primary format; CSV,
  * JSON, and ORC round-trip through the same DataFrame surface. */
class FormatsSpec extends SparkSpecBase {

  private lazy val dir = java.nio.file.Files.createTempDirectory("graft_fmt").toString
  private lazy val nation = Tables.nation(spark, sf001)

  test("csv round-trip (header + inferSchema)") {
    nation.write.option("header", true).mode("overwrite").csv(s"$dir/n_csv")
    val back = spark.read.option("header", true).option("inferSchema", true)
      .csv(s"$dir/n_csv")
    assert(back.count() === nation.count())
    assert(back.columns.toSeq === nation.columns.toSeq)
  }

  test("json round-trip") {
    nation.write.mode("overwrite").json(s"$dir/n_json")
    val back = spark.read.json(s"$dir/n_json")
    assert(back.count() === nation.count())
    assert(back.columns.sorted.toSeq === nation.columns.sorted.toSeq)
  }

  test("orc round-trip preserves schema exactly") {
    nation.write.mode("overwrite").orc(s"$dir/n_orc")
    val back = spark.read.orc(s"$dir/n_orc")
    assert(back.schema === nation.schema)
    assert(back.count() === nation.count())
  }
}
