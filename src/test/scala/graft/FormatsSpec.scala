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

  test("hive-partitioned write prunes partitions at the scan") {
    import org.apache.spark.sql.functions._
    val o = Tables.orders(spark, sf001).withColumn("o_year", year(col("o_orderdate")))
    o.write.partitionBy("o_year").mode("overwrite").parquet(s"$dir/o_part")
    val back = spark.read.parquet(s"$dir/o_part").where(col("o_year") === 1996)
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("o_year"),
      s"partition filter must reach the scan:\n$plan")
    assert(back.count() === o.where(col("o_year") === 1996).count())
  }

  test("q135 exports a hive layout with bounded file sizes and a " +
      "prunable partition tree") {
    import org.apache.spark.sql.functions._
    SparkEntry.queries("q135_partitioned_export")(spark, sf001).count()
    val root = new java.io.File(operators.Formats.exportScratchDir(sf001))
    val langDirs = root.listFiles().filter(_.getName.startsWith("lang="))
    assert(langDirs.nonEmpty, s"no lang= partitions under $root")
    val splitDirs = langDirs.flatMap(_.listFiles()).filter(_.isDirectory)
    assert(splitDirs.forall(_.getName.startsWith("split=")))
    // bounded files: every parquet part holds ≤ the configured cap,
    // and at least one partition needed more than one file for it
    val perPartFiles = splitDirs.map(
      _.listFiles().count(f => f.getName.endsWith(".parquet")))
    assert(perPartFiles.exists(_ >= 2),
      s"expected a partition with several bounded files, got ${perPartFiles.toSeq}")
    val back = spark.read.parquet(root.toString)
    assert(back.count() ===
      graft.sources.Tables.documents(spark, sf001).count())
    // the trainer's pruned read: only the requested partition is scanned
    val pruned = back.where(col("lang") === "en" && col("split") === "train")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"partition filters must reach the scan:\n${plan.take(1500)}")
  }

  test("q118 writes genuine JSON Lines: one parseable object per line") {
    import org.apache.spark.sql.functions._
    SparkEntry.queries("q118_jsonl_roundtrip")(spark, sf001).count()
    val out = new java.io.File(operators.Formats.jsonlScratchDir(sf001))
    val parts = out.listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty, s"no JSONL part files under $out")
    val firstLine = scala.io.Source.fromFile(parts.minBy(_.getName))
      .getLines().next()
    // a JSON object per line, keyed by the documents schema
    assert(firstLine.startsWith("{") && firstLine.endsWith("}"))
    assert(firstLine.contains("\"doc_id\""))
  }

  test("q164: ORC read-back is row-identical to the source table, schema carried in-file") {
    SparkEntry.queries("q164_orc_roundtrip")(spark, sf001).collect() // writes
    val back = spark.read.orc(operators.Formats.scratchDir("graft_orc", sf001))
    assert(back.schema === graft.sources.Tables.documents(spark, sf001).schema)
    val orig = graft.sources.Tables.documents(spark, sf001)
      .collect().map(_.toSeq).toSet
    val rt = back.collect().map(_.toSeq).toSet
    assert(rt === orig, "ORC roundtrip must be lossless row for row")
  }

  test("q213: mergeSchema surfaces v1-missing columns as NULL, never another row's data") {
    import org.apache.spark.sql.functions._
    SparkEntry.queries("q213_schema_evolution")(spark, sf001).collect() // stages
    val back = spark.read.option("mergeSchema", "true")
      .parquet(operators.Formats.scratchDir("graft_schema_evo", sf001))
    assert(back.columns.toSet ===
      Set("event_id", "user_id", "event_type", "value", "props"))
    // every even event_id (generation-1 file) reads NULL for the
    // widened columns; every odd one carries its original value
    assert(back.where(pmod(col("event_id"), lit(2L)) === 0L &&
      (col("value").isNotNull || col("props").isNotNull)).count() === 0L)
    val oddNull = back.where(pmod(col("event_id"), lit(2L)) === 1L &&
      col("value").isNull).count()
    val origNull = Tables.events(spark, sf001)
      .where(pmod(col("event_id"), lit(2L)) === 1L && col("value").isNull).count()
    assert(oddNull === origNull, "v2 rows must keep their original values")
  }
}
