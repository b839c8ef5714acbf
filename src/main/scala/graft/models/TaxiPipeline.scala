package graft.models

import graft.dq.DataQuality
import graft.etl.Ingest
import graft.model.{Model, ModelRegistry}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.current_date

/** The reference pipeline end-to-end, wired through the engine's own
  * components (SURVEY §3): ingest (ETL/ETL.py) → model DAG
  * (raw_texi → core_texi, dbt run) → declarative data-quality suite
  * (schema.yml tests). One call reproduces the whole reference
  * behavior on any raw taxi-shaped input.
  */
object TaxiPipeline {

  final case class Result(
      tables: Map[String, DataFrame],
      dqReport: Seq[DataQuality.DqResult]) {
    def passed: Boolean = dqReport.forall(_.passed)
  }

  /** Build the two-model registry over a raw source. */
  def registry(raw: DataFrame, ingestionDate: Column = current_date()): ModelRegistry = {
    val reg = new ModelRegistry(Map("texi_data" -> raw))
    reg.register(Model("raw_texi", Seq("texi_data"))(m => TaxiModels.rawTexi(m("texi_data"))))
    reg.register(Model("core_texi", Seq("raw_texi"))(m =>
      TaxiModels.coreTexi(m("raw_texi"), ingestionDate)))
    reg
  }

  /** dbt-run equivalent: materialize the DAG, then run the five
    * declared assertions against core_texi (SURVEY §5.1). */
  def run(spark: SparkSession, raw: DataFrame, outDir: String,
      ingestionDate: Column = current_date()): Result = {
    val tables = registry(raw, ingestionDate).run(spark, outDir)
    Result(tables, DataQuality.runAll(tables("core_texi"), DataQuality.coreTexiSuite))
  }

  /** Full reference flow from a CSV file: ETL ingest (chunk-capped,
    * overwrite) then model run + tests. */
  def runFromCsv(spark: SparkSession, csvPath: String, outDir: String,
      rowCap: Int = Ingest.referenceRowCap,
      ingestionDate: Column = current_date()): Result = {
    Ingest.load(spark, csvPath, s"$outDir/texi_data", rowCap)
    run(spark, spark.read.parquet(s"$outDir/texi_data"), outDir, ingestionDate)
  }
}
