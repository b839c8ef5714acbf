package graft

import java.nio.file.{Files, Paths}

/** Dev tool: dump `explain("formatted")` of named queries to
  * `<outDir>/<name>_<tag>.txt` — the `plans/r{N}/` before/after
  * optimization evidence. Args: outDir tag q1,q2,...
  * Special names:
  *  - `zorder_maintain_read` — the scan stage of
  *    [[graft.operators.ZOrder.incrementalMaintain]] (the subplan the
  *    r13 pruning changed; the q173 census plan itself is unchanged).
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val outDir = args(0); val tag = args(1)
    val names = args(2).split(",").toSeq
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.spark.Sessions.local("plansnap", 8)
    Files.createDirectories(Paths.get(outDir))
    def fmt(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
    names.foreach { n =>
      val plan = n match {
        case "zorder_maintain_read" =>
          import org.apache.spark.sql.functions._
          import graft.operators.ZOrder
          val path = graft.operators.Formats.scratchDir("graft_plansnap_z", d)
          graft.operators.Formats.wipe(path)
          val coded = ZOrder.eventCells(graft.sources.Tables.events(spark, d))
          ZOrder.writeLayout(
            coded.where(pmod(col("event_id"), lit(5L)) =!= 4L), path)
          val batch = coded.where(pmod(col("event_id"), lit(5L)) === 4L)
          fmt(ZOrder.maintainMergeInput(spark, path, batch))
        case "zorder_maintain_read_r12" =>
          // the PRE-r13 merge-input expression, reconstructed verbatim
          // from the r12 incrementalMaintain body (full-tree scan
          // semi-joined against the touched set) — the `_before` plan
          import org.apache.spark.sql.functions._
          import graft.operators.ZOrder
          val path = graft.operators.Formats.scratchDir("graft_plansnap_z", d)
          graft.operators.Formats.wipe(path)
          val coded = ZOrder.eventCells(graft.sources.Tables.events(spark, d))
          ZOrder.writeLayout(
            coded.where(pmod(col("event_id"), lit(5L)) =!= 4L), path)
          val batch = coded.where(pmod(col("event_id"), lit(5L)) === 4L)
          val touched = batch.select("cell").distinct()
          val schema = "event_id BIGINT, user_id BIGINT, ub BIGINT, " +
            "tb BIGINT, morton BIGINT, cell BIGINT"
          fmt(spark.read.schema(schema).parquet(path)
            .join(broadcast(touched), Seq("cell"), "left_semi")
            .unionByName(batch))
        case _ => fmt(SparkEntry.queries(n)(spark, d))
      }
      Files.writeString(Paths.get(outDir, s"${n}_$tag.txt"), plan)
      println(s"PLAN_WRITTEN $n ${plan.length}")
    }
    spark.stop()
  }
}
