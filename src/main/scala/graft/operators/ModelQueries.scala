package graft.operators

import graft.GraftQuery
import graft.model.{Materialization, Model, ModelRegistry}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Oracle-checked model-framework queries: the dbt-style materialization
  * contracts exercised end to end THROUGH the registry (not just
  * spec-level), with the final table contents hash-compared.
  */
object ModelQueries {

  private val cut = "2024-01-20 00:00:00"

  /** Incremental (upsert-by-key) materialization across two runs:
    * run 1 builds per-user stats from events before the cut; run 2
    * re-runs the same model over events at-or-after the cut. Users in
    * the second batch REPLACE their run-1 rows; everyone else is
    * preserved — exactly dbt's incremental unique_key contract. The
    * oracle states the fixpoint directly: batch-2 stats where they
    * exist, else batch-1 stats. */
  val qIncrementalModel: GraftQuery = GraftQuery(
    "q87_incremental_model",
    s"""WITH b1 AS (
       |  SELECT user_id, COUNT(*) AS n_events,
       |    CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
       |  FROM events WHERE ts < TIMESTAMP '$cut' GROUP BY user_id),
       |b2 AS (
       |  SELECT user_id, COUNT(*) AS n_events,
       |    CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
       |  FROM events WHERE ts >= TIMESTAMP '$cut' GROUP BY user_id)
       |SELECT COALESCE(b2.user_id, b1.user_id) AS user_id,
       |  COALESCE(b2.n_events, b1.n_events) AS n_events,
       |  COALESCE(b2.sum_value, b1.sum_value) AS sum_value
       |FROM b1 FULL OUTER JOIN b2 ON b1.user_id = b2.user_id
       |ORDER BY user_id""".stripMargin) { (s, d) =>
    val out = java.nio.file.Files.createTempDirectory("graft_inc").toString
    val ev = Tables.events(s, d)
    def userStats = Model("user_stats", Seq("events"),
      materialization = Materialization.Incremental("user_id")) { deps =>
      deps("events").groupBy("user_id").agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("sum_value"))
    }
    val cutTs = to_timestamp(lit(cut))
    new ModelRegistry(Map("events" -> ev.where(col("ts") < cutTs)))
      .register(userStats).run(s, out)
    val run2 = new ModelRegistry(Map("events" -> ev.where(col("ts") >= cutTs)))
      .register(userStats).run(s, out)
    run2("user_stats").orderBy("user_id")
  }

  def all: Seq[GraftQuery] = Seq(qIncrementalModel)
}
