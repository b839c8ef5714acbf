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

  /** SCD2 snapshot (dbt snapshot `check` strategy) across two runs
    * with INJECTED run timestamps: run 1 snapshots pre-cut per-user
    * stats; run 2 snapshots the full-corpus stats. Users with post-cut
    * events get a closed history row (valid_to = T2) plus a new
    * current row; unchanged users keep their single open row. The
    * oracle restates the contract from scratch over a full outer join
    * of the two batch aggregates. (scd_id is excluded: it hashes
    * string-rendered doubles, whose text form is engine-specific.) */
  val qScd2Snapshot: GraftQuery = GraftQuery(
    "q88_scd2_snapshot",
    s"""WITH b1 AS (
       |  SELECT user_id, COUNT(*) AS n_events,
       |    CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
       |  FROM events WHERE ts < TIMESTAMP '$cut' GROUP BY user_id),
       |b2 AS (
       |  SELECT user_id, COUNT(*) AS n_events,
       |    CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
       |  FROM events GROUP BY user_id),
       |j AS (
       |  SELECT b2.user_id, b1.n_events AS n1, b1.sum_value AS s1,
       |         b2.n_events AS n2, b2.sum_value AS s2,
       |         b1.user_id IS NOT NULL AS in_b1
       |  FROM b2 LEFT JOIN b1 ON b1.user_id = b2.user_id)
       |SELECT user_id, n_events, sum_value, valid_from, valid_to FROM (
       |  SELECT user_id, n1 AS n_events, s1 AS sum_value,
       |    TIMESTAMP '2026-01-01 00:00:00' AS valid_from,
       |    CAST(NULL AS TIMESTAMP) AS valid_to
       |  FROM j WHERE in_b1 AND n1 = n2 AND s1 = s2
       |  UNION ALL
       |  SELECT user_id, n1, s1,
       |    TIMESTAMP '2026-01-01 00:00:00', TIMESTAMP '2026-01-02 00:00:00'
       |  FROM j WHERE in_b1 AND (n1 <> n2 OR s1 <> s2)
       |  UNION ALL
       |  SELECT user_id, n2, s2,
       |    TIMESTAMP '2026-01-02 00:00:00', CAST(NULL AS TIMESTAMP)
       |  FROM j WHERE NOT in_b1 OR n1 <> n2 OR s1 <> s2)
       |ORDER BY user_id, valid_from""".stripMargin) { (s, d) =>
    val path = java.nio.file.Files.createTempDirectory("graft_scd").toString + "/snap"
    val ev = Tables.events(s, d)
    def stats(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("user_id").agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("sum_value"))
    graft.model.Snapshot.run(s, stats(ev.where(col("ts") < to_timestamp(lit(cut)))),
      path, "user_id", to_timestamp(lit("2026-01-01 00:00:00")))
    graft.model.Snapshot.run(s, stats(ev),
      path, "user_id", to_timestamp(lit("2026-01-02 00:00:00")))
      .select("user_id", "n_events", "sum_value", "valid_from", "valid_to")
      .orderBy("user_id", "valid_from")
  }

  def all: Seq[GraftQuery] = Seq(qIncrementalModel, qScd2Snapshot)
}
