package graft.dq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** dbt-style declarative data-quality tests: a test is a SQL query
  * returning VIOLATING rows; it passes iff the result is empty
  * (reference contract: SURVEY §5.1;
  * /root/reference/dbt_project_old/dbt_postgres/models/schema.yml:10-27,
  * macros/custom_positive_test.sql:1-5, macros/custom_speed_limit.sql:1-5).
  *
  * Tests are plain (DataFrame, Column) => DataFrame functions — no
  * Catalyst extension needed (SURVEY §4.3). The runner evaluates each
  * with a single count() action; at 100 TB prefer `runAllFused`, which
  * computes every violation count in ONE pass over the table
  * (conditional aggregation) instead of one scan per test.
  */
object DataQuality {
  type DqTest = DataFrame => DataFrame

  /** dbt built-in `not_null` (schema.yml:17,22): rows where col IS NULL. */
  def notNull(c: Column): DqTest = df => df.where(c.isNull)

  /** dbt built-in `unique` (schema.yml:18), compiled form:
    * WHERE col IS NOT NULL GROUP BY key HAVING count(*) > 1 (operator
    * A1). The null pre-filter matches dbt exactly — duplicate NULLs
    * are not uniqueness violations (that's `not_null`'s job). */
  def unique(c: Column): DqTest =
    df => df.where(c.isNotNull)
      .groupBy(c).agg(count(lit(1)).as("n")).where(col("n") > 1)

  /** custom_positive_test.sql:1-5: rows where col <= 0. */
  def positive(c: Column): DqTest = df => df.where(c <= 0)

  /** custom_speed_limit.sql:1-5: rows where col > 300. NULLs pass by
    * design (NULL > 300 is not true) — the column is nullable by
    * construction (core_texi.sql:88-92). */
  def speedLimit(c: Column, limit: Double = 300.0): DqTest = df => df.where(c > limit)

  final case class DqResult(name: String, violations: Long) {
    def passed: Boolean = violations == 0
  }

  /** One action per test (dbt-equivalent behavior, A3). */
  def runAll(df: DataFrame, tests: Seq[(String, DqTest)]): Seq[DqResult] =
    tests.map { case (n, t) => DqResult(n, t(df).count()) }

  /** Single-pass variant for row-predicate tests: one scan computes all
    * violation counts via sum(CASE WHEN violated THEN 1 END). Only
    * row-local predicates fuse; aggregate-shaped tests (unique) still
    * need their own pass. */
  def runAllFused(df: DataFrame, predTests: Seq[(String, Column)]): Seq[DqResult] = {
    if (predTests.isEmpty) return Nil
    val aggs = predTests.map { case (n, viol) =>
      sum(when(viol, 1L).otherwise(0L)).as(n)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    predTests.zipWithIndex.map { case ((n, _), i) =>
      DqResult(n, Option(row.get(i)).map(_.asInstanceOf[Long]).getOrElse(0L))
    }
  }

  /** The reference's five declared assertions over the core model
    * (schema.yml:17-27), ready to run against coreTexi output. */
  def coreTexiSuite: Seq[(String, DqTest)] = Seq(
    "unique_id_not_null" -> notNull(col("unique_id")),
    "unique_id_unique" -> unique(col("unique_id")),
    "trip_duration_not_null" -> notNull(col("trip_duration_minutes")),
    "trip_duration_positive" -> positive(col("trip_duration_minutes")),
    "avg_speed_limit" -> speedLimit(col("avg_speed_mph")))
}
