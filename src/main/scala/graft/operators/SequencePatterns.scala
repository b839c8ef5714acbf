package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** SEQUENCE-PATTERN MATCHING over per-user event journeys — the
  * SQL:2016 MATCH_RECOGNIZE capability Spark lacks, expressed
  * Spark-first: each user's ordered event history collapses to a
  * compact SYMBOL STRING (one char per event — the five types have
  * distinct initials), and row-pattern queries become REGEXES over
  * those strings, evaluated scan-side. Patterns here: immediate
  * view→click, view eventually converting to purchase with no
  * intervening purchase, error bursts (≥2 consecutive), and
  * signup→view onboarding.
  *
  * Determinism: journeys order by (ts, event_id) — total; regex
  * dialect is the char-class/quantifier common subset where Java
  * (Spark) and RE2 (DuckDB) agree, with non-overlapping greedy
  * find-all semantics identical for these deterministic patterns.
  *
  * 100 TB: ONE user_id exchange builds the journey strings
  * (collect_list is ObjectHashAggregate — map-side partials); ALL
  * patterns evaluate in one explode+aggregate pass over the journeys
  * — adding a pattern costs a scan-side regex, never another shuffle.
  * The per-user string IS the materialization a production
  * row-pattern engine builds. Honest bound: the string is per-user
  * event count — a bot with 10⁸ events makes a 100 MB row, so a
  * production run caps history first (sessionize, or truncate to the
  * trailing N events — a deterministic per-user bounded TopKByScore
  * pick); the pattern algebra is unchanged under that cap. */
object SequencePatterns {

  val patterns: Seq[String] = Seq("vc", "v[^p]*p", "ee+", "sv")

  val qSequencePatterns: GraftQuery = GraftQuery(
    "q318_sequence_patterns",
    s"""WITH j AS (
       |  SELECT user_id,
       |    string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id) AS jn
       |  FROM events GROUP BY user_id),
       |m AS (
       |  SELECT p.pattern,
       |    CAST(len(regexp_extract_all(j.jn, p.pattern)) AS BIGINT) AS m
       |  FROM j CROSS JOIN (VALUES ${patterns.map(p => s"('$p')").mkString(", ")}) p(pattern))
       |SELECT pattern,
       |  CAST(COUNT(*) FILTER (m > 0) AS BIGINT) AS n_users,
       |  CAST(SUM(m) AS BIGINT) AS n_matches
       |FROM m GROUP BY pattern
       |ORDER BY pattern""".stripMargin) { (s, d) =>
    val journeys = Tables.events(s, d)
      .groupBy("user_id")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("i")))),
        x => x.getField("i")), "").as("jn"))
    journeys
      .select(explode(array(patterns.map(p =>
        struct(lit(p).as("pattern"),
          expr(s"CAST(regexp_count(jn, '$p') AS BIGINT)").as("m"))): _*)).as("x"))
      .select(col("x.pattern").as("pattern"), col("x.m").as("m"))
      .groupBy("pattern")
      .agg(count(when(col("m") > 0, 1)).as("n_users"),
        sum("m").as("n_matches"))
      .orderBy("pattern")
  }

  def all: Seq[GraftQuery] = Seq(qSequencePatterns)
}
