package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of join: for each left row, attach the most recent right row
  * (per key) whose time is <= the left row's time. Spark has no native
  * operator; the naive formulation (inequality join + keep max) plans
  * a cartesian-per-key join — quadratic in rows-per-key.
  *
  * This implementation uses the union + window trick (the standard
  * scalable composition): tag both sides, union on (key, time), and
  * carry the latest right-side payload forward with last_value(...)
  * IGNORE NULLS over (partition key, order time). One shuffle on the
  * key, linear work per partition — survives arbitrarily large sides
  * where the inequality join blows up. This is preference tier (a)
  * "compose built-ins" (SURVEY §7.3): the composition IS the efficient
  * plan, so no custom SparkPlan is warranted.
  *
  * Ordering within equal timestamps: right (build) rows sort BEFORE
  * left (probe) rows at the same instant, so an exactly-simultaneous
  * right row is visible to the left row — matching DuckDB
  * ASOF JOIN's >= semantics.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      build side (its latest row as-of is attached)
    * @param key        equi-key column name present on both sides
    * @param leftTime   event-time column on left
    * @param rightTime  event-time column on right
    * @param payload    right-side columns to carry (renamed as given)
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      payload: Seq[(String, String)]): DataFrame = {
    val leftCols = left.columns
    // ALL payload columns ride in ONE struct carried by last(ignoreNulls):
    // carrying them individually would let each column skip nulls
    // independently — a right row with a genuinely NULL payload field
    // would leak the previous row's value, and one output row could mix
    // fields from different right rows. The struct is never null for
    // right rows, so its fields (null or not) travel together.
    val lTagged = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .select(
        (col(key).as("__k") +: col("__t") +: col("__side") +:
          leftCols.map(c => col(c).as(s"__l_$c")) ++:
          Seq(lit(null)
            .cast(org.apache.spark.sql.types.StructType(payload.map { case (in, out) =>
              org.apache.spark.sql.types.StructField(out, right.schema(in).dataType)
            }))
            .as("__p"))): _*)
    val rTagged = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .select(
        (col(key).as("__k") +: col("__t") +: col("__side") +:
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")) ++:
          Seq(struct(payload.map { case (in, out) => col(in).as(out) }: _*)
            .as("__p"))): _*)

    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lTagged.unionByName(rTagged)
      .select(
        (col("__side") +:
          leftCols.map(c => col(s"__l_$c")) ++:
          Seq(last(col("__p"), ignoreNulls = true).over(w).as("__p"))): _*)
    carried.where(col("__side") === 1)
      .select((leftCols.toIndexedSeq.map(c => col(s"__l_$c").as(c)) ++
        payload.map { case (_, out) => col(s"__p.$out").as(out) }): _*)
  }

  /** Events as-of-joined to the user's latest prior order (events.user_id
    * is drawn from the same id space as orders.o_custkey in the
    * testdata star schema). Oracle: DuckDB's native ASOF JOIN.
    *
    * The build side is pre-reduced to ONE row per (key, time) — ties
    * between same-day orders are broken toward the max orderkey on both
    * sides (arg_max in DuckDB), otherwise as-of tie-picks are engine-
    * arbitrary and the comparison nondeterministic. */
  val qAsOfJoin: GraftQuery = GraftQuery(
    "q37_asof_join",
    """WITH o1 AS (
      |  SELECT o_custkey AS user_id, o_orderdate,
      |    MAX(o_orderkey) AS o_orderkey,
      |    arg_max(o_totalprice, o_orderkey) AS o_totalprice
      |  FROM orders GROUP BY 1, 2)
      |SELECT e.event_id, e.user_id,
      |  CAST(floor(epoch(e.ts)) AS BIGINT) AS ts_sec,
      |  o.o_orderkey AS last_orderkey, o.o_totalprice AS last_totalprice
      |FROM events e
      |ASOF LEFT JOIN o1 o
      |  ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
      |ORDER BY e.event_id""".stripMargin,
    headline = true) { (s, d) =>
    val events = Tables.events(s, d)
    val orders = Tables.orders(s, d)
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"),
        max_by(col("o_totalprice"), col("o_orderkey")).as("o_totalprice"))
    asOf(events, orders, key = "user_id", leftTime = "ts", rightTime = "o_orderdate",
      payload = Seq("o_orderkey" -> "last_orderkey", "o_totalprice" -> "last_totalprice"))
      .select(col("event_id"), col("user_id"),
        unix_timestamp(col("ts")).as("ts_sec"),
        col("last_orderkey"), col("last_totalprice"))
      .orderBy("event_id")
  }

  /** As-of with TOLERANCE: each purchase matched to the same user's
    * latest click, but only if it landed within the preceding hour —
    * the bounded-lookback form every feature-store join uses. The
    * match is computed as an unbounded as-of carrying the matched
    * time, then aged out with one CASE (identical semantics to a
    * tolerance-aware join, no second pass). */
  val qAsOfTolerance: GraftQuery = GraftQuery(
    "q84_asof_tolerance",
    """WITH clicks AS (
      |  SELECT user_id, ts, MAX(event_id) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
      |purchases AS (
      |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id,
      |  CASE WHEN c.ts >= p.ts - INTERVAL 1 HOUR THEN c.click_id END AS recent_click_id,
      |  CASE WHEN c.ts >= p.ts - INTERVAL 1 HOUR
      |       THEN CAST(floor(epoch(c.ts)) AS BIGINT) END AS recent_click_sec
      |FROM purchases p
      |ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val clicks = ev.where(col("event_type") === "click")
      .groupBy("user_id", "ts").agg(max(col("event_id")).as("click_id"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val joined = asOf(purchases, clicks, key = "user_id",
      leftTime = "ts", rightTime = "ts",
      payload = Seq("click_id" -> "m_click_id", "ts" -> "m_click_ts"))
    val fresh = col("m_click_ts") >= col("ts") - expr("INTERVAL 1 HOUR")
    joined.select(
      col("event_id"), col("user_id"),
      when(fresh, col("m_click_id")).as("recent_click_id"),
      when(fresh, unix_timestamp(col("m_click_ts"))).as("recent_click_sec"))
      .orderBy("event_id")
  }

  def all: Seq[GraftQuery] = Seq(qAsOfJoin, qAsOfTolerance)
}
