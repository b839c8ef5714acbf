package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-funnel conversion and peak-concurrency — the two event
  * analytics that need ORDER, not just counts (the reference's events
  * model stops at per-event enrichment; SURVEY §2 north-star). q221's
  * transition matrix asks where traffic flows one hop at a time;
  * q255 asks how far each user gets through a REQUIRED sequence, and
  * q256 asks how many users are on the site AT ONCE — the load number
  * capacity planning actually needs.
  *
  * House exactness discipline throughout: timestamps are integer
  * microseconds (`unix_micros` / `epoch_us`), rates are integer ppm
  * by cross-multiplied division, and every window carries a unique
  * (ts, event_id) tie-break.
  */
object Funnel {

  /** ORDERED FUNNEL: view → click → purchase, each step strictly
    * AFTER the user's earliest completion of the previous step — the
    * classic product funnel ("of the users who viewed, how many went
    * on to click, then buy?"). Per step: users reaching it and the
    * exact ppm conversion from step 1. Strict `>` on the µs timestamp
    * defines "after" identically in both engines; the per-user chain
    * is earliest-completion (min ts), so a user's funnel position is
    * a pure function of their event set — no path enumeration.
    *
    * Scale (100 TB): each step is a map-side-combinable per-user MIN
    * with ONE exchange on user_id that every subsequent step join
    * REUSES (same key — no new shuffle); work shrinks monotonically
    * down the funnel (step k+1 scans only step-k survivors joined
    * against one event type). The final census is three rows; the
    * unpartitioned first_value window runs over those three rows,
    * never over events. A 30-step funnel is 30 chained min-joins on
    * the same partitioning, not a per-user sort of the whole log. */
  val qFunnelSteps: GraftQuery = GraftQuery(
    "q255_funnel_steps",
    """WITH v AS (
      |  SELECT user_id, min(ts) AS v_ts FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS c_ts
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.v_ts
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS p_ts
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
      |  GROUP BY e.user_id),
      |steps AS (
      |  SELECT 1 AS step, 'view' AS step_name, CAST(count(*) AS BIGINT) AS n_users FROM v
      |  UNION ALL
      |  SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM c
      |  UNION ALL
      |  SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM p)
      |SELECT step, step_name, n_users,
      |  CAST((n_users * 1000000) // first_value(n_users) OVER (ORDER BY step)
      |    AS BIGINT) AS conv_ppm
      |FROM steps ORDER BY step""".stripMargin) { (s, d) =>
    funnelSteps(Tables.events(s, d), Seq("view", "click", "purchase"))
  }

  /** Earliest-completion ordered funnel over (user_id, event_type, ts).
    * Step k+1's per-user min is taken over events strictly after the
    * user's step-k completion (and, when `maxGapUs` is set, within
    * that window of it — the attribution-window form); returns the
    * per-step census. */
  def funnelSteps(events: org.apache.spark.sql.DataFrame,
                  steps: Seq[String],
                  maxGapUs: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"), col("ts"))
    def within(prev: Column): Column = maxGapUs match {
      case Some(g) => col("ts") > prev &&
        unix_micros(col("ts")) <= unix_micros(prev) + g
      case None => col("ts") > prev
    }
    val reached: Seq[org.apache.spark.sql.DataFrame] =
      steps.zipWithIndex.foldLeft(Seq.empty[org.apache.spark.sql.DataFrame]) {
        case (acc, (step, 0)) =>
          acc :+ ev.where(col("event_type") === step)
            .groupBy("user_id").agg(min("ts").as("step_ts"))
        case (acc, (step, _)) =>
          val prev = acc.last.withColumnRenamed("step_ts", "prev_ts")
          acc :+ ev.where(col("event_type") === step)
            .join(prev, "user_id").where(within(col("prev_ts")))
            .groupBy("user_id").agg(min("ts").as("step_ts"))
      }
    val census = reached.zip(steps).zipWithIndex.map { case ((df, nm), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(nm).as("step_name"), col("n_users"))
    }.reduce(_ unionByName _)
    // |steps|-row census — the unpartitioned window is O(steps), not O(events)
    val w = Window.orderBy("step")
    census
      .withColumn("first_n", first("n_users").over(w))
      .withColumn("conv_ppm", expr("(n_users * 1000000) div first_n"))
      .drop("first_n")
      .orderBy("step")
  }

  /** PEAK CONCURRENT SESSIONS per day, by DISTRIBUTED SWEEP LINE.
    * Sessionize each user's stream at a 30-minute inactivity gap
    * (batch twin of q136's session_window), emit +1 at session start
    * and −1 just after session end, and take the running sum's
    * per-day maximum — the "how many users were on the site at once"
    * number. All arithmetic is integer µs; a session is active on
    * the closed interval [start, end], so the −1 lands at end+1µs.
    *
    * Scale (100 TB): the textbook sweep is a GLOBAL ordered running
    * sum — a single-task window at any scale. This plan runs the
    * two-level form instead: boundary deltas collapse to the
    * distinct-µs census, the census partitions by DAY (per-day
    * windows, parallel), and cross-day carry comes from a running sum
    * over the per-day TOTALS — a ≤O(days) relation. Peak(day) =
    * carry(before day) + max(intra-day prefix). Identical to the
    * global sweep (prefix sums compose), but the only unpartitioned
    * window is over the day census. The oracle states the global
    * form; equality IS the distribution proof. Days with no session
    * boundary are not emitted (every day has events in this corpus;
    * a production run would gap-fill from the q75 calendar spine). */
  val qConcurrency: GraftQuery = GraftQuery(
    "q256_peak_concurrency",
    """WITH seq AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |    lag(epoch_us(ts)) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |  FROM events),
      |marks AS (
      |  SELECT user_id, event_id, ts_us,
      |    CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM seq),
      |numbered AS (
      |  SELECT user_id, ts_us,
      |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sess_id
      |  FROM marks),
      |sessions AS (
      |  SELECT user_id, sess_id, min(ts_us) AS start_us, max(ts_us) AS end_us
      |  FROM numbered GROUP BY user_id, sess_id),
      |deltas AS (
      |  SELECT start_us AS b_us, 1 AS d FROM sessions
      |  UNION ALL
      |  SELECT end_us + 1, -1 FROM sessions),
      |census AS (
      |  SELECT b_us, CAST(SUM(d) AS BIGINT) AS d FROM deltas GROUP BY b_us),
      |run AS (
      |  SELECT b_us, d,
      |    SUM(d) OVER (ORDER BY b_us ROWS UNBOUNDED PRECEDING) AS active
      |  FROM census),
      |starts AS (
      |  SELECT start_us // 86400000000 AS day_idx,
      |    CAST(count(*) AS BIGINT) AS n_sessions
      |  FROM sessions GROUP BY 1)
      |SELECT DATE '1970-01-01' + CAST(r.day_idx AS INTEGER) AS day,
      |  s.n_sessions, CAST(MAX(r.active) AS BIGINT) AS peak_concurrent
      |FROM (SELECT b_us // 86400000000 AS day_idx, active FROM run) r
      |JOIN starts s ON r.day_idx = s.day_idx
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin) { (s, d) =>
    peakConcurrency(Tables.events(s, d))
  }

  /** Gap-based batch sessionization: one (user_id) exchange, one
    * per-user ordered window pass. Returns one row per session with
    * exact integer-µs bounds and the event count. */
  def sessionize(events: org.apache.spark.sql.DataFrame,
                 gapUs: Long = 1800000000L): org.apache.spark.sql.DataFrame = {
    val uw = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val seq = events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(uw))
    val marks = seq.withColumn("is_new",
      when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1)
        .otherwise(0))
    val numbered = marks.withColumn("sess_id",
      sum("is_new").over(
        uw.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    numbered.groupBy("user_id", "sess_id")
      .agg(min("ts_us").as("start_us"), max("ts_us").as("end_us"),
        count(lit(1)).as("n_events"))
  }

  /** Two-level sweep-line peak concurrency over (user_id, event_id, ts):
    * 30-min-gap sessionization, then per-day parallel prefix sums with
    * an O(days) cross-day carry. Equal to the global running sum. */
  def peakConcurrency(events: org.apache.spark.sql.DataFrame,
                      gapUs: Long = 1800000000L): org.apache.spark.sql.DataFrame =
    sweepSessions(sessionize(events, gapUs))

  /** The two-level sweep over a (start_us, end_us) session relation —
    * shared by batch q256 and the streaming reconstruction (q271). */
  def sweepSessions(sessions: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val deltas = sessions.select(col("start_us").as("b_us"), lit(1).as("d"))
      .unionByName(sessions.select((col("end_us") + 1).as("b_us"), lit(-1).as("d")))
    val census = deltas.groupBy("b_us").agg(sum("d").as("d"))
      .withColumn("day_idx", expr("b_us div 86400000000"))
    // two-level sweep: parallel per-day prefixes + O(days) carry
    val dayW = Window.partitionBy("day_idx").orderBy("b_us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intra = census.withColumn("prefix", sum("d").over(dayW))
    val dayTotals = census.groupBy("day_idx").agg(sum("d").as("day_delta"))
    val carryW = Window.orderBy("day_idx")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = dayTotals.withColumn("carry",
      coalesce(sum("day_delta").over(carryW), lit(0L)))
    val peaks = intra.groupBy("day_idx").agg(max("prefix").as("max_prefix"))
      .join(carry.select("day_idx", "carry"), "day_idx")
      .select(col("day_idx"), (col("carry") + col("max_prefix")).as("peak_concurrent"))
    val starts = sessions
      .groupBy(expr("start_us div 86400000000").as("day_idx"))
      .agg(count(lit(1)).as("n_sessions"))
    peaks.join(starts, "day_idx")
      .select(date_add(lit("1970-01-01").cast("date"), col("day_idx").cast("int")).as("day"),
        col("n_sessions"), col("peak_concurrent"))
      .orderBy("day")
  }

  /** SESSION KPI REPORT per day: session count, bounce count (single-
    * event sessions), exact integer-ppm bounce rate, and p50/p90
    * session duration as percentile_disc — ACTUAL observed integer-µs
    * durations selected with pure integer rank arithmetic
    * (cum·100 ≥ total·q, the q234 convention). The product-analytics
    * sheet next to q256's load number, off the SAME sessionize pass.
    *
    * Scale (100 TB): one user_id exchange for sessionization; the KPI
    * aggregates are map-side combinable per day; the percentile rank
    * runs over the per-day DISTINCT-DURATION census, never over
    * sessions (q234's degradation argument applies — bucket durations
    * to ms at ingest if the µs census is ever too wide). */
  /** q264's report computed from an already-materialized session
    * relation (start_us, end_us, n_events) — shared with the
    * streaming reconstruction (q291). */
  def sessionKpisFrom(sessions: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val sess = sessions
      .select(expr("start_us div 86400000000").as("day_idx"),
        (col("end_us") - col("start_us")).as("dur_us"), col("n_events"))
    val tot = sess.groupBy("day_idx").agg(
      count(lit(1)).as("n_sessions"),
      sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounce"))
    val census = sess.groupBy("day_idx", "dur_us").agg(count(lit(1)).as("c"))
    val cum = census.withColumn("cum",
      sum("c").over(Window.partitionBy("day_idx").orderBy("dur_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    def pick(q: Int, nm: String) = cum.join(tot, "day_idx")
      .where(col("cum") * 100 >= col("n_sessions") * q)
      .groupBy("day_idx").agg(min("dur_us").as(nm))
    tot.join(pick(50, "p50_dur_us"), "day_idx")
      .join(pick(90, "p90_dur_us"), "day_idx")
      .select(
        date_add(lit("1970-01-01").cast("date"), col("day_idx").cast("int")).as("day"),
        col("n_sessions"), col("n_bounce"),
        expr("(n_bounce * 1000000) div n_sessions").as("bounce_ppm"),
        col("p50_dur_us"), col("p90_dur_us"))
      .orderBy("day")
  }

  val qSessionKpis: GraftQuery = GraftQuery(
    "q264_session_kpis",
    """WITH seq AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |    lag(epoch_us(ts)) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |  FROM events),
      |marks AS (
      |  SELECT user_id, event_id, ts_us,
      |    CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM seq),
      |numbered AS (
      |  SELECT user_id, ts_us,
      |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sess_id
      |  FROM marks),
      |sessions AS (
      |  SELECT user_id, sess_id, min(ts_us) AS start_us, max(ts_us) AS end_us,
      |    CAST(count(*) AS BIGINT) AS n_events
      |  FROM numbered GROUP BY user_id, sess_id),
      |s AS (
      |  SELECT start_us // 86400000000 AS day_idx,
      |    end_us - start_us AS dur_us, n_events
      |  FROM sessions),
      |tot AS (
      |  SELECT day_idx, CAST(COUNT(*) AS BIGINT) AS n_sessions,
      |    CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce
      |  FROM s GROUP BY day_idx),
      |census AS (
      |  SELECT day_idx, dur_us, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM s GROUP BY day_idx, dur_us),
      |cum AS (
      |  SELECT day_idx, dur_us,
      |    SUM(c) OVER (PARTITION BY day_idx ORDER BY dur_us
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM census),
      |p50 AS (
      |  SELECT c.day_idx, MIN(c.dur_us) AS p50_dur_us
      |  FROM cum c JOIN tot t ON c.day_idx = t.day_idx
      |  WHERE c.cum * 100 >= t.n_sessions * 50 GROUP BY c.day_idx),
      |p90 AS (
      |  SELECT c.day_idx, MIN(c.dur_us) AS p90_dur_us
      |  FROM cum c JOIN tot t ON c.day_idx = t.day_idx
      |  WHERE c.cum * 100 >= t.n_sessions * 90 GROUP BY c.day_idx)
      |SELECT DATE '1970-01-01' + CAST(t.day_idx AS INTEGER) AS day,
      |  t.n_sessions, t.n_bounce,
      |  CAST((t.n_bounce * 1000000) // t.n_sessions AS BIGINT) AS bounce_ppm,
      |  p50.p50_dur_us, p90.p90_dur_us
      |FROM tot t
      |JOIN p50 ON p50.day_idx = t.day_idx
      |JOIN p90 ON p90.day_idx = t.day_idx
      |ORDER BY day""".stripMargin) { (s, d) =>
    sessionKpisFrom(sessionize(Tables.events(s, d)))
  }

  /** TIME-WINDOWED FUNNEL: q255 with an attribution window — each
    * step must land within 24 HOURS of the previous step's
    * completion, the form every funnel product actually ships ("did
    * they buy within a day of clicking?"). The window is an exact
    * integer-µs bound on the same earliest-completion chain; note the
    * semantics stay greedy-earliest (the chain anchors on the FIRST
    * view even if a later view would open a better window — the
    * standard, deterministic convention; path-optimal funnels are
    * NP-flavored and non-standard).
    *
    * Scale (100 TB): identical physics to q255 — the window predicate
    * rides the same join, tightening it. */
  val qFunnelWindowed: GraftQuery = GraftQuery(
    "q289_funnel_windowed",
    """WITH v AS (
      |  SELECT user_id, min(ts) AS v_ts FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS c_ts
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts > v.v_ts
      |    AND epoch_us(e.ts) <= epoch_us(v.v_ts) + 86400000000
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS p_ts
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
      |    AND epoch_us(e.ts) <= epoch_us(c.c_ts) + 86400000000
      |  GROUP BY e.user_id),
      |steps AS (
      |  SELECT 1 AS step, 'view' AS step_name, CAST(count(*) AS BIGINT) AS n_users FROM v
      |  UNION ALL
      |  SELECT 2, 'click', CAST(count(*) AS BIGINT) FROM c
      |  UNION ALL
      |  SELECT 3, 'purchase', CAST(count(*) AS BIGINT) FROM p)
      |SELECT step, step_name, n_users,
      |  CAST((n_users * 1000000) // first_value(n_users) OVER (ORDER BY step)
      |    AS BIGINT) AS conv_ppm
      |FROM steps ORDER BY step""".stripMargin) { (s, d) =>
    funnelSteps(Tables.events(s, d), Seq("view", "click", "purchase"),
      maxGapUs = Some(86400000000L))
  }

  /** CO-PRESENCE PAIRS by BINNED INTERVAL SELF-JOIN: which user pairs
    * were online simultaneously, and for how long — the social-proof /
    * fraud-ring signal built from the same q256 sessions. A naive
    * interval self-join is all-pairs; instead each session EXPANDS to
    * its hour buckets and CLIPS to each bucket, the join is an
    * EQUI-join on the bucket, and because the clipped segments
    * partition time, per-bucket overlaps SUM to the exact total
    * co-presence with no dedup step (integer µs; overlap =
    * least(e) − greatest(s) + 1 on closed intervals).
    *
    * Scale (100 TB): the expansion factor is ⌈duration/bucket⌉ —
    * bounded by session policy (a 30-min-gap session rarely spans
    * many hours); the join is hash on the bucket key, pairs-per-
    * bucket bounded by concurrent users (exactly what q256 measures
    * — size the bucket so that number stays sane, or salt hot
    * buckets through the q170 path); the final pair census is
    * map-side combinable. */
  val qCoPresence: GraftQuery = GraftQuery(
    "q302_copresence_pairs",
    """WITH seq AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |    lag(epoch_us(ts)) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |  FROM events),
      |marks AS (
      |  SELECT user_id, event_id, ts_us,
      |    CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM seq),
      |numbered AS (
      |  SELECT user_id, ts_us,
      |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sess_id
      |  FROM marks),
      |sessions AS (
      |  SELECT user_id, sess_id, min(ts_us) AS start_us, max(ts_us) AS end_us
      |  FROM numbered GROUP BY user_id, sess_id),
      |expanded AS (
      |  SELECT user_id, start_us, end_us,
      |    unnest(generate_series(start_us // 3600000000,
      |                           end_us // 3600000000)) AS hb
      |  FROM sessions),
      |segs AS (
      |  SELECT user_id, hb,
      |    greatest(start_us, hb * 3600000000) AS s,
      |    least(end_us, (hb + 1) * 3600000000 - 1) AS e
      |  FROM expanded),
      |pairs AS (
      |  SELECT a.user_id AS user_a, b.user_id AS user_b,
      |    least(a.e, b.e) - greatest(a.s, b.s) + 1 AS o
      |  FROM segs a JOIN segs b
      |    ON a.hb = b.hb AND a.user_id < b.user_id
      |  WHERE least(a.e, b.e) >= greatest(a.s, b.s))
      |SELECT user_a, user_b,
      |  CAST(COUNT(*) AS BIGINT) AS n_segments,
      |  CAST(SUM(o) AS BIGINT) AS copresence_us
      |FROM pairs GROUP BY user_a, user_b
      |ORDER BY user_a, user_b""".stripMargin) { (s, d) =>
    val hUs = 3600000000L
    val sessions = sessionize(Tables.events(s, d))
    val segs = sessions
      .withColumn("hb", explode(sequence(
        expr(s"start_us div $hUs"), expr(s"end_us div $hUs"))))
      .select(col("user_id"),
        col("hb"),
        greatest(col("start_us"), col("hb") * hUs).as("s"),
        least(col("end_us"), (col("hb") + 1) * hUs - 1).as("e"))
    val pairs = segs.as("a")
      .join(segs.as("b").select(col("hb"), col("user_id").as("user_b"),
        col("s").as("s2"), col("e").as("e2")), Seq("hb"))
      .where(col("user_id") < col("user_b") &&
        least(col("e"), col("e2")) >= greatest(col("s"), col("s2")))
      .select(col("user_id").as("user_a"), col("user_b"),
        (least(col("e"), col("e2")) - greatest(col("s"), col("s2")) + 1).as("o"))
    pairs.groupBy("user_a", "user_b")
      .agg(count(lit(1)).as("n_segments"), sum("o").cast("long").as("copresence_us"))
      .orderBy("user_a", "user_b")
  }

  val all: Seq[GraftQuery] =
    Seq(qFunnelSteps, qConcurrency, qSessionKpis, qFunnelWindowed,
      qCoPresence)
}
