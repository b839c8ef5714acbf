package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral analytics over the events stream: the cohort retention
  * matrix and multi-touch attribution — the two reports every product
  * analytics stack derives from raw event logs (the reference's
  * events model stops at per-event enrichment; SURVEY §2 north-star).
  *
  * Both follow the house exactness discipline: all timestamps are
  * integer microseconds (`unix_micros` / `epoch_us` — QueryDef ground
  * rules), all rates are integer ppm by cross-multiplied division,
  * and every window carries a unique (ts, event_id) tie-break so
  * results are partition- and engine-independent.
  */
object Behavior {

  /** COHORT RETENTION MATRIX: users grouped by the ISO week of their
    * FIRST event (acquisition cohort), crossed with the weeks they
    * were active — the (cohort_week × week_offset) grid with exact
    * integer-ppm retention. q90's single-cohort retention widened to
    * the full triangular matrix a growth dashboard plots.
    *
    * Week arithmetic is engine-aligned by construction: both engines'
    * `date_trunc('week', ts)` land on ISO Monday 00:00, so the day
    * difference between two week starts is an exact multiple of 7 and
    * `datediff div 7` is integer-exact.
    *
    * Scale (100 TB): the per-user first-event min and the DISTINCT
    * (user, week) activity relation are map-side-combinable with ONE
    * exchange on user_id each (the cohort⋈activity join reuses it);
    * the matrix itself is O(weeks²) — constant in event volume. */
  val qCohortMatrix: GraftQuery = GraftQuery(
    "q235_cohort_retention",
    """WITH f AS (
      |  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      |  FROM events GROUP BY user_id),
      |a AS (
      |  SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week
      |  FROM events),
      |sizes AS (
      |  SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_cohort
      |  FROM f GROUP BY cohort_week),
      |m AS (
      |  SELECT f.cohort_week,
      |    CAST(date_diff('day', f.cohort_week, a.act_week) // 7 AS BIGINT)
      |      AS week_offset,
      |    CAST(count(*) AS BIGINT) AS n_active
      |  FROM f JOIN a ON f.user_id = a.user_id
      |  GROUP BY 1, 2)
      |SELECT m.cohort_week, m.week_offset, m.n_active, s.n_cohort,
      |  CAST((m.n_active * 1000000) // s.n_cohort AS BIGINT) AS retention_ppm
      |FROM m JOIN sizes s ON m.cohort_week = s.cohort_week
      |ORDER BY m.cohort_week, week_offset""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    // both engines land week starts on ISO Monday; DuckDB renders the
    // truncation as DATE, so the Spark side casts to match
    val f = ev.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))
    val a = ev.select(col("user_id"),
      date_trunc("week", col("ts")).cast("date").as("act_week")).distinct()
    val sizes = f.groupBy("cohort_week").agg(count(lit(1)).as("n_cohort"))
    val m = f.join(a, "user_id")
      .groupBy(col("cohort_week"),
        (datediff(col("act_week"), col("cohort_week")).cast("long") / 7)
          .cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    m.join(sizes, "cohort_week")
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("n_cohort"),
        expr("(n_active * 1000000) div n_cohort").as("retention_ppm"))
      .orderBy("cohort_week", "week_offset")
  }

  /** U-SHAPED (position-based) MULTI-TOUCH ATTRIBUTION: each purchase
    * distributes exactly 1,000,000 ppm of credit over the user's
    * view/click touches in the 7 days before it — 40% to the first
    * touch, 40% to the last, 20% split over the middles. q175 answers
    * first-touch only; this is the industry-standard position model,
    * made EXACT: middle credit is `200000 div n_mid` with the
    * remainder assigned to the EARLIEST middle touch, so per-purchase
    * credits sum to exactly 1,000,000 (1 touch → all; 2 touches →
    * 500,000 each — the 20% pot split between the two poles). No
    * doubles anywhere; reproducible under any partitioning.
    *
    * Scale (100 TB): the purchase⋈touch pairing is ONE exchange on
    * user_id with the 7-day band bounding pairs per purchase by the
    * user's own weekly activity (the q221 per-user-stream argument —
    * a hot user salts through the q170 diagnostics path); the
    * per-purchase rank window re-partitions on purchase_id, whose
    * cardinality is the purchase count, not the event count; the
    * final census is map-side combinable into |channels| rows. */
  val qAttribution: GraftQuery = GraftQuery(
    "q236_position_attribution",
    """WITH t AS (
      |  SELECT p.event_id AS purchase_id, tch.event_type AS channel,
      |    row_number() OVER (PARTITION BY p.event_id
      |                       ORDER BY epoch_us(tch.ts), tch.event_id) AS rn,
      |    count(*) OVER (PARTITION BY p.event_id) AS cnt
      |  FROM events p JOIN events tch ON p.user_id = tch.user_id
      |    AND epoch_us(tch.ts) < epoch_us(p.ts)
      |    AND epoch_us(tch.ts) >= epoch_us(p.ts) - 604800000000
      |  WHERE p.event_type = 'purchase'
      |    AND tch.event_type IN ('view', 'click')),
      |c AS (
      |  SELECT purchase_id, channel,
      |    CASE WHEN cnt = 1 THEN 1000000
      |         WHEN cnt = 2 THEN 500000
      |         WHEN rn = 1 OR rn = cnt THEN 400000
      |         ELSE 200000 // (cnt - 2)
      |              + CASE WHEN rn = 2 THEN 200000 % (cnt - 2) ELSE 0 END
      |    END AS credit_ppm
      |  FROM t)
      |SELECT channel,
      |  CAST(count(*) AS BIGINT) AS n_touches,
      |  CAST(count(DISTINCT purchase_id) AS BIGINT) AS n_purchases,
      |  CAST(sum(credit_ppm) AS BIGINT) AS credit_ppm
      |FROM c GROUP BY channel ORDER BY channel""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).select(col("user_id"), col("event_type"),
      col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts_us").as("p_us"))
    val tch = ev.where(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_type").as("channel"),
        col("event_id").as("touch_id"), col("ts_us").as("t_us"))
    val wRank = Window.partitionBy("purchase_id").orderBy("t_us", "touch_id")
    val wAll = Window.partitionBy("purchase_id")
    val t = p.join(tch, Seq("user_id"))
      .where(col("t_us") < col("p_us") &&
        col("t_us") >= col("p_us") - lit(604800000000L))
      .select(col("purchase_id"), col("channel"),
        row_number().over(wRank).as("rn"), count(lit(1)).over(wAll).as("cnt"))
    val c = t.select(col("purchase_id"), col("channel"),
      when(col("cnt") === 1, 1000000L)
        .when(col("cnt") === 2, 500000L)
        .when(col("rn") === 1 || col("rn") === col("cnt"), 400000L)
        .otherwise(expr("200000 div (cnt - 2) " +
          "+ CASE WHEN rn = 2 THEN 200000 % (cnt - 2) ELSE 0 END"))
        .as("credit_ppm"))
    c.groupBy("channel")
      .agg(count(lit(1)).as("n_touches"),
        countDistinct(col("purchase_id")).as("n_purchases"),
        sum(col("credit_ppm")).as("credit_ppm"))
      .orderBy("channel")
  }

  /** KAPLAN–MEIER SURVIVAL BY TENURE: a user's lifetime is the day
    * span from first to last event (no censoring — the window closes
    * after the corpus; a live deployment censors open users at the
    * snapshot date). Per observed lifetime t: users at risk (tenure
    * ≥ t), churned at t, exact integer-ppm hazard, and the survival
    * estimate S(t) = Π(1 − dₛ/nₛ). The product is computed as
    * exp(Σ ln((nₛ−dₛ)/nₛ)) with the running sum over the TENURE
    * CENSUS in ascending ROWS order — both engines accumulate the
    * same doubles left-to-right in the same order, and each ln
    * argument is one exact-integer division, so the estimate is
    * engine-identical. All DECISION columns are pure integers; the
    * final tenure row (survival exactly 0) is omitted by the
    * at-risk > churned gate rather than rendering ±inf logs.
    *
    * Scale (100 TB): one per-user (min, max) aggregate — one user_id
    * exchange — then windows over the O(max-tenure) census only. */
  val qKaplanMeier: GraftQuery = GraftQuery(
    "q283_kaplan_meier",
    """WITH life AS (
      |  SELECT user_id,
      |    CAST(CAST(date_trunc('day', max(ts)) AS DATE)
      |         - CAST(date_trunc('day', min(ts)) AS DATE) AS BIGINT) AS tenure
      |  FROM events GROUP BY user_id),
      |deaths AS (
      |  SELECT tenure, CAST(COUNT(*) AS BIGINT) AS churned
      |  FROM life GROUP BY tenure),
      |c AS (
      |  SELECT tenure, churned,
      |    CAST(SUM(churned) OVER (ORDER BY tenure ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |    CAST(SUM(churned) OVER () AS BIGINT) AS total
      |  FROM deaths),
      |km AS (
      |  SELECT tenure, churned,
      |    total - (cum - churned) AS n_at_risk,
      |    exp(SUM(ln(CAST(total - cum AS DOUBLE)
      |               / CAST(total - (cum - churned) AS DOUBLE)))
      |        OVER (ORDER BY tenure ROWS UNBOUNDED PRECEDING)) AS survival
      |  FROM c WHERE total - cum > 0)
      |SELECT tenure, n_at_risk, churned,
      |  CAST((churned * 1000000) // n_at_risk AS BIGINT) AS hazard_ppm,
      |  survival
      |FROM km ORDER BY tenure""".stripMargin) { (s, d) =>
    val life = Tables.events(s, d).groupBy("user_id")
      .agg(datediff(date_trunc("day", max(col("ts"))).cast("date"),
        date_trunc("day", min(col("ts"))).cast("date")).cast("long").as("tenure"))
    val deaths = life.groupBy("tenure").agg(count(lit(1)).as("churned"))
    val c = deaths
      .withColumn("cum", sum("churned").over(Window.orderBy("tenure")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum("churned").over(Window.partitionBy()))
    val km = c.where(col("total") - col("cum") > 0)
      .withColumn("n_at_risk", col("total") - (col("cum") - col("churned")))
      .withColumn("survival",
        exp(sum(log((col("total") - col("cum")).cast("double")
          / (col("total") - (col("cum") - col("churned"))).cast("double")))
          .over(Window.orderBy("tenure")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    km.select(col("tenure"), col("n_at_risk"), col("churned"),
      expr("(churned * 1000000) div n_at_risk").as("hazard_ppm"),
      col("survival"))
      .orderBy("tenure")
  }

  /** A/B EXPERIMENT READOUT: deterministic 50/50 assignment by keyed
    * md5 parity (the q61 hash-sampling physics — assignment is a pure
    * function of user_id, reproducible anywhere), conversion = any
    * purchase, and the one-row scorecard every experiment dashboard
    * shows: per-arm exact ppm conversion, relative lift in exact ppm
    * by cross-multiplication, and the pooled two-proportion z-score
    * as ONE mirrored double combination of the four exact counts.
    *
    * Scale (100 TB): assignment and conversion are scan-fused per-row
    * expressions + one user_id-keyed aggregate; the scorecard is a
    * 1-row fold. No randomness anywhere — re-running the readout on
    * re-shuffled data is bit-identical. */
  val qAbExperiment: GraftQuery = GraftQuery(
    "q285_ab_experiment",
    """WITH assign AS (
      |  SELECT user_id,
      |    CAST(CAST('0x' || substring(md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) % 2 AS INTEGER) AS variant,
      |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS converted
      |  FROM events GROUP BY user_id),
      |arms AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(SUM(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
      |    CAST(SUM(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv_b
      |  FROM assign)
      |SELECT n_a, n_b, conv_a, conv_b,
      |  CAST((conv_a * 1000000) // n_a AS BIGINT) AS conv_a_ppm,
      |  CAST((conv_b * 1000000) // n_b AS BIGINT) AS conv_b_ppm,
      |  CASE WHEN conv_a = 0 THEN NULL
      |       ELSE CAST((conv_b * n_a * 1000000) // (conv_a * n_b) - 1000000 AS BIGINT)
      |  END AS lift_ppm,
      |  CASE WHEN conv_a + conv_b = 0 OR conv_a + conv_b = n_a + n_b THEN NULL
      |       ELSE (CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)
      |             - CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE))
      |            / sqrt(CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE)
      |                   * (1.0 - CAST(conv_a + conv_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
      |                   * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
      |  END AS z_score
      |FROM arms""".stripMargin) { (s, d) =>
    val assign = Tables.events(s, d).groupBy("user_id")
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("converted"))
      .withColumn("variant",
        (conv(substring(md5(concat(lit("ab:"), col("user_id").cast("string"))), 1, 8),
          16, 10).cast("long") % 2).cast("int"))
    val arms = assign.agg(
      sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n_b"),
      sum(when(col("variant") === 0, col("converted")).otherwise(0L)).as("conv_a"),
      sum(when(col("variant") === 1, col("converted")).otherwise(0L)).as("conv_b"))
    val pPool = (col("conv_a") + col("conv_b")).cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    arms.select(col("n_a"), col("n_b"), col("conv_a"), col("conv_b"),
      expr("(conv_a * 1000000) div n_a").as("conv_a_ppm"),
      expr("(conv_b * 1000000) div n_b").as("conv_b_ppm"),
      when(col("conv_a") === 0, lit(null))
        .otherwise(expr("(conv_b * n_a * 1000000) div (conv_a * n_b) - 1000000"))
        .cast("long").as("lift_ppm"),
      when(col("conv_a") + col("conv_b") === 0 ||
          col("conv_a") + col("conv_b") === col("n_a") + col("n_b"), lit(null))
        .otherwise((col("conv_b").cast("double") / col("n_b").cast("double")
          - col("conv_a").cast("double") / col("n_a").cast("double"))
          / sqrt(pPool * (lit(1.0) - pPool)
            * (lit(1.0) / col("n_a").cast("double")
              + lit(1.0) / col("n_b").cast("double"))))
        .as("z_score"))
  }

  /** RFM SEGMENTATION: customers scored by Recency (days since last
    * order, against the corpus's own max date — injectable-clock
    * discipline), Frequency (order count) and Monetary (exact cents),
    * each cut into quintiles by the q269 census-arithmetic bin rule
    * (bin = min(4, 5·pw div tot) — percentile_disc boundaries, NO
    * boundary join, NO per-row rank window), then censused into the
    * ≤125 (r, f, m) segments a CRM actually targets.
    *
    * Scale (100 TB): one custkey aggregate over orders (the only
    * fact exchange); each metric's quintile map is a census window
    * over DISTINCT metric values joined back by equi-key; the segment
    * report is map-side combinable. */
  /** q290's quintile/segment math over a per-customer (last order
    * date, order count, cents) relation — shared with the streaming
    * reconstruction (q299), whose per-batch partials fold by
    * (max, sum, sum): a monoid, so arrival slicing cannot change the
    * result. The anchor (corpus max date) and the quintile
    * boundaries are data-dependent and therefore recompute at serve,
    * never frozen from early batches (the q278 PSI lesson). */
  def rfmSegmentsFrom(rfm: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val anch = rfm.withColumn("r",
      datediff(max("last_d").over(Window.partitionBy()), col("last_d")).cast("long"))
    def quintile(valueCol: String): org.apache.spark.sql.DataFrame = {
      val census = anch.groupBy(col(valueCol).as("v")).agg(count(lit(1)).as("c"))
      census
        .withColumn("cw", sum("c").over(Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tot", sum("c").over(Window.partitionBy()))
        .select(col("v"), least(lit(4L), expr("((cw - c) * 5) div tot")).as("bin"))
    }
    anch
      .join(quintile("r").withColumnRenamed("bin", "r_bin"), col("v") === col("r"))
      .drop("v")
      .join(quintile("f").withColumnRenamed("bin", "f_bin"), col("v") === col("f"))
      .drop("v")
      .join(quintile("m").withColumnRenamed("bin", "m_bin"), col("v") === col("m"))
      .drop("v")
      .groupBy(col("r_bin").cast("int").as("r_bin"),
        col("f_bin").cast("int").as("f_bin"),
        col("m_bin").cast("int").as("m_bin"))
      .agg(count(lit(1)).as("n_customers"), sum("m").as("total_cents"))
      .orderBy("r_bin", "f_bin", "m_bin")
  }

  /** Per-customer RFM metrics over an orders slice — the additive
    * relation q299 appends per micro-batch. */
  def rfmMetrics(orders: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    orders.groupBy("o_custkey").agg(
      max(col("o_orderdate").cast("date")).as("last_d"),
      count(lit(1)).as("f"),
      sum((col("o_totalprice").cast("decimal(14,2)") * 100).cast("long"))
        .cast("long").as("m"))

  val qRfmSegments: GraftQuery = GraftQuery(
    "q290_rfm_segments",
    """WITH rfm AS (
      |  SELECT o_custkey,
      |    CAST(max(CAST(o_orderdate AS DATE)) AS DATE) AS last_d,
      |    CAST(COUNT(*) AS BIGINT) AS f,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS m
      |  FROM orders GROUP BY o_custkey),
      |anch AS (
      |  SELECT *, CAST(MAX(last_d) OVER () - last_d AS BIGINT) AS r FROM rfm),
      |rc AS (SELECT r AS v, CAST(COUNT(*) AS BIGINT) AS c FROM anch GROUP BY r),
      |rb AS (
      |  SELECT v, least(4, ((SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c) * 5)
      |    // (SUM(c) OVER ()) ) AS bin FROM rc),
      |fc AS (SELECT f AS v, CAST(COUNT(*) AS BIGINT) AS c FROM anch GROUP BY f),
      |fb AS (
      |  SELECT v, least(4, ((SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c) * 5)
      |    // (SUM(c) OVER ()) ) AS bin FROM fc),
      |mc AS (SELECT m AS v, CAST(COUNT(*) AS BIGINT) AS c FROM anch GROUP BY m),
      |mb AS (
      |  SELECT v, least(4, ((SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c) * 5)
      |    // (SUM(c) OVER ()) ) AS bin FROM mc)
      |SELECT CAST(rb.bin AS INTEGER) AS r_bin, CAST(fb.bin AS INTEGER) AS f_bin,
      |  CAST(mb.bin AS INTEGER) AS m_bin,
      |  CAST(COUNT(*) AS BIGINT) AS n_customers,
      |  CAST(SUM(a.m) AS BIGINT) AS total_cents
      |FROM anch a
      |JOIN rb ON rb.v = a.r
      |JOIN fb ON fb.v = a.f
      |JOIN mb ON mb.v = a.m
      |GROUP BY 1, 2, 3
      |ORDER BY r_bin, f_bin, m_bin""".stripMargin) { (s, d) =>
    rfmSegmentsFrom(rfmMetrics(Tables.orders(s, d)))
  }

  def all: Seq[GraftQuery] =
    Seq(qCohortMatrix, qAttribution, qKaplanMeier, qAbExperiment,
      qRfmSegments)
}
