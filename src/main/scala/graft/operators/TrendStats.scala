package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact time-series and association statistics: per-group OLS trend,
  * autocorrelation, Spearman rank correlation, and the chi-square
  * independence audit — the monitoring layer a curation pipeline
  * hangs dashboards off (is volume trending, is today like yesterday,
  * do two quality signals agree, is the lang×source mix drifting from
  * independence).
  *
  * All four follow the q74 power-sum discipline: moments accumulate
  * as EXACT integer/DECIMAL(38,0) sums (associative — safe under any
  * partial-aggregation order), and any reported double is ONE closed-
  * form combination of those exact sums, mirrored verbatim in the
  * oracle. Comparisons and gates never touch doubles (integer-ppm by
  * cross-multiplied division).
  */
object TrendStats {

  private def isum(c: Column): Column = sum(c.cast("decimal(38,0)"))

  /** OLS TREND per event type: least-squares slope/intercept/R² of the
    * daily event count against the day index — the parametric
    * companion to q232's Theil–Sen (same daily census input; q232
    * survives outliers, this one is the textbook line every BI tool
    * fits). The slope is reported BOTH as the exact integer rational
    * (n·Sxy − Sx·Sy, n·Sxx − Sx²) and as its double quotient; R²
    * = num² / (den·Syy_c) in double from the same exact parts.
    * Degenerate groups (one day, or constant counts) yield NULL
    * slope/r2 by an explicit integer gate, not by fp underflow.
    *
    * Scale (100 TB): the daily census is ONE map-side-combinable
    * aggregate over the corpus (output O(types × days)); the moment
    * sums are a second tiny aggregate over that census. Nothing else
    * shuffles — a trillion events cost one count-by-(type, day) pass. */
  val qOlsTrend: GraftQuery = GraftQuery(
    "q257_ols_trend",
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(CAST(date_trunc('day', ts) AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
      |    SUM(d) AS sx, SUM(n) AS sy,
      |    SUM(d * d) AS sxx, SUM(d * n) AS sxy, SUM(n * n) AS syy
      |  FROM daily GROUP BY event_type),
      |parts AS (
      |  SELECT event_type, n_days,
      |    CAST(n_days * sxy - sx * sy AS BIGINT) AS slope_num,
      |    CAST(n_days * sxx - sx * sx AS BIGINT) AS slope_den,
      |    CAST(n_days * syy - sy * sy AS BIGINT) AS syy_c,
      |    sx, sy
      |  FROM m)
      |SELECT event_type, n_days, slope_num, slope_den,
      |  CASE WHEN slope_den = 0 THEN NULL
      |       ELSE CAST(slope_num AS DOUBLE) / CAST(slope_den AS DOUBLE) END AS slope,
      |  CASE WHEN slope_den = 0 THEN NULL
      |       ELSE (CAST(sy AS DOUBLE) - CAST(slope_num AS DOUBLE) / CAST(slope_den AS DOUBLE) * CAST(sx AS DOUBLE))
      |            / CAST(n_days AS DOUBLE) END AS intercept,
      |  CASE WHEN slope_den = 0 OR syy_c = 0 THEN NULL
      |       ELSE CAST(slope_num AS DOUBLE) * CAST(slope_num AS DOUBLE)
      |            / (CAST(slope_den AS DOUBLE) * CAST(syy_c AS DOUBLE)) END AS r2
      |FROM parts ORDER BY event_type""".stripMargin) { (s, d) =>
    olsFromDaily(dailyCensus(Tables.events(s, d)))
  }

  /** (event_type, day-index, count) census — the single corpus pass
    * every trend statistic here reduces to. Per-batch censuses are
    * ADDITIVE on n, so a streaming deployment appends partials and
    * re-sums (q265). */
  def dailyCensus(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"),
      datediff(date_trunc("day", col("ts")).cast("date"),
        lit("2024-01-01").cast("date")).cast("long").as("d"))
      .agg(count(lit(1)).as("n"))

  /** q257's closed-form OLS over a (event_type, d, n) daily census. */
  def olsFromDaily(daily: DataFrame): DataFrame = {
    val m = daily.groupBy("event_type").agg(
      count(lit(1)).as("n_days"),
      isum(col("d")).as("sx"), isum(col("n")).as("sy"),
      isum(col("d") * col("d")).as("sxx"),
      isum(col("d") * col("n")).as("sxy"),
      isum(col("n") * col("n")).as("syy"))
    val parts = m.select(col("event_type"), col("n_days"),
      (col("n_days") * col("sxy") - col("sx") * col("sy")).cast("long").as("slope_num"),
      (col("n_days") * col("sxx") - col("sx") * col("sx")).cast("long").as("slope_den"),
      (col("n_days") * col("syy") - col("sy") * col("sy")).cast("long").as("syy_c"),
      col("sx"), col("sy"))
    val slopeD = col("slope_num").cast("double") / col("slope_den").cast("double")
    parts.select(col("event_type"), col("n_days"), col("slope_num"), col("slope_den"),
      when(col("slope_den") === 0, lit(null)).otherwise(slopeD).as("slope"),
      when(col("slope_den") === 0, lit(null))
        .otherwise((col("sy").cast("double") - slopeD * col("sx").cast("double"))
          / col("n_days").cast("double")).as("intercept"),
      when(col("slope_den") === 0 || col("syy_c") === 0, lit(null))
        .otherwise(col("slope_num").cast("double") * col("slope_num").cast("double")
          / (col("slope_den").cast("double") * col("syy_c").cast("double"))).as("r2"))
      .orderBy("event_type")
  }

  /** AUTOCORRELATION of the daily total event count at lags 1..7 —
    * the "is today like yesterday / like last week" drift signal
    * (weekly seasonality shows as an ACF bump at lag 7). Each lag's
    * Pearson r comes from exact integer power sums over the aligned
    * (y_t, y_{t+lag}) pairs; pairs require both days present (the
    * corpus has a full calendar; a gapped one would gap-fill from the
    * q75 spine first).
    *
    * Scale (100 TB): the daily census is one aggregate; the lag
    * expansion is a narrow 7× generate over the O(days) census joined
    * back to itself by equi-key (day+lag) — no range join, no window.
    * Everything past the first aggregate is calendar-bounded. */
  val qAcf: GraftQuery = GraftQuery(
    "q258_acf_daily",
    """WITH daily AS (
      |  SELECT CAST(CAST(date_trunc('day', ts) AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1),
      |expanded AS (
      |  SELECT a.d, a.n AS y0, l.lag, b.n AS y1
      |  FROM daily a
      |  CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS lag) l
      |  JOIN daily b ON b.d = a.d + l.lag),
      |m AS (
      |  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |    SUM(y0) AS sx, SUM(y1) AS sy,
      |    SUM(y0 * y0) AS sxx, SUM(y1 * y1) AS syy, SUM(y0 * y1) AS sxy
      |  FROM expanded GROUP BY lag)
      |SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
      |  CAST(n_pairs * sxy - sx * sy AS BIGINT) AS acf_num,
      |  CASE WHEN n_pairs * sxx - sx * sx = 0 OR n_pairs * syy - sy * sy = 0 THEN NULL
      |       ELSE CAST(n_pairs * sxy - sx * sy AS DOUBLE)
      |            / sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE))
      |            / sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE)) END AS acf
      |FROM m ORDER BY lag""".stripMargin) { (s, d) =>
    val daily = Tables.events(s, d)
      .groupBy(datediff(date_trunc("day", col("ts")).cast("date"),
        lit("2024-01-01").cast("date")).cast("long").as("d"))
      .agg(count(lit(1)).as("n"))
    val expanded = daily.as("a")
      .select(col("d"), col("n").as("y0"),
        explode(sequence(lit(1), lit(7))).as("lag"))
      .join(daily.as("b").select(col("d").as("bd"), col("n").as("y1")),
        col("bd") === col("d") + col("lag"))
    val m = expanded.groupBy("lag").agg(
      count(lit(1)).as("n_pairs"),
      isum(col("y0")).as("sx"), isum(col("y1")).as("sy"),
      isum(col("y0") * col("y0")).as("sxx"),
      isum(col("y1") * col("y1")).as("syy"),
      isum(col("y0") * col("y1")).as("sxy"))
    val num = col("n_pairs") * col("sxy") - col("sx") * col("sy")
    val denx = col("n_pairs") * col("sxx") - col("sx") * col("sx")
    val deny = col("n_pairs") * col("syy") - col("sy") * col("sy")
    m.select(col("lag").cast("long").as("lag"), col("n_pairs"),
      num.cast("long").as("acf_num"),
      when(denx === 0 || deny === 0, lit(null))
        .otherwise(num.cast("double") / sqrt(denx.cast("double"))
          / sqrt(deny.cast("double"))).as("acf"))
      .orderBy("lag")
  }

  /** SPEARMAN RANK CORRELATION per event type between `value` and
    * time-of-day — "do high-value events cluster late in the day?".
    * Ranks are made UNIQUE by the (key, event_id) tie-break (the
    * house deterministic-total-order rule), so the tie-corrected
    * Pearson-of-ranks collapses to the exact difference form
    * ρ = 1 − 6·Σd²/(n(n²−1)) — reported BOTH as exact integer ppm
    * (DECIMAL(38,0) cross-multiplied division, overflow-safe past
    * 10²² pair sums) and as the double quotient. Σd² stays below 2⁵³
    * through sf1, so the double is a single rounding both engines.
    *
    * Scale (100 TB): two rank windows partitioned BY TYPE (each a
    * sort of its own partition — salt by day first at extreme type
    * skew and merge ranks, the q170 path), one zip join on
    * (type, event_id) reusing the partitioning, one map-side-
    * combinable moment aggregate. */
  val qSpearman: GraftQuery = GraftQuery(
    "q259_spearman_value_tod",
    """WITH base AS (
      |  SELECT event_type, event_id, value,
      |    epoch_us(ts) % 86400000000 AS tod_us
      |  FROM events),
      |rx AS (
      |  SELECT event_type, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS r_val
      |  FROM base),
      |ry AS (
      |  SELECT event_type, event_id,
      |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY tod_us, event_id) AS r_tod
      |  FROM base),
      |m AS (
      |  SELECT rx.event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    SUM((rx.r_val - ry.r_tod) * (rx.r_val - ry.r_tod)) AS sd2
      |  FROM rx JOIN ry ON rx.event_type = ry.event_type
      |    AND rx.event_id = ry.event_id
      |  GROUP BY rx.event_type)
      |SELECT event_type, n, CAST(sd2 AS BIGINT) AS sum_d2,
      |  CAST(1000000 - (6000000 * sd2)
      |    // (CAST(n AS HUGEINT) * n * n - n)
      |    AS BIGINT) AS rho_ppm,
      |  1.0 - 6.0 * CAST(sd2 AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0)) AS rho
      |FROM m ORDER BY event_type""".stripMargin) { (s, d) =>
    val base = Tables.events(s, d).select(col("event_type"), col("event_id"),
      col("value"), (unix_micros(col("ts")) % 86400000000L).as("tod_us"))
    val rx = base.withColumn("r_val", row_number().over(
      Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))))
      .select(col("event_type"), col("event_id"), col("r_val"))
    val ry = base.withColumn("r_tod", row_number().over(
      Window.partitionBy("event_type").orderBy(col("tod_us"), col("event_id"))))
      .select(col("event_type"), col("event_id"), col("r_tod"))
    val dd = (col("r_val") - col("r_tod")).cast("long")
    val m = rx.join(ry, Seq("event_type", "event_id"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), isum(dd * dd).as("sd2"))
    m.select(col("event_type"), col("n"), col("sd2").cast("long").as("sum_d2"),
      (lit(1000000L) - expr(
        "(cast(6000000 as decimal(38,0)) * sd2) div " +
          "(cast(n as decimal(38,0)) * n * n - n)"))
        .cast("long").as("rho_ppm"),
      (lit(1.0) - lit(6.0) * col("sd2").cast("double")
        / (col("n").cast("double")
          * (col("n").cast("double") * col("n").cast("double") - lit(1.0))))
        .as("rho"))
      .orderBy("event_type")
  }

  /** CHI-SQUARE INDEPENDENCE audit of the documents lang × source
    * contingency table — is the language mix the same across sources,
    * or does some source skew? Per cell: observed count, margins, and
    * the exact integer-ppm chi-square contribution
    * ((O·N − R·C)²·10⁶) div (R·C·N) — plus the table-wide statistic as
    * the sum of those exact contributions. No doubles anywhere; the
    * whole audit is reproducible bit-for-bit under any partitioning.
    *
    * Scale (100 TB): one count-by-(lang, source) aggregate over the
    * corpus (map-side combinable, output |langs|×|sources|); margins
    * and the statistic are windows over that bounded census. */
  val qChiSquare: GraftQuery = GraftQuery(
    "q260_chisq_lang_source",
    """WITH cells AS (
      |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
      |  FROM documents GROUP BY 1, 2),
      |marg AS (
      |  SELECT lang, source, o,
      |    SUM(o) OVER (PARTITION BY lang) AS r_total,
      |    SUM(o) OVER (PARTITION BY source) AS c_total,
      |    SUM(o) OVER () AS n_total
      |  FROM cells),
      |contrib AS (
      |  SELECT lang, source, o,
      |    CAST(r_total AS BIGINT) AS r_total,
      |    CAST(c_total AS BIGINT) AS c_total,
      |    CAST(n_total AS BIGINT) AS n_total,
      |    CAST(((CAST(o AS HUGEINT) * n_total - CAST(r_total AS HUGEINT) * c_total)
      |          * (CAST(o AS HUGEINT) * n_total - CAST(r_total AS HUGEINT) * c_total) * 1000000)
      |      // (CAST(r_total AS HUGEINT) * c_total * n_total)
      |      AS BIGINT) AS contrib_ppm
      |  FROM marg)
      |SELECT lang, source, o, r_total, c_total,
      |  contrib_ppm,
      |  CAST(SUM(contrib_ppm) OVER () AS BIGINT) AS chi2_ppm_total
      |FROM contrib ORDER BY lang, source""".stripMargin) { (s, d) =>
    val cells = Tables.documents(s, d)
      .groupBy("lang", "source").agg(count(lit(1)).as("o"))
    val marg = cells
      .withColumn("r_total", sum("o").over(Window.partitionBy("lang")))
      .withColumn("c_total", sum("o").over(Window.partitionBy("source")))
      .withColumn("n_total", sum("o").over(Window.partitionBy()))
    val contrib = marg
      .withColumn("dev",
        (col("o").cast("decimal(38,0)") * col("n_total")
          - col("r_total").cast("decimal(38,0)") * col("c_total")))
      .select(col("lang"), col("source"), col("o"),
        col("r_total"), col("c_total"), col("n_total"),
        expr("(dev * dev * 1000000) div " +
          "(cast(r_total as decimal(38,0)) * c_total * n_total)")
          .cast("long").as("contrib_ppm"))
    contrib
      .withColumn("chi2_ppm_total", sum("contrib_ppm").over(Window.partitionBy()))
      .select(col("lang"), col("source"), col("o"), col("r_total"),
        col("c_total"), col("contrib_ppm"), col("chi2_ppm_total"))
      .orderBy("lang", "source")
  }

  /** PSI DRIFT MONITOR (population stability index) of src0's
    * document-length distribution against the rest of the corpus —
    * the score-distribution drift check risk teams run on every model
    * input. Bins are the corpus-wide n_chars DECILES, selected by
    * pure integer rank over the distinct-length census (percentile_
    * disc — actual observed boundaries, q234's rule); each doc's bin
    * is a count of boundaries below its length (a narrow 9× compare,
    * no sort). Per bin: exact integer shares in ppm and the PSI term
    * (p−q)·ln(p/q) as ONE double combination of exact integer counts,
    * mirrored verbatim (NULL for structurally-empty cells rather than
    * an epsilon fudge). Thresholding happens per-bin on the exact ppm
    * shares; the double is for humans.
    *
    * Scale (100 TB): one distinct-length census aggregate, a 9-row
    * boundary broadcast, one (bin × side) count — all map-side
    * combinable; nothing global beyond the ≤10-row report. */
  val qPsiDrift: GraftQuery = GraftQuery(
    "q269_psi_drift",
    """WITH census AS (
      |  SELECT n_chars, CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY 1),
      |cum AS (
      |  SELECT n_chars, SUM(c) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS cw,
      |    SUM(c) OVER () AS tot
      |  FROM census),
      |bins AS (
      |  SELECT n_chars,
      |    least(9, ((cw - c) * 10) // tot) AS bin
      |  FROM (SELECT n_chars, c, cw, tot FROM cum
      |        JOIN census USING (n_chars))),
      |cells AS (
      |  SELECT b.bin,
      |    CAST(SUM(CASE WHEN d.source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN d.source = 'src0' THEN 0 ELSE 1 END) AS BIGINT) AS n_b
      |  FROM documents d JOIN bins b ON b.n_chars = d.n_chars
      |  GROUP BY b.bin),
      |tots AS (
      |  SELECT bin, n_a, n_b,
      |    SUM(n_a) OVER () AS tot_a, SUM(n_b) OVER () AS tot_b
      |  FROM cells)
      |SELECT CAST(bin AS BIGINT) AS bin, n_a, n_b,
      |  CAST((n_a * 1000000) // tot_a AS BIGINT) AS p_ppm,
      |  CAST((n_b * 1000000) // tot_b AS BIGINT) AS q_ppm,
      |  CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
      |       ELSE (CAST(n_a AS DOUBLE) / CAST(tot_a AS DOUBLE)
      |             - CAST(n_b AS DOUBLE) / CAST(tot_b AS DOUBLE))
      |            * ln((CAST(n_a AS DOUBLE) * CAST(tot_b AS DOUBLE))
      |                 / (CAST(n_b AS DOUBLE) * CAST(tot_a AS DOUBLE))) END AS psi_term
      |FROM tots ORDER BY bin""".stripMargin) { (s, d) =>
    psiFromCensus(lengthCensus(Tables.documents(s, d)))
  }

  /** (n_chars, is-src0, count) census — the additive relation a
    * streaming PSI deployment appends per micro-batch (q278). */
  def lengthCensus(docs: DataFrame): DataFrame =
    docs.groupBy(col("n_chars"), (col("source") === "src0").as("is_a"))
      .agg(count(lit(1)).as("c"))

  /** q269's bin assignment + PSI report over a merged length census. */
  def psiFromCensus(lenCensus: DataFrame): DataFrame = {
    val census = lenCensus.groupBy("n_chars")
      .agg(sum("c").as("c"),
        sum(when(col("is_a"), col("c")).otherwise(0L)).as("ca"))
    val cum = census
      .withColumn("cw", sum("c").over(Window.orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum("c").over(Window.partitionBy()))
    // bin = #{k in 1..9 : boundary_k < x} = min(9, 10*pw div tot) where
    // pw is the cumulative count STRICTLY below x — no boundary join
    val cells = cum
      .withColumn("bin", least(lit(9L), expr("((cw - c) * 10) div tot")))
      .groupBy("bin").agg(
        sum(col("ca")).as("n_a"),
        sum(col("c") - col("ca")).as("n_b"))
    val tots = cells
      .withColumn("tot_a", sum("n_a").over(Window.partitionBy()))
      .withColumn("tot_b", sum("n_b").over(Window.partitionBy()))
    val pd = col("n_a").cast("double") / col("tot_a").cast("double")
    val qd = col("n_b").cast("double") / col("tot_b").cast("double")
    tots.select(col("bin").cast("long").as("bin"), col("n_a"), col("n_b"),
      expr("(n_a * 1000000) div tot_a").as("p_ppm"),
      expr("(n_b * 1000000) div tot_b").as("q_ppm"),
      when(col("n_a") === 0 || col("n_b") === 0, lit(null))
        .otherwise((pd - qd) * log(
          (col("n_a").cast("double") * col("tot_b").cast("double"))
            / (col("n_b").cast("double") * col("tot_a").cast("double"))))
        .as("psi_term"))
      .orderBy("bin")
  }

  /** WEIGHTED MEDIAN of document length per language, weighted by
    * token mass — "the length where half the TOKENS sit", which a
    * packing planner wants instead of the doc-count median (long docs
    * carry disproportionate mass). Selection is percentile_disc-style
    * pure integer rank over the per-lang (length, Σweight) census:
    * the smallest length whose cumulative weight doubles past the
    * total (cum·2 ≥ W). No doubles anywhere.
    *
    * Scale (100 TB): one (lang, n_chars) weighted census aggregate
    * (map-side combinable), then per-lang windows over the census —
    * bounded by distinct lengths, never doc count. */
  val qWeightedMedian: GraftQuery = GraftQuery(
    "q270_weighted_median",
    """WITH toks AS (
      |  SELECT lang, n_chars,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents),
      |census AS (
      |  SELECT lang, n_chars, CAST(SUM(n_tok) AS BIGINT) AS w,
      |    CAST(COUNT(*) AS BIGINT) AS n_docs
      |  FROM toks GROUP BY lang, n_chars),
      |cum AS (
      |  SELECT lang, n_chars, w, n_docs,
      |    SUM(w) OVER (PARTITION BY lang ORDER BY n_chars
      |      ROWS UNBOUNDED PRECEDING) AS cw,
      |    SUM(w) OVER (PARTITION BY lang) AS tot_w
      |  FROM census)
      |SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
      |  CAST(MAX(tot_w) AS BIGINT) AS total_tokens,
      |  MIN(CASE WHEN cw * 2 >= tot_w THEN n_chars END) AS wmedian_chars
      |FROM cum GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
    val toks = Tables.documents(s, d).select(col("lang"), col("n_chars"),
      graft.functions.TextFunctions.tokenCount(col("text")).cast("long").as("n_tok"))
    val census = toks.groupBy("lang", "n_chars")
      .agg(sum("n_tok").as("w"), count(lit(1)).as("n_docs"))
    val cum = census
      .withColumn("cw", sum("w").over(Window.partitionBy("lang").orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot_w", sum("w").over(Window.partitionBy("lang")))
    cum.groupBy("lang").agg(
      sum("n_docs").as("n_docs"),
      max("tot_w").as("total_tokens"),
      min(when(col("cw") * 2 >= col("tot_w"), col("n_chars"))).as("wmedian_chars"))
      .orderBy("lang")
  }

  /** TREND-RESIDUAL OUTLIER DAYS: days whose deviation from q257's
    * fitted line exceeds 3σ — the volume-anomaly alarm on top of the
    * trend monitor (q204's MAD gate asks "weird vs the median"; this
    * asks "weird vs the TREND", so a growing series doesn't flag its
    * own growth). Entirely exact: with slope p/q the scaled residual
    * R_i = n·q·y_i − n·p·x_i − (q·Sy − p·Sx) is an INTEGER, and the
    * 3σ gate r_i² > 9·SSE/n becomes the integer cross-multiplication
    * n·R_i² > 9·ΣR² — no fp anywhere near the decision. The reported
    * residual is R_i's one double quotient by n·q.
    *
    * Scale (100 TB): the q257 physics — one daily-census aggregate,
    * one O(types) moment census broadcast back onto the O(types×days)
    * census; the gate is a per-row integer expression. */
  val qTrendOutliers: GraftQuery = GraftQuery(
    "q280_trend_outliers",
    """WITH daily AS (
      |  SELECT event_type,
      |    CAST(CAST(date_trunc('day', ts) AS DATE) - DATE '2024-01-01' AS BIGINT) AS d,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nd,
      |    SUM(d) AS sx, SUM(n) AS sy,
      |    SUM(d * d) AS sxx, SUM(d * n) AS sxy
      |  FROM daily GROUP BY event_type),
      |fit AS (
      |  SELECT event_type, nd,
      |    nd * sxy - sx * sy AS p,
      |    nd * sxx - sx * sx AS q,
      |    sx, sy
      |  FROM m),
      |resid AS (
      |  SELECT dl.event_type, dl.d, dl.n,
      |    f.nd * f.q * dl.n - f.nd * f.p * dl.d - (f.q * f.sy - f.p * f.sx) AS r,
      |    f.nd, f.q
      |  FROM daily dl JOIN fit f ON f.event_type = dl.event_type),
      |sse AS (
      |  SELECT event_type, SUM(CAST(r AS HUGEINT) * r) AS srr
      |  FROM resid GROUP BY event_type)
      |SELECT r.event_type, r.d, r.n,
      |  CAST(r.r AS DOUBLE) / (CAST(r.nd AS DOUBLE) * CAST(r.q AS DOUBLE)) AS residual
      |FROM resid r JOIN sse s ON s.event_type = r.event_type
      |WHERE r.nd * (CAST(r.r AS HUGEINT) * r.r) > 9 * s.srr
      |ORDER BY r.event_type, r.d""".stripMargin) { (s, d) =>
    val daily = dailyCensus(Tables.events(s, d))
    val m = daily.groupBy("event_type").agg(
      count(lit(1)).as("nd"),
      isum(col("d")).as("sx"), isum(col("n")).as("sy"),
      isum(col("d") * col("d")).as("sxx"),
      isum(col("d") * col("n")).as("sxy"))
    val fit = m.select(col("event_type"), col("nd"),
      (col("nd") * col("sxy") - col("sx") * col("sy")).as("p"),
      (col("nd") * col("sxx") - col("sx") * col("sx")).as("q"),
      col("sx"), col("sy"))
    // The gate squares r (DECIMAL 38,0): srr = Σr² then 9·srr must
    // stay inside 38 digits or Spark's non-ANSI overflow NULLs srr
    // and silently disables the 3σ gate (DuckDB's HUGEINT would
    // error). Assert |r| ≤ 5e16 — under it, r² ≤ 2.5e33, nd·r² and
    // Σr² ≤ 9.2e36 for a decade of days (nd ≤ 3650), and 9·srr ≤
    // 8.3e37 < 10³⁸ — so overflow fails LOUDLY, matching the oracle's
    // failure mode. Beyond the bound, quantize r down a fixed grid on
    // both engines before squaring.
    val rGuard = when(assert_true(
      abs(col("r0")) <= lit(BigDecimal("50000000000000000")).cast("decimal(38,0)"),
      lit("q280: |r| exceeds the exact 3-sigma squaring budget — " +
        "quantize residuals before squaring")).isNull, col("r0"))
    val resid = daily.join(broadcast(fit), "event_type")
      .select(col("event_type"), col("d"), col("n"),
        (col("nd") * col("q") * col("n") - col("nd") * col("p") * col("d")
          - (col("q") * col("sy") - col("p") * col("sx"))).as("r0"),
        col("nd"), col("q"))
      .withColumn("r", rGuard).drop("r0")
    val sse = resid.groupBy("event_type").agg(sum(col("r") * col("r")).as("srr"))
    resid.join(broadcast(sse), "event_type")
      .where(col("nd") * col("r") * col("r") > lit(9) * col("srr"))
      .select(col("event_type"), col("d"), col("n"),
        (col("r").cast("double")
          / (col("nd").cast("double") * col("q").cast("double"))).as("residual"))
      .orderBy("event_type", "d")
  }

  val all: Seq[GraftQuery] =
    Seq(qOlsTrend, qAcf, qSpearman, qChiSquare, qPsiDrift, qWeightedMedian,
      qTrendOutliers)
}
