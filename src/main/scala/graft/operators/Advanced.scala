package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Second tranche of relational coverage: decorrelated subqueries,
  * deep multi-join analytics, explicit grouping sets, null-safe joins,
  * multiset set-ops, deterministic hash sampling, and histogramming.
  *
  * Scale notes (100 TB):
  *  - q56's "correlated" subquery is expressed as the decorrelated
  *    aggregate-then-join form — exactly what Catalyst rewrites
  *    correlated scalar subqueries into; stating it directly keeps the
  *    plan one shuffle per side plus one join on l_partkey.
  *  - q57's six-table join keeps the single fact-fact shuffle
  *    (lineitem ⋈ orders) and broadcasts every dimension.
  *  - q61's sampling is a pushdown-able FILTER on a hash of the key —
  *    deterministic, partition-independent, and reproducible across
  *    engines, unlike TABLESAMPLE which samples physical blocks.
  */
object Advanced {

  private def dec(c: Column, p: Int, s: Int): Column = c.cast(s"decimal($p,$s)")
  private val one = lit(1).cast("decimal(3,2)")

  /** TPC-H Q17 shape: revenue from lineitems below 20% of their part's
    * average quantity. l_quantity is an integral-valued double, so the
    * per-part AVG is exact (exact sum / exact count — one correctly
    * rounded division) and the `<` comparison is engine-stable. */
  val qSmallQtyRevenue: GraftQuery = GraftQuery(
    "q56_small_qty_revenue",
    """WITH t AS (
      |  SELECT l_partkey AS pk, 0.2 * AVG(l_quantity) AS threshold
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly,
      |  COUNT(*) AS n_lines
      |FROM lineitem l JOIN t ON l.l_partkey = t.pk
      |WHERE l.l_quantity < t.threshold""".stripMargin) { (s, d) =>
    val l = Tables.lineitem(s, d)
    val t = l.groupBy(col("l_partkey").as("pk"))
      .agg((lit(0.2) * avg(col("l_quantity"))).as("threshold"))
    l.join(t, l("l_partkey") === t("pk"))
      .where(col("l_quantity") < col("threshold"))
      .agg(
        (sum(dec(col("l_extendedprice"), 12, 2)).cast("double") / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q8 shape: one supplier nation's share of European customer
    * revenue per order year. Six-table join; share is a single division
    * of two exact decimal sums cast to double. */
  val qMarketShare: GraftQuery = GraftQuery(
    "q57_market_share",
    """WITH rev AS (
      |  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
      |    CAST(l.l_extendedprice AS DECIMAL(12,2)) *
      |      (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))) AS vol,
      |    sn.n_name AS supp_nation
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      |  JOIN region r ON cn.n_regionkey = r.r_regionkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      |  WHERE r.r_name = 'EUROPE')
      |SELECT o_year,
      |  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol END) AS DOUBLE) /
      |    CAST(SUM(vol) AS DOUBLE) AS mkt_share,
      |  CAST(SUM(vol) AS DOUBLE) AS total_revenue
      |FROM rev
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin) { (s, d) =>
    val l = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val cn = Tables.nation(s, d)
    val r = Tables.region(s, d).where(col("r_name") === "EUROPE")
    val sup = Tables.supplier(s, d)
    val sn = Tables.nation(s, d)
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val vol = dec(col("l_extendedprice"), 12, 2) * (one - dec(col("l_discount"), 4, 2))
    // nation/region are bounded dimensions (25/5 rows at any SF) →
    // forced broadcast. customer/supplier SCALE with SF, so they get no
    // hint: AQE picks broadcast while they fit the threshold and falls
    // back to a shuffled join beyond it — forcing them would OOM the
    // driver at the 100 TB target.
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(cn), c("c_nationkey") === cn("n_nationkey"))
      .join(broadcast(r), cn("n_regionkey") === r("r_regionkey"))
      .join(sup, l("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(sn), sup("s_nationkey") === col("sn_key"))
      .select(year(col("o_orderdate")).as("o_year"), vol.as("vol"), col("supp_nation"))
      .groupBy("o_year")
      .agg(
        (sum(when(col("supp_nation") === "NATION_3", col("vol"))).cast("double") /
          sum(col("vol")).cast("double")).as("mkt_share"),
        sum(col("vol")).cast("double").as("total_revenue"))
      .orderBy("o_year")
  }

  /** Explicit GROUPING SETS with GROUPING() disambiguation — entered
    * through the SQL surface (the DataFrame DSL exposes only
    * rollup/cube; grouping sets are a SQL-level construct). */
  val qGroupingSets: GraftQuery = GraftQuery(
    "q58_grouping_sets",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
      |  CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,1))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus), ())
      |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).createOrReplaceTempView("adv_lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_status,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,1))) AS DOUBLE) AS sum_qty
        |FROM adv_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus), ())
        |ORDER BY g_flag, g_status, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
  }

  /** Null-safe equality join (<=> / IS NOT DISTINCT FROM): per-key
    * event counts where the key is a nullable JSON extract (k=7
    * nullified to guarantee a NULL group at every scale). */
  val qNullSafeJoin: GraftQuery = GraftQuery(
    "q59_nullsafe_join",
    """WITH keyed AS (
      |  SELECT NULLIF(CAST(json_extract_string(props, '$.k') AS INTEGER), 7) AS k_val,
      |    event_type
      |  FROM events),
      |a AS (SELECT k_val, COUNT(*) AS n_click FROM keyed
      |      WHERE event_type = 'click' GROUP BY k_val),
      |b AS (SELECT k_val, COUNT(*) AS n_all FROM keyed GROUP BY k_val)
      |SELECT b.k_val, COALESCE(a.n_click, 0) AS n_click, b.n_all
      |FROM b LEFT JOIN a ON a.k_val IS NOT DISTINCT FROM b.k_val
      |ORDER BY b.k_val NULLS FIRST""".stripMargin) { (s, d) =>
    val keyed = Tables.events(s, d).select(
      nullif(get_json_object(col("props"), "$.k").cast("int"), lit(7)).as("k_val"),
      col("event_type"))
    val a = keyed.where(col("event_type") === "click")
      .groupBy(col("k_val").as("a_k")).agg(count(lit(1)).as("n_click"))
    val b = keyed.groupBy("k_val").agg(count(lit(1)).as("n_all"))
    b.join(a, col("k_val") <=> col("a_k"), "left")
      .select(col("k_val"), coalesce(col("n_click"), lit(0L)).as("n_click"), col("n_all"))
      .orderBy(col("k_val").asc_nulls_first)
  }

  /** Multiset set operations (EXCEPT ALL / INTERSECT ALL) — duplicate
    * multiplicities matter, unlike q14's distinct set-ops. */
  val qMultisetOps: GraftQuery = GraftQuery(
    "q60_multiset_ops",
    """WITH ea AS (
      |  SELECT o_custkey AS custkey FROM orders
      |  EXCEPT ALL
      |  SELECT o_custkey FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
      |ia AS (
      |  SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 100000
      |  INTERSECT ALL
      |  SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00')
      |SELECT 'except_all' AS op, custkey, COUNT(*) AS n FROM ea GROUP BY custkey
      |UNION ALL
      |SELECT 'intersect_all' AS op, custkey, COUNT(*) AS n FROM ia GROUP BY custkey
      |ORDER BY op, custkey""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
    val all = o.select(col("o_custkey").as("custkey"))
    val early = o.where(col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
      .select(col("o_custkey").as("custkey"))
    val big = o.where(col("o_totalprice") > 100000)
      .select(col("o_custkey").as("custkey"))
    val recent = o.where(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")))
      .select(col("o_custkey").as("custkey"))
    val ea = all.exceptAll(early).groupBy("custkey").agg(count(lit(1)).as("n"))
      .select(lit("except_all").as("op"), col("custkey"), col("n"))
    val ia = big.intersectAll(recent).groupBy("custkey").agg(count(lit(1)).as("n"))
      .select(lit("intersect_all").as("op"), col("custkey"), col("n"))
    ea.unionByName(ia).orderBy("op", "custkey")
  }

  /** Deterministic hash-based 1/8 sampling: filter on the first hex
    * char of md5(key) — reproducible across engines and partitionings,
    * and pushed to the scan as an ordinary predicate. */
  val qHashSample: GraftQuery = GraftQuery(
    "q61_hash_sample",
    """WITH s AS (
      |  SELECT * FROM lineitem
      |  WHERE substring(md5(CAST(l_orderkey AS VARCHAR) || '-' ||
      |                       CAST(l_linenumber AS VARCHAR)), 1, 1) IN ('0', '1'))
      |SELECT l_returnflag, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,1))) AS DOUBLE) AS sum_qty
      |FROM s GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .where(substring(md5(concat(col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string"))), 1, 1).isin("0", "1"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(dec(col("l_quantity"), 12, 1)).cast("double").as("sum_qty"))
      .orderBy("l_returnflag")
  }

  /** Fixed-width histogram via floor division (the portable form of
    * width_bucket): bucket edges are exact in both engines. */
  val qHistogram: GraftQuery = GraftQuery(
    "q62_histogram",
    """SELECT CAST(floor(o_totalprice / 25000) AS BIGINT) AS bucket,
      |  COUNT(*) AS n,
      |  MIN(o_totalprice) AS min_price,
      |  MAX(o_totalprice) AS max_price
      |FROM orders
      |GROUP BY bucket
      |ORDER BY bucket""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(floor(col("o_totalprice") / 25000).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy("bucket")
  }

  /** Full outer join + arg-pick aggregates (min_by/max_by vs DuckDB
    * arg_min/arg_max): per-segment order stats where a segment can
    * have customers but no qualifying orders (and the outer join must
    * surface both sides). Arg-pick orderings are made unique — first
    * by the unique orderkey, then by an exact decimal pack
    * price·10^8 + key (collision-free while orderkey < 10^6; at
    * larger scales widen the multiplier — decimal has 38 digits). */
  val qFullOuterArgPick: GraftQuery = GraftQuery(
    "q73_full_outer_argpick",
    """WITH seg AS (
      |  SELECT c_mktsegment, COUNT(*) AS n_cust FROM customer GROUP BY c_mktsegment),
      |big AS (
      |  SELECT c.c_mktsegment AS seg2, COUNT(*) AS n_big,
      |    arg_min(o.o_totalprice, o.o_orderkey) AS first_key_price,
      |    arg_max(o.o_orderkey,
      |            CAST(o.o_totalprice AS DECIMAL(12,2)) * 100000000 + o.o_orderkey) AS priciest_key
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE o.o_totalprice > 400000
      |  GROUP BY c.c_mktsegment)
      |SELECT COALESCE(c_mktsegment, seg2) AS segment, n_cust, n_big,
      |  first_key_price, priciest_key
      |FROM seg FULL OUTER JOIN big ON seg.c_mktsegment = big.seg2
      |ORDER BY segment""".stripMargin) { (s, d) =>
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val seg = c.groupBy("c_mktsegment").agg(count(lit(1)).as("n_cust"))
    val big = o.where(col("o_totalprice") > 400000)
      .join(c.select(col("c_custkey"), col("c_mktsegment").as("seg2")),
        o("o_custkey") === col("c_custkey"))
      .groupBy("seg2")
      .agg(count(lit(1)).as("n_big"),
        min_by(col("o_totalprice"), col("o_orderkey")).as("first_key_price"),
        max_by(col("o_orderkey"),
          dec(col("o_totalprice"), 12, 2) * 100000000L + col("o_orderkey"))
          .as("priciest_key"))
    seg.join(big, col("c_mktsegment") === col("seg2"), "full_outer")
      .select(coalesce(col("c_mktsegment"), col("seg2")).as("segment"),
        col("n_cust"), col("n_big"), col("first_key_price"), col("priciest_key"))
      .orderBy("segment")
  }

  /** Statistical aggregates in the engine-stable form: variance,
    * stddev, covariance, and correlation derived from EXACT decimal
    * power sums (sum, sum of squares, sum of cross products), with the
    * closed-form combination done once in double. The builtin
    * stddev/corr use streaming (Welford-style) updates whose result
    * depends on partial-aggregation order — fine statistically, wrong
    * for cross-engine hash comparison AND for run-to-run stability at
    * scale; the power-sum form is associative and exact. */
  val qStatsExact: GraftQuery = GraftQuery(
    "q74_stats_exact",
    // Power sums stay in SCALE-0 INTEGER units (quantity decades,
    // price cents) until the final double conversion: DuckDB's
    // scaled-decimal→double cast double-rounds (unscaled→double, then
    // /10^scale) and diverges from the correctly-rounded value by an
    // ulp once the unscaled sum exceeds 2^53 — integer→double is a
    // single rounding in both engines. Unit factors come back as
    // explicit double divisions, mirrored verbatim on both sides
    // (they cancel entirely in the correlation).
    """SELECT l_returnflag, COUNT(*) AS n,
      |  (CAST(SUM(q10 * q10) AS DOUBLE) - CAST(SUM(q10) AS DOUBLE) * CAST(SUM(q10) AS DOUBLE) / COUNT(*))
      |    / (COUNT(*) - 1) / 100.0 AS var_qty,
      |  sqrt((CAST(SUM(q10 * q10) AS DOUBLE) - CAST(SUM(q10) AS DOUBLE) * CAST(SUM(q10) AS DOUBLE) / COUNT(*))
      |    / (COUNT(*) - 1) / 100.0) AS stddev_qty,
      |  (CAST(SUM(q10 * pc) AS DOUBLE) - CAST(SUM(q10) AS DOUBLE) * CAST(SUM(pc) AS DOUBLE) / COUNT(*))
      |    / (COUNT(*) - 1) / 1000.0 AS covar_qty_price,
      |  (CAST(SUM(q10 * pc) AS DOUBLE) - CAST(SUM(q10) AS DOUBLE) * CAST(SUM(pc) AS DOUBLE) / COUNT(*)) /
      |    (sqrt(CAST(SUM(q10 * q10) AS DOUBLE) - CAST(SUM(q10) AS DOUBLE) * CAST(SUM(q10) AS DOUBLE) / COUNT(*)) *
      |     sqrt(CAST(SUM(pc * pc) AS DOUBLE) - CAST(SUM(pc) AS DOUBLE) * CAST(SUM(pc) AS DOUBLE) / COUNT(*)))
      |    AS corr_qty_price
      |FROM (SELECT l_returnflag,
      |        CAST(CAST(l_quantity AS DECIMAL(12,1)) * 10 AS BIGINT) AS q10,
      |        CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS pc
      |      FROM lineitem)
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    val q10in = (col("l_quantity").cast("decimal(12,1)") * 10).cast("long")
    val pcIn = (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long")
    val q10 = col("q10")
    val pc = col("pc")
    // per-row integer products fit a long; the SUM goes through
    // decimal(38,0) so it cannot overflow at any scale
    def isum(c: Column) = sum(c.cast("decimal(38,0)")).cast("double")
    val n = count(lit(1))
    val sq = isum(q10)
    val sp = isum(pc)
    val sqq = isum(q10 * q10)
    val spp = isum(pc * pc)
    val sqp = isum(q10 * pc)
    val varQ = (sqq - sq * sq / n) / (n - 1) / 100.0
    val covQP = (sqp - sq * sp / n) / (n - 1) / 1000.0
    val corrQP = (sqp - sq * sp / n) /
      (sqrt(sqq - sq * sq / n) * sqrt(spp - sp * sp / n))
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), q10in.as("q10"), pcIn.as("pc"))
      .groupBy("l_returnflag")
      .agg(n.as("n"), varQ.as("var_qty"), sqrt(varQ).as("stddev_qty"),
        covQP.as("covar_qty_price"), corrQP.as("corr_qty_price"))
      .orderBy("l_returnflag")
  }

  /** Time-series gap fill: daily event counts with missing
    * (type, day) cells zero-filled from a generated calendar — the
    * resample-to-regular-grid operation. The calendar × type frame is
    * bounded (days × types), built from two single-row/tiny aggregates. */
  val qGapFill: GraftQuery = GraftQuery(
    "q75_gap_fill",
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS n
      |  FROM events GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)),
      |span AS (
      |  SELECT CAST(min(date_trunc('day', ts)) AS DATE) AS d0,
      |         CAST(max(date_trunc('day', ts)) AS DATE) AS d1
      |  FROM events),
      |cal AS (
      |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM span),
      |types AS (SELECT DISTINCT event_type FROM events)
      |SELECT t.event_type, c.day, COALESCE(d.n, 0) AS n
      |FROM cal c CROSS JOIN types t
      |LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = c.day
      |ORDER BY t.event_type, c.day""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val day = date_trunc("day", col("ts")).cast("date")
    val daily = ev.groupBy(col("event_type"), day.as("day")).agg(count(lit(1)).as("n"))
    val span = ev.agg(min(day).as("d0"), max(day).as("d1"))
    val cal = span.select(explode(sequence(col("d0"), col("d1"))).as("day"))
    val types = ev.select("event_type").distinct()
    cal.crossJoin(broadcast(types))
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("event_type", "day")
  }

  /** Forward-fill imputation: error events carry no valid value; fill
    * from the user's most recent non-error reading (last_value IGNORE
    * NULLS over a deterministic (ts, event_id) order). */
  val qForwardFill: GraftQuery = GraftQuery(
    "q76_forward_fill",
    """SELECT event_id, user_id,
      |  CASE WHEN event_type = 'error' THEN NULL ELSE value END AS raw_value,
      |  last_value(CASE WHEN event_type = 'error' THEN NULL ELSE value END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val rawValue = when(col("event_type") === "error", lit(null)).otherwise(col("value"))
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, d).select(
      col("event_id"), col("user_id"),
      rawValue.as("raw_value"),
      last(rawValue, ignoreNulls = true).over(w).as("filled_value"))
      .orderBy("event_id")
  }

  /** First-touch conversion funnel: first view, first click at-or-after
    * that view, first purchase at-or-after that click; users bucketed by
    * the deepest stage reached. Three ordered min-aggregates + left
    * joins — every step is an exact min over µs timestamps, so staging
    * is engine-deterministic. */
  val qFunnel: GraftQuery = GraftQuery(
    "q78_funnel",
    """WITH v AS (
      |  SELECT user_id, min(ts) AS t_view FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, min(e.ts) AS t_click
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.ts >= v.t_view
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, min(e.ts) AS t_buy
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
      |  GROUP BY e.user_id),
      |u AS (SELECT DISTINCT user_id FROM events),
      |staged AS (
      |  SELECT u.user_id,
      |    CASE WHEN p.user_id IS NOT NULL THEN 3
      |         WHEN c.user_id IS NOT NULL THEN 2
      |         WHEN v.user_id IS NOT NULL THEN 1
      |         ELSE 0 END AS stage
      |  FROM u
      |  LEFT JOIN v ON u.user_id = v.user_id
      |  LEFT JOIN c ON u.user_id = c.user_id
      |  LEFT JOIN p ON u.user_id = p.user_id)
      |SELECT stage, COUNT(*) AS n_users
      |FROM staged GROUP BY stage
      |ORDER BY stage""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val v = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t_view"))
    val c = ev.where(col("event_type") === "click")
      .join(v, "user_id").where(col("ts") >= col("t_view"))
      .groupBy("user_id").agg(min(col("ts")).as("t_click"))
    val p = ev.where(col("event_type") === "purchase")
      .join(c, "user_id").where(col("ts") >= col("t_click"))
      .groupBy("user_id").agg(min(col("ts")).as("t_buy"))
    val u = ev.select("user_id").distinct()
    u.join(v.select(col("user_id"), lit(1).as("has_v")), Seq("user_id"), "left")
      .join(c.select(col("user_id"), lit(1).as("has_c")), Seq("user_id"), "left")
      .join(p.select(col("user_id"), lit(1).as("has_p")), Seq("user_id"), "left")
      .select(
        when(col("has_p").isNotNull, 3)
          .when(col("has_c").isNotNull, 2)
          .when(col("has_v").isNotNull, 1)
          .otherwise(0).as("stage"))
      .groupBy("stage").agg(count(lit(1)).as("n_users"))
      .orderBy("stage")
  }

  /** TPC-H Q21 shape (multi-EXISTS decorrelation): suppliers whose
    * line shipped late (> 90 days after the order date) in a
    * multi-supplier order where NO other supplier was late — a semi
    * join and an anti join against the same relation with non-equi
    * conditions, the classic blame-assignment query. */
  val qBlameSuppliers: GraftQuery = GraftQuery(
    "q86_blame_suppliers",
    """WITH late AS (
      |  SELECT l.l_orderkey, l.l_suppkey
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
      |SELECT s.s_name, COUNT(*) AS numwait
      |FROM late l1
      |JOIN supplier s ON l1.l_suppkey = s.s_suppkey
      |WHERE EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM late l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey)
      |GROUP BY s.s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 10""".stripMargin) { (s, d) =>
    // the EXISTS side needs only lineitem (a late row's order exists by
    // construction) — joining orders there would add a pure-waste
    // fact-fact shuffle; only the lateness filter needs o_orderdate
    val late = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAY"))
      .select("l_orderkey", "l_suppkey")
    val l2 = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
    val l3 = late.select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
    late
      .join(l2, col("l_orderkey") === col("k2") && col("l_suppkey") =!= col("s2"), "left_semi")
      .join(l3, col("l_orderkey") === col("k3") && col("l_suppkey") =!= col("s3"), "left_anti")
      .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  /** 7-day sliding distinct users per day. Distinct-over-window frames
    * aren't supported by window functions, and a BETWEEN range join
    * scans days × activity; instead each (user, active-day) pair is
    * EXPLODED into the ≤7 observation days it contributes to — an
    * equi-aggregation whose cost is 7× the distinct activity relation
    * regardless of corpus size. */
  val qSlidingMau: GraftQuery = GraftQuery(
    "q89_sliding_mau",
    """WITH acts AS (
      |  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
      |  FROM events),
      |span AS (SELECT max(day) AS d1 FROM acts),
      |contrib AS (
      |  SELECT CAST(unnest(generate_series(day, day + 6, INTERVAL 1 DAY)) AS DATE) AS obs_day,
      |         user_id
      |  FROM acts)
      |SELECT obs_day AS day, COUNT(DISTINCT user_id) AS mau7
      |FROM contrib, span WHERE obs_day <= span.d1
      |GROUP BY obs_day
      |ORDER BY day""".stripMargin) { (s, d) =>
    val acts = Tables.events(s, d)
      .select(date_trunc("day", col("ts")).cast("date").as("day"), col("user_id"))
      .distinct()
    val span = acts.agg(max(col("day")).as("d1"))
    acts
      .select(explode(sequence(col("day"), date_add(col("day"), 6))).as("obs_day"),
        col("user_id"))
      .crossJoin(broadcast(span))
      .where(col("obs_day") <= col("d1"))
      .groupBy(col("obs_day").as("day"))
      .agg(countDistinct(col("user_id")).as("mau7"))
      .orderBy("day")
  }

  /** Weekly retention cohorts: users grouped by first-seen week, with
    * week+1 and week+2 return rates (both engines truncate weeks to
    * ISO Monday). */
  val qRetention: GraftQuery = GraftQuery(
    "q90_retention",
    """WITH firstw AS (
      |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      |  FROM events GROUP BY user_id),
      |activity AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS act_week
      |  FROM events)
      |SELECT f.cohort_week,
      |  COUNT(DISTINCT f.user_id) AS cohort_size,
      |  COUNT(DISTINCT CASE WHEN a.act_week = f.cohort_week + 7 THEN f.user_id END) AS retained_w1,
      |  COUNT(DISTINCT CASE WHEN a.act_week = f.cohort_week + 14 THEN f.user_id END) AS retained_w2
      |FROM firstw f JOIN activity a ON f.user_id = a.user_id
      |GROUP BY f.cohort_week
      |ORDER BY f.cohort_week""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    val activity = ev
      .select(col("user_id").as("a_user"),
        date_trunc("week", col("ts")).cast("date").as("act_week"))
      .distinct()
    // date_trunc is monotonic, so trunc(min(ts)) = min(trunc(ts)): the
    // cohort week derives from the (much smaller) distinct activity
    // relation instead of a second full-corpus aggregate
    val firstw = activity.groupBy(col("a_user").as("user_id"))
      .agg(min(col("act_week")).as("cohort_week"))
    firstw.join(activity, col("user_id") === col("a_user"))
      .groupBy("cohort_week")
      .agg(
        countDistinct(col("user_id")).as("cohort_size"),
        countDistinct(when(col("act_week") === date_add(col("cohort_week"), 7),
          col("user_id"))).as("retained_w1"),
        countDistinct(when(col("act_week") === date_add(col("cohort_week"), 14),
          col("user_id"))).as("retained_w2"))
      .orderBy("cohort_week")
  }

  /** Event-time RANGE window frame: per-user rolling 1-hour value sum
    * — the frame is bounded by a TIME OFFSET, not a row count, so a
    * user's burst of events all fall in each other's window while
    * sparse events see only themselves. Ordered on the epoch second
    * (integer — both engines' RANGE arithmetic is exact); the frame
    * sum is an exact decimal. One shuffle on user_id; frames evaluate
    * within the sorted partition. */
  val qRollingTimeWindow: GraftQuery = GraftQuery(
    "q96_rolling_time_window",
    """SELECT user_id, event_id,
      |  CAST(SUM(CAST(value AS DECIMAL(14,2))) OVER (
      |    PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_1h,
      |  CAST(COUNT(*) OVER (
      |    PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      |    RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_1h
      |FROM events
      |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").cast("long"))
      .rangeBetween(-3600L, Window.currentRow)
    Tables.events(s, d).select(
      col("user_id"), col("event_id"),
      sum(col("value").cast("decimal(14,2)")).over(w).cast("double").as("sum_1h"),
      count(lit(1)).over(w).as("n_1h"))
      .orderBy("user_id", "event_id")
  }

  /** Gaps-and-islands: consecutive-active-day streaks per user (island
    * key = day minus the per-user day rank — constant within a run of
    * consecutive days). Emits per-user streak stats; the whole query
    * is two window passes plus one aggregate, no self-joins. */
  val qActivityStreaks: GraftQuery = GraftQuery(
    "q97_activity_streaks",
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      |  FROM events),
      |islands AS (
      |  SELECT user_id, day,
      |    day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER)
      |      AS island
      |  FROM days),
      |streaks AS (
      |  SELECT user_id, island, COUNT(*) AS streak_len,
      |    MIN(day) AS streak_start
      |  FROM islands GROUP BY user_id, island)
      |SELECT user_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_streaks,
      |  CAST(MAX(streak_len) AS BIGINT) AS longest_streak,
      |  MIN(streak_start) AS first_day
      |FROM streaks
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val days = Tables.events(s, d)
      .select(col("user_id"), date_trunc("day", col("ts")).cast("date").as("day"))
      .distinct()
    val islands = days.withColumn("island",
      date_sub(col("day"),
        row_number().over(Window.partitionBy("user_id").orderBy("day"))))
    islands.groupBy("user_id", "island")
      .agg(count(lit(1)).as("streak_len"), min(col("day")).as("streak_start"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_streaks"),
        max(col("streak_len")).as("longest_streak"),
        min(col("streak_start")).as("first_day"))
      .orderBy("user_id")
  }

  /** FIRST-TOUCH ATTRIBUTION: every purchase credits the event type
    * that OPENED its session (q20's sessionization — 3600 s gap,
    * (ts, event_id) order) — the standard marketing-attribution query
    * over the standard sessionize.
    *
    * Plan shape (the part that matters at 100 TB): THREE window
    * passes, ONE exchange. The lag/running-sum windows partition by
    * user_id; the first_value window partitions by (user_id,
    * session_id) — a superset of the existing hash(user_id)
    * clustering, so Catalyst satisfies its distribution WITHOUT a
    * second shuffle (only a within-partition sort). No self-join of
    * the sessioned relation: the session-opener ride-alongs on every
    * row via first_value, and purchases filter AFTER — attribution
    * is a scan-side derivation, not a join. Purchase values aggregate
    * as DECIMAL (exact under any grouping order), cast to double once
    * at the end (q41's discipline). */
  val qFirstTouch: GraftQuery = GraftQuery(
    "q175_first_touch_attribution",
    """WITH ordered AS (
      |  SELECT user_id, event_id, event_type, value, ts,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
      |    lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER
      |      (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN prev_sec IS NULL OR ts_sec - prev_sec > 3600
      |                 THEN 1 ELSE 0 END AS new_session
      |  FROM ordered),
      |sessioned AS (
      |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged),
      |touched AS (
      |  SELECT *, first_value(event_type) OVER (
      |    PARTITION BY user_id, session_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_touch
      |  FROM sessioned)
      |SELECT first_touch,
      |  CAST(COUNT(*) AS BIGINT) AS n_purchases,
      |  CAST(COUNT(DISTINCT (user_id, session_id)) AS BIGINT) AS n_sessions,
      |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS attributed_value
      |FROM touched
      |WHERE event_type = 'purchase'
      |GROUP BY first_touch
      |ORDER BY first_touch""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val wUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val wRun = wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessioned = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"),
        col("ts"), unix_timestamp(col("ts")).as("ts_sec"))
      .withColumn("prev_sec", lag(col("ts_sec"), 1).over(wUser))
      .withColumn("new_session",
        when(col("prev_sec").isNull || col("ts_sec") - col("prev_sec") > 3600, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(wRun))
    val wSession = Window.partitionBy("user_id", "session_id")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessioned
      .withColumn("first_touch", first(col("event_type")).over(wSession))
      .where(col("event_type") === "purchase")
      .groupBy("first_touch")
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id"), col("session_id")).as("n_sessions"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("attributed_value"))
      .orderBy("first_touch")
  }

  /** TPC-H Q22 SHAPE (lapsed rich customers): customers whose balance
    * exceeds the global average POSITIVE balance and who placed no
    * order in the final 90 days of the order calendar, censused by
    * nation. Both scalars are made exact: the balance gate is integer
    * cross-multiplication (bal_cents·n_pos > sum_cents — never an fp
    * average near a comparison), and the recency horizon is
    * max(orderdate) − 90 in DATE arithmetic. Each global aggregate
    * rides in on a 1-row broadcast (the literal join key folds to
    * TRUE, so the planner renders a broadcast nested-loop with a
    * 1-row build side — the q251 allowlisted shape: bounded build,
    * probe-side partitioning preserved).
    *
    * Scale (100 TB): two narrow scalar aggregates broadcast to every
    * partition; the recent-orders side is date-filtered BEFORE the
    * anti join on o_custkey (the only exchange); |nations|-row census. */
  val qIdleRich: GraftQuery = GraftQuery(
    "q273_idle_rich_customers",
    """WITH stats AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pos,
      |    CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS sum_c
      |  FROM customer WHERE c_acctbal > 0),
      |horizon AS (
      |  SELECT CAST(max(o_orderdate) AS DATE) - 90 AS cutoff FROM orders),
      |rich AS (
      |  SELECT c.c_custkey, c.c_nationkey,
      |    CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS bal_c
      |  FROM customer c CROSS JOIN stats s
      |  WHERE CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) * s.n_pos > s.sum_c),
      |lapsed AS (
      |  SELECT r.* FROM rich r
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM orders o CROSS JOIN horizon h
      |    WHERE o.o_custkey = r.c_custkey
      |      AND CAST(o.o_orderdate AS DATE) >= h.cutoff))
      |SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_custs,
      |  CAST(SUM(bal_c) AS BIGINT) AS total_bal_cents,
      |  CAST(SUM(bal_c) AS DOUBLE) / 100.0 AS total_bal
      |FROM lapsed i JOIN nation n ON n.n_nationkey = i.c_nationkey
      |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin) { (s, d) =>
    val balC = (col("c_acctbal").cast("decimal(12,2)") * 100).cast("long")
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"), balC.as("bal_c"))
    val stats = cust.where(col("bal_c") > 0)
      .agg(count(lit(1)).as("n_pos"), sum("bal_c").cast("long").as("sum_c"))
      .withColumn("one", lit(1))
    val horizon = Tables.orders(s, d)
      .agg(date_sub(max(col("o_orderdate")).cast("date"), 90).as("cutoff"))
      .withColumn("one", lit(1))
    val rich = cust.withColumn("one", lit(1))
      .join(broadcast(stats), "one")
      .where(col("bal_c") * col("n_pos") > col("sum_c"))
      .select("c_custkey", "c_nationkey", "bal_c")
    val recent = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("od"))
      .withColumn("one", lit(1))
      .join(broadcast(horizon), "one")
      .where(col("od") >= col("cutoff"))
      .select("o_custkey")
    val lapsed = rich.join(recent,
      col("c_custkey") === col("o_custkey"), "left_anti")
    lapsed.join(broadcast(Tables.nation(s, d)),
        col("n_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_custs"),
        sum("bal_c").cast("long").as("total_bal_cents"))
      .select(col("n_name"), col("n_custs"), col("total_bal_cents"),
        (col("total_bal_cents").cast("double") / 100.0).as("total_bal"))
      .orderBy("n_name")
  }

  /** TPC-H Q11 SHAPE (important stock): parts whose lineitem value
    * (price × quantity, exact cents×decades units) exceeds 1/1000 of
    * the corpus total — the share gate done by exact
    * cross-multiplication (val·1000 > total), share reported in exact
    * ppm. The total rides a window over the per-part census (bounded
    * by the part dimension, not the fact).
    *
    * Scale (100 TB): one part-keyed aggregate over lineitem (the only
    * fact exchange); the census-wide total is a two-level rollup away
    * if the part dimension ever outgrows one task (q183's measured
    * pattern); the gate and ordering are integer-exact. */
  val qImportantStock: GraftQuery = GraftQuery(
    "q274_important_stock",
    """WITH pv AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
      |      * CAST(CAST(l_quantity AS DECIMAL(12,1)) * 10 AS BIGINT)) AS BIGINT) AS val_u
      |  FROM lineitem GROUP BY l_partkey),
      |tot AS (
      |  SELECT l_partkey, val_u, SUM(val_u) OVER () AS total_u FROM pv)
      |SELECT l_partkey, val_u,
      |  CAST((val_u * 1000000) // total_u AS BIGINT) AS share_ppm,
      |  CAST(val_u AS DOUBLE) / 1000.0 AS value
      |FROM tot WHERE val_u * 1000 > total_u
      |ORDER BY val_u DESC, l_partkey""".stripMargin) { (s, d) =>
    val priceC = (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long")
    val qtyD = (col("l_quantity").cast("decimal(12,1)") * 10).cast("long")
    val pv = Tables.lineitem(s, d)
      .select(col("l_partkey"), (priceC * qtyD).as("vu"))
      .groupBy("l_partkey").agg(sum("vu").cast("long").as("val_u"))
    pv.withColumn("total_u", sum("val_u").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .where(col("val_u") * 1000 > col("total_u"))
      .select(col("l_partkey"), col("val_u"),
        expr("(val_u * 1000000) div total_u").as("share_ppm"),
        (col("val_u").cast("double") / 1000.0).as("value"))
      .orderBy(col("val_u").desc, col("l_partkey"))
  }

  /** LORENZ CURVE + GINI of customer revenue concentration — "what
    * share of revenue do the bottom k/10 of customers hold", the
    * whale-risk number next to q254's distribution-impurity Gini
    * (that one scores categorical next-action spread; this is the
    * classic inequality coefficient over amounts). Revenue is exact
    * cents; customers rank by (revenue, custkey) so ties are
    * deterministic; the ten Lorenz points are the exact cumulative
    * shares at ranks ⌊k·n/10⌋ in integer ppm, and Gini is the exact
    * rational (2Σi·xᵢ − (n+1)Σx, n·Σx) plus its double quotient.
    *
    * Scale (100 TB): revenue is one custkey aggregate over orders
    * (the only fact exchange); the rank windows run over the CUSTOMER
    * DIMENSION (deliberate — dimension-sized; a fact-sized variant
    * goes through the q183 two-level rank, measured 2×+). */
  val qLorenzGini: GraftQuery = GraftQuery(
    "q284_lorenz_gini",
    """WITH rev AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY o_custkey),
      |ranked0 AS (
      |  SELECT o_custkey, cents,
      |    ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS r,
      |    CAST(COUNT(*) OVER () AS BIGINT) AS n,
      |    CAST(SUM(cents) OVER (ORDER BY cents, o_custkey
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |    SUM(cents) OVER () AS tot
      |  FROM rev),
      |ranked AS (
      |  SELECT *, SUM(CAST(r AS HUGEINT) * cents) OVER () AS sixi
      |  FROM ranked0),
      |pts AS (
      |  SELECT k.k, r.r, r.cum, CAST(r.tot AS BIGINT) AS tot, r.n,
      |    CAST(2 * r.sixi - (r.n + 1) * r.tot AS BIGINT) AS gini_num,
      |    CAST(r.n * r.tot AS BIGINT) AS gini_den
      |  FROM ranked r
      |  JOIN (SELECT unnest(generate_series(1, 10)) AS k) k
      |    ON r.r = (k.k * r.n) // 10)
      |SELECT CAST(k AS INTEGER) AS decile, r AS rank, cum, tot,
      |  CAST((cum * 1000000) // tot AS BIGINT) AS lorenz_ppm,
      |  gini_num, gini_den,
      |  CAST(gini_num AS DOUBLE) / CAST(gini_den AS DOUBLE) AS gini
      |FROM pts ORDER BY decile""".stripMargin) { (s, d) =>
    val rev = Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(sum((col("o_totalprice").cast("decimal(14,2)") * 100).cast("long"))
        .cast("long").as("cents"))
    val ord = org.apache.spark.sql.expressions.Window
      .orderBy(col("cents"), col("o_custkey"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    val ranked = rev
      .withColumn("r", row_number().over(ord))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("cum", sum("cents").over(
        ord.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .withColumn("tot", sum("cents").over(wAll))
      .withColumn("sixi",
        sum(col("r").cast("decimal(38,0)") * col("cents")).over(wAll))
    // n·tot is ~2.3e18 at SF1 — 4× from Long.Max — so the products run
    // in DECIMAL(38,0) (the oracle's HUGEINT) and the BIGINT output
    // contract is guarded: Spark fails loudly (assert_true) exactly
    // where DuckDB's overflow cast would error, never wraps silently.
    val nD = col("n").cast("decimal(38,0)")
    val totD = col("tot").cast("decimal(38,0)")
    def longExact(c: org.apache.spark.sql.Column, what: String) =
      when(assert_true(abs(c) <= lit(Long.MaxValue).cast("decimal(38,0)"),
        lit(s"q284: $what exceeds BIGINT — widen the output contract")).isNull,
        c.cast("long"))
    val pts = ranked
      .withColumn("k", explode(sequence(lit(1), lit(10))))
      .where(col("r") === expr("(k * n) div 10"))
      .select(col("k").cast("int").as("decile"), col("r").as("rank"),
        col("cum"), col("tot"),
        expr("(cum * 1000000) div tot").as("lorenz_ppm"),
        longExact(lit(2) * col("sixi") - (nD + 1) * totD, "gini_num").as("gini_num"),
        longExact(nD * totD, "gini_den").as("gini_den"))
    pts.select(col("decile"), col("rank"), col("cum"), col("tot"),
      col("lorenz_ppm"), col("gini_num"), col("gini_den"),
      (col("gini_num").cast("double") / col("gini_den").cast("double")).as("gini"))
      .orderBy("decile")
  }

  /** SUPPLIER LEAD TIME: order-to-ship days per supplier — count,
    * exact total days, the mean as one double division, and the p50
    * as percentile_disc by integer rank over each supplier's
    * DISTINCT-LEAD census. The ops metric behind supplier scorecards;
    * every decision integer-exact (DATE subtraction is integral).
    *
    * Scale (100 TB): the lineitem⋈orders join is the one fact-fact
    * shuffle (the q57 physics); per-supplier censuses bound the
    * percentile windows by distinct lead values, never line count. */
  val qSupplierLeadTime: GraftQuery = GraftQuery(
    "q294_supplier_leadtime",
    """WITH leads AS (
      |  SELECT l.l_suppkey,
      |    CAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE) AS BIGINT) AS lead_d
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |census AS (
      |  SELECT l_suppkey, lead_d, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM leads GROUP BY 1, 2),
      |cum AS (
      |  SELECT l_suppkey, lead_d, c,
      |    SUM(c) OVER (PARTITION BY l_suppkey ORDER BY lead_d
      |      ROWS UNBOUNDED PRECEDING) AS cw,
      |    SUM(c) OVER (PARTITION BY l_suppkey) AS tot,
      |    SUM(lead_d * c) OVER (PARTITION BY l_suppkey) AS total_days
      |  FROM census)
      |SELECT l_suppkey, CAST(MAX(tot) AS BIGINT) AS n_lines,
      |  CAST(MAX(total_days) AS BIGINT) AS total_lead_days,
      |  CAST(MAX(total_days) AS DOUBLE) / CAST(MAX(tot) AS DOUBLE) AS mean_lead_days,
      |  MIN(CASE WHEN cw * 2 >= tot THEN lead_d END) AS p50_lead_days
      |FROM cum GROUP BY l_suppkey
      |ORDER BY l_suppkey""".stripMargin) { (s, d) =>
    val leads = Tables.lineitem(s, d)
      .join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"),
        datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("lead_d"))
    val census = leads.groupBy("l_suppkey", "lead_d").agg(count(lit(1)).as("c"))
    val wS = org.apache.spark.sql.expressions.Window.partitionBy("l_suppkey")
    val cum = census
      .withColumn("cw", sum("c").over(wS.orderBy("lead_d")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .withColumn("tot", sum("c").over(wS))
      .withColumn("total_days", sum(col("lead_d") * col("c")).over(wS))
    cum.groupBy("l_suppkey").agg(
      max("tot").as("n_lines"),
      max("total_days").as("total_lead_days"),
      (max("total_days").cast("double") / max("tot").cast("double"))
        .as("mean_lead_days"),
      min(when(col("cw") * 2 >= col("tot"), col("lead_d"))).as("p50_lead_days"))
      .orderBy("l_suppkey")
  }

  /** OPEN-ORDER AGING: the accounts-receivable-style backlog report —
    * non-finished orders bucketed by age against the corpus's own max
    * order date (injectable-clock discipline), with exact cents value
    * per (status, bucket) cell and the share of open value in exact
    * ppm. Age buckets are the standard 30/60/90/120+ ladder, assigned
    * by integer day arithmetic.
    *
    * Scale (100 TB): the bucket needs the anchor PER ROW (it can't
    * ride a census window), so the anchor is attached by the q273
    * 1-row broadcast; the aggregate is then map-side combinable into
    * ≤ 2·5 cells and the share window runs over that census. */
  val qOrderAging: GraftQuery = GraftQuery(
    "q295_order_aging",
    """WITH anch AS (
      |  SELECT CAST(max(CAST(o_orderdate AS DATE)) AS DATE) AS today FROM orders),
      |aged AS (
      |  SELECT o.o_orderstatus AS status,
      |    CAST(a.today - CAST(o.o_orderdate AS DATE) AS BIGINT) AS age_d,
      |    CAST(CAST(o.o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) AS cents
      |  FROM orders o CROSS JOIN anch a
      |  WHERE o.o_orderstatus <> 'F'),
      |bucketed AS (
      |  SELECT status,
      |    CASE WHEN age_d < 30 THEN '0-29'
      |         WHEN age_d < 60 THEN '30-59'
      |         WHEN age_d < 90 THEN '60-89'
      |         WHEN age_d < 120 THEN '90-119'
      |         ELSE '120+' END AS bucket,
      |    cents
      |  FROM aged),
      |cells AS (
      |  SELECT status, bucket, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |    CAST(SUM(cents) AS BIGINT) AS value_cents
      |  FROM bucketed GROUP BY status, bucket)
      |SELECT status, bucket, n_orders, value_cents,
      |  CAST((value_cents * 1000000) // (SUM(value_cents) OVER ()) AS BIGINT)
      |    AS value_share_ppm
      |FROM cells ORDER BY status, bucket""".stripMargin) { (s, d) =>
    val anch = Tables.orders(s, d)
      .agg(max(col("o_orderdate").cast("date")).as("today"))
      .withColumn("one", lit(1))
    val aged = Tables.orders(s, d)
      .where(col("o_orderstatus") =!= "F")
      .withColumn("one", lit(1))
      .join(broadcast(anch), "one")
      .select(col("o_orderstatus").as("status"),
        datediff(col("today"), col("o_orderdate").cast("date")).cast("long").as("age_d"),
        (col("o_totalprice").cast("decimal(14,2)") * 100).cast("long").as("cents"))
    val cells = aged
      .withColumn("bucket",
        when(col("age_d") < 30, "0-29")
          .when(col("age_d") < 60, "30-59")
          .when(col("age_d") < 90, "60-89")
          .when(col("age_d") < 120, "90-119")
          .otherwise("120+"))
      .groupBy("status", "bucket")
      .agg(count(lit(1)).as("n_orders"), sum("cents").cast("long").as("value_cents"))
    cells
      .withColumn("tot", sum("value_cents").over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("value_share_ppm",
        expr("(value_cents * 1000000) div tot"))
      .drop("tot")
      .orderBy("status", "bucket")
  }

  def all: Seq[GraftQuery] = Seq(
    qSmallQtyRevenue, qMarketShare, qGroupingSets, qNullSafeJoin,
    qMultisetOps, qHashSample, qHistogram, qFullOuterArgPick, qStatsExact,
    qGapFill, qForwardFill, qFunnel, qBlameSuppliers, qSlidingMau, qRetention,
    qRollingTimeWindow, qActivityStreaks, qFirstTouch, qIdleRich,
    qImportantStock, qLorenzGini, qSupplierLeadTime, qOrderAging)
}
