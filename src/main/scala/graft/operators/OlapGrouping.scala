package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Multi-level aggregation, scale-shaped: the ROLLUP / CUBE /
  * GROUPING SETS family re-expressed as the two-level rewrite that
  * survives 100 TB, plus GROUPING() subtotal markers and a global
  * ntile decile profile.
  *
  * q13/q54/q58 already cover the DIRECT grouping-set forms (Expand
  * straight over the fact scan — correct, and fine when the fact is
  * small or the set count is low). This family is the production
  * counterpart: aggregate to the finest grain first, then expand the
  * compact grain — plus the GROUPING() markers those queries omit,
  * over a star join rather than a single table.
  *
  * Scale design (100 TB):
  *  - Spark plans rollup/cube/groupingSets as Expand (one replica of
  *    each input row per grouping set) feeding a hash aggregate.
  *    Expanding the FACT table multiplies shuffle input by the number
  *    of sets, so every query here aggregates to the finest grain
  *    FIRST (partial-aggregatable, map-side combined) and applies the
  *    grouping-set operator to the compact result. The decimal
  *    sum-of-sums is exact and associative, so the two-level rewrite
  *    is value-identical to the direct form — OlapGroupingSpec pins
  *    the Expand input cardinality.
  *  - ntile(k) with no PARTITION BY forces a single-partition window;
  *    that is fine on a dimension-sized relation (customers) but the
  *    fact-scale path is approximate cutpoints (q208's histogram
  *    sketch) broadcast as a bucketing expression. The scaladoc on
  *    q245 spells the tradeoff; q68's rank windows are the partitioned
  *    shape that parallelizes.
  */
object OlapGrouping {

  private def dec(c: Column, p: Int, s: Int): Column = c.cast(s"decimal($p,$s)")

  /** Orders revenue by region -> nation with ROLLUP subtotals and a
    * grand total; GROUPING() markers disambiguate subtotal NULLs from
    * data NULLs (r_name/n_name are NOT NULL here, but the markers are
    * part of the operator's contract). Two-level: the star join
    * aggregates to (region, nation) — 25 groups — before the rollup
    * Expand touches anything. */
  val qRollupRevenue: GraftQuery = GraftQuery(
    "q243_rollup_revenue",
    """WITH base AS (
      |  SELECT r_name, n_name,
      |    COUNT(*) AS n_g,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_g
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY r_name, n_name)
      |SELECT r_name, n_name,
      |  CAST(GROUPING(r_name) AS BIGINT) AS g_region,
      |  CAST(GROUPING(n_name) AS BIGINT) AS g_nation,
      |  CAST(SUM(n_g) AS BIGINT) AS n_orders,
      |  CAST(SUM(rev_g) AS DOUBLE) AS revenue
      |FROM base
      |GROUP BY ROLLUP(r_name, n_name)
      |ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin) { (s, d) =>
    // subquery alias + qualified refs: rollup's Expand replicates the
    // join-tagged grouping attributes across sets, which trips
    // DetectAmbiguousSelfJoin's false positive on agg-over-join input;
    // qualifying through the alias resolves each ref unambiguously
    val base = Tables.orders(s, d)
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_g"), sum(dec(col("o_totalprice"), 18, 2)).as("rev_g"))
      .as("b")
    base.rollup(col("b.r_name"), col("b.n_name"))
      .agg(
        grouping(col("b.r_name")).cast("bigint").as("g_region"),
        grouping(col("b.n_name")).cast("bigint").as("g_nation"),
        sum(col("n_g")).cast("bigint").as("n_orders"),
        sum(col("rev_g")).cast("double").as("revenue"))
      .orderBy(col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
  }

  /** CUBE over (returnflag, linestatus): all four grains — cell,
    * per-flag, per-status, grand total — in one pass over the 6-row
    * fine-grain aggregate, never the lineitem scan. */
  val qCubeLineitem: GraftQuery = GraftQuery(
    "q244_cube_lineitem",
    """WITH base AS (
      |  SELECT l_returnflag, l_linestatus,
      |    COUNT(*) AS n_g,
      |    SUM(l_quantity) AS qty_g,
      |    SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS disc_g
      |  FROM lineitem
      |  GROUP BY l_returnflag, l_linestatus)
      |SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
      |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
      |  CAST(SUM(n_g) AS BIGINT) AS n_items,
      |  SUM(qty_g) AS sum_qty,
      |  CAST(SUM(disc_g) AS DOUBLE) AS sum_disc_price
      |FROM base
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
    val price = dec(col("l_extendedprice"), 12, 2)
    val disc = dec(col("l_discount"), 4, 2)
    val one = lit(1).cast("decimal(3,2)")
    val base = Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n_g"),
        // integral-valued double: exact under fp sum at both levels
        sum(col("l_quantity")).as("qty_g"),
        sum(price * (one - disc)).as("disc_g"))
    base.cube("l_returnflag", "l_linestatus")
      .agg(
        grouping(col("l_returnflag")).cast("bigint").as("g_flag"),
        grouping(col("l_linestatus")).cast("bigint").as("g_status"),
        sum(col("n_g")).cast("bigint").as("n_items"),
        sum(col("qty_g")).as("sum_qty"),
        sum(col("disc_g")).cast("double").as("sum_disc_price"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** GROUPING SETS ((priority), (status)): two independent order
    * summaries from ONE pass over the 15-cell (priority x status)
    * fine grain. The alternative — two separate groupBys — scans (or
    * reshuffles) the input twice. */
  val qGroupingSets: GraftQuery = GraftQuery(
    "q246_grouping_sets",
    """WITH base AS (
      |  SELECT o_orderpriority, o_orderstatus,
      |    COUNT(*) AS n_g,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_g
      |  FROM orders
      |  GROUP BY o_orderpriority, o_orderstatus)
      |SELECT o_orderpriority, o_orderstatus,
      |  CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
      |  CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(SUM(n_g) AS BIGINT) AS n_orders,
      |  CAST(SUM(rev_g) AS DOUBLE) AS revenue
      |FROM base
      |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
      |ORDER BY o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST""".stripMargin) { (s, d) =>
    val base = Tables.orders(s, d)
      .groupBy("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n_g"), sum(dec(col("o_totalprice"), 18, 2)).as("rev_g"))
    base.groupingSets(
        Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus"))),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(
        grouping(col("o_orderpriority")).cast("bigint").as("g_priority"),
        grouping(col("o_orderstatus")).cast("bigint").as("g_status"),
        sum(col("n_g")).cast("bigint").as("n_orders"),
        sum(col("rev_g")).cast("double").as("revenue"))
      .orderBy(col("o_orderpriority").asc_nulls_first, col("o_orderstatus").asc_nulls_first)
  }

  /** Customer-balance deciles: ntile(10) over a TOTAL unique order
    * (c_acctbal, c_custkey) — ties broken by the key, so bucket
    * assignment is engine-independent — then per-decile stats.
    *
    * Scale note: an unpartitioned ntile is a single-partition window
    * (every row through one task). Acceptable on a dimension table;
    * at fact scale use [[qDecilesScalable]] (q304) — the two-level
    * rank decomposition that computes the SAME exact deciles with
    * bounded-partition windows, hash-proven equal to this query. */
  val qNtileDeciles: GraftQuery = GraftQuery(
    "q245_ntile_deciles",
    """SELECT decile,
      |  COUNT(*) AS n_cust,
      |  MIN(c_acctbal) AS min_bal,
      |  MAX(c_acctbal) AS max_bal,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal
      |FROM (SELECT c_acctbal,
      |        NTILE(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
      |      FROM customer)
      |GROUP BY decile
      |ORDER BY decile""".stripMargin) { (s, d) =>
    val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.customer(s, d)
      .select(col("c_acctbal"), ntile(10).over(w).cast("bigint").as("decile"))
      .groupBy("decile")
      .agg(
        count(lit(1)).as("n_cust"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"),
        sum(dec(col("c_acctbal"), 12, 2)).cast("double").as("sum_bal"))
      .orderBy("decile")
  }

  /** FACT-SCALE GLOBAL DECILES — q245's exact NTILE(10) output
    * computed WITHOUT the single-partition window, by the q181/q148
    * two-level rank decomposition applied globally:
    *
    *  1. shard rows by a monotone PREFIX of the sort order (512-wide
    *     value-range bins of c_acctbal);
    *  2. rank within each (bin) window — bounded partitions that
    *     parallelize across the cluster;
    *  3. recover the exact global rank as bin-local rank + the
    *     cumulative count of all earlier bins (a BOUNDED per-bin
    *     histogram — the only unpartitioned window runs over those
    *     ~two dozen rows, never over the data);
    *  4. map the global rank to NTILE(10)'s bucket with the standard
    *     uneven-division arithmetic (first n%10 buckets get one extra
    *     row), all in exact integers.
    *
    * The oracle is q245's plain NTILE SQL verbatim — the hash match
    * IS the proof the decomposition is exact. At 100 TB the bin grid
    * comes from a coarse value histogram (or a q208 sketch) instead
    * of a fixed width; the plan shape is unchanged: one narrow scan,
    * one bounded-partition window, two broadcast joins.
    * PlanAuditSpec pins that no unpartitioned window consumes an
    * unaggregated input. */
  val qDecilesScalable: GraftQuery = GraftQuery(
    "q304_deciles_scalable", qNtileDeciles.oracle.get) { (s, d) =>
    val scored = Tables.customer(s, d)
      .select(col("c_acctbal"), col("c_custkey"))
      .withColumn("bin", floor(col("c_acctbal").cast("double") / 512.0))
    // bounded per-bin histogram → cumulative offset of earlier bins
    val offsets = scored.groupBy("bin").agg(count(lit(1)).as("bin_n"))
      .withColumn("offset", coalesce(sum("bin_n").over(
        Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("bin"), col("offset"))
    val total = scored.agg(count(lit(1)).as("n"))
    val wLocal = Window.partitionBy("bin")
      .orderBy(col("c_acctbal"), col("c_custkey"))
    scored
      .withColumn("local_rnk", row_number().over(wLocal))
      .join(broadcast(offsets), Seq("bin"))
      .crossJoin(broadcast(total))
      .withColumn("r", col("offset") + col("local_rnk"))
      .withColumn("nq", expr("n div 10"))
      .withColumn("rem", expr("n % 10"))
      // NTILE(10): bucket b ≤ rem holds nq+1 rows, the rest nq. The
      // else branch never divides by zero: nq = 0 forces rem = n and
      // every rank takes the first branch (CASE is lazy per row).
      .withColumn("decile", expr(
        """CASE WHEN r <= rem * (nq + 1) THEN (r - 1) div (nq + 1) + 1
          |     ELSE rem + (r - rem * (nq + 1) - 1) div nq + 1 END""".stripMargin))
      .groupBy("decile")
      .agg(
        count(lit(1)).as("n_cust"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"),
        sum(dec(col("c_acctbal"), 12, 2)).cast("double").as("sum_bal"))
      .orderBy("decile")
  }

  /** FACT-SCALE EXACT PERCENTILES by bin selection — the companion to
    * q304 for SELECTION (find the k-th value) rather than full ranking:
    * p50/p90/p99 of the event `value` with no global sort and no
    * single-partition window anywhere.
    *
    *  1. one map-side-combined pass builds the bounded value-range
    *     histogram (bin = floor(value/8), ~70 bins here) — the ONE
    *     bounded driver collect (≤ |bins| rows, the probeCells class);
    *  2. the driver walks the histogram to find, per percentile, the
    *     bin containing global rank k = ⌈p·n⌉ and the residual local
    *     rank within it;
    *  3. per percentile, ONE narrow scan with the bin's VALUE RANGE
    *     pushed to parquet (v/8 is a power-of-two division — exact —
    *     so `floor(v/8)=b ⟺ v ∈ [8b, 8b+8)` is an exact rewrite to a
    *     pushable range predicate) feeds a bounded
    *     TakeOrderedAndProject(local_k) and a 1-row max.
    *
    * At 100 TB the histogram pass is scan-speed and each selection
    * touches one bin's rows; a skewed bin re-bisects with the same
    * machinery — implemented in [[kthValueByBins]]: past `hotBinLimit`
    * rows in the selected bin, the bin's range re-histograms at
    * width/8 with the residual rank (recursing up to 3 levels), and a
    * bin that is STILL hot at the floor is answered by a 1-row
    * min=max aggregate when single-valued (ties can't change the
    * VALUE) — so the TakeOrdered heap is bounded by construction,
    * never sorts a hot bin. The oracle states the semantics as the
    * plain global row_number selection — the hash match proves the
    * decomposition exact. */
  val qPercentileScalable: GraftQuery = GraftQuery(
    "q310_percentile_exact_scalable",
    """WITH ranked AS (
      |  SELECT event_id, value,
      |    row_number() OVER (ORDER BY value, event_id) AS r,
      |    CAST(COUNT(*) OVER () AS BIGINT) AS n
      |  FROM events WHERE value IS NOT NULL)
      |SELECT CAST(p.pct AS INTEGER) AS pct, r.n,
      |  CAST(r.r AS BIGINT) AS rank, r.value
      |FROM ranked r
      |JOIN (VALUES (50), (90), (99)) p(pct)
      |  ON r.r = (r.n * p.pct + 99) // 100
      |ORDER BY pct""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .where(col("value").isNotNull)
      .select(col("event_id"), col("value"))
    percentilesByBins(ev, Seq(50, 90, 99), 8.0, hotBinLimit = Int.MaxValue)
  }

  /** The q310 body, parameterized so the spec can force the re-bisect
    * path with a small `hotBinLimit`. `binW` must be a power of two:
    * the `floor(value/w) = b ⟺ value ∈ [b·w, b·w + w)` rewrite to a
    * pushable range predicate, and the alignment of width/8 sub-bins
    * inside a parent bin, are exact only for power-of-two widths. */
  private[graft] def percentilesByBins(
      ev: org.apache.spark.sql.DataFrame, pcts: Seq[Int], binW: Double,
      hotBinLimit: Long): org.apache.spark.sql.DataFrame = {
    val hist = binHistogram(ev, None, binW)
    val n = hist.map(_._2).sum
    if (n == 0)
      // empty relation: the oracle's row_number selection yields zero
      // rows — short-circuit with the output schema instead of walking
      // an empty histogram (limit(0) keeps `value`'s type from ev)
      return ev.limit(0).select(lit(0).cast("int").as("pct"),
        lit(0L).as("n"), lit(0L).as("rank"), col("value"))
    def pick(pct: Int): org.apache.spark.sql.DataFrame = {
      val k = (n * pct + 99) / 100
      kthValueByBins(ev, k, None, binW, hotBinLimit, Some(hist), 0)
        .select(lit(pct).cast("int").as("pct"), lit(n).as("n"),
          lit(k).as("rank"), col("value"))
    }
    pcts.map(pick).reduceLeft(_ unionByName _).orderBy("pct")
  }

  /** One bounded histogram pass: (bin, count) for `ev.value` within
    * `range`, bin = floor(value/binW) — the ≤|bins|-row driver collect
    * of the selection machinery. */
  private def binHistogram(ev: org.apache.spark.sql.DataFrame,
      range: Option[(Double, Double)],
      binW: Double): Array[(Long, Long)] = {
    val scoped = range match {
      case Some((lo, hi)) =>
        ev.where(col("value") >= lit(lo) && col("value") < lit(hi))
      case None => ev
    }
    scoped
      .groupBy(floor(col("value") / binW).cast("long").as("bin"))
      .agg(count(lit(1)).as("c"))
      .orderBy("bin")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
  }

  /** The k-th (1-based, ordered by value then event_id) `value` of
    * `ev` restricted to `range`, as a 1-row frame: walk the bin
    * histogram to the bin holding rank k, then
    *  - bin ≤ hotBinLimit rows → pushed-range scan + bounded
    *    TakeOrdered(local) + 1-row max (the normal path);
    *  - hot bin → RE-BISECT: recurse into the bin's range at width/8
    *    with the residual rank (same machinery, one more bounded
    *    histogram pass), up to 3 levels;
    *  - still hot at the floor → if the bin is single-valued
    *    (min = max; a 90%-of-mass repeated value never thins under
    *    re-bisection) the k-th value IS that value — answer with a
    *    1-row aggregate, no ordering at all; a multi-valued hot floor
    *    bin fails loudly rather than truncating the heap. */
  private[graft] def kthValueByBins(ev: org.apache.spark.sql.DataFrame,
      k: Long, range: Option[(Double, Double)], binW: Double,
      hotBinLimit: Long, precomputed: Option[Array[(Long, Long)]],
      depth: Int): org.apache.spark.sql.DataFrame = {
    val hist = precomputed.getOrElse(binHistogram(ev, range, binW))
    var cum = 0L
    val (bin, local, binN) = hist.collectFirst {
      case (b, c) if { val hit = cum + c >= k; if (!hit) cum += c; hit } =>
        (b, k - cum, c)
    }.getOrElse(sys.error(
      s"rank $k beyond histogram total ${hist.map(_._2).sum}"))
    val lo = bin * binW
    val hi = (bin + 1) * binW
    val binRows = ev.where(col("value") >= lit(lo) && col("value") < lit(hi))
    if (binN <= hotBinLimit && local <= Int.MaxValue)
      binRows
        .orderBy(col("value"), col("event_id"))
        .limit(local.toInt)
        .agg(max(col("value")).as("value"))
    else if (depth < 3)
      kthValueByBins(ev, local, Some((lo, hi)), binW / 8.0, hotBinLimit,
        None, depth + 1)
    else {
      val mm = binRows.agg(min(col("value")).as("mn"),
        max(col("value")).as("mx")).first()
      require(mm.get(0) == mm.get(1),
        s"q310: bin [$lo,$hi) still holds $binN > $hotBinLimit rows of " +
          s"distinct values after 3 re-bisections (width $binW) — " +
          "raise hotBinLimit or the re-bisect depth")
      ev.sparkSession.range(1)
        .select(lit(mm.get(0)).cast(
          ev.schema("value").dataType).as("value"))
    }
  }

  /** PER-GROUP exact percentiles under group skew — the q181
    * decomposition applied to percentile SELECTION: a per-group
    * window puts each whole group on one task (an 80%-hot event type
    * = one straggler), so ranks are recovered from bounded
    * (group, value-bin) windows + the cumulative per-group bin
    * histogram, and each group's p50/p95 rows are selected by exact
    * integer rank equality — ONE pass over the fact, windows bounded
    * by bin occupancy, target ranks via a broadcast of the per-group
    * totals. Oracle states the plain per-group row_number selection;
    * the hash match proves the decomposition. */
  val qGroupPercentileScalable: GraftQuery = GraftQuery(
    "q317_group_percentile_scalable",
    """WITH ranked AS (
      |  SELECT event_type, value,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY value, event_id) AS r,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      |  FROM events WHERE value IS NOT NULL)
      |SELECT event_type, CAST(p.pct AS INTEGER) AS pct, n,
      |  CAST(r AS BIGINT) AS rank, value
      |FROM ranked
      |JOIN (VALUES (50), (95)) p(pct)
      |  ON r = (n * p.pct + 99) // 100
      |ORDER BY event_type, pct""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .where(col("value").isNotNull)
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("bin", floor(col("value") / 8.0).cast("long"))
    val wOff = Window.partitionBy("event_type").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ev.groupBy("event_type", "bin")
      .agg(count(lit(1)).as("bin_n"))
      .withColumn("offset", coalesce(sum("bin_n").over(wOff), lit(0L)))
      .select("event_type", "bin", "offset")
    val targets = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      .withColumn("pct", explode(array(lit(50), lit(95))))
      .withColumn("k", expr("(n * pct + 99) div 100"))
    val wLocal = Window.partitionBy("event_type", "bin")
      .orderBy(col("value"), col("event_id"))
    val tgt = targets.withColumnRenamed("event_type", "t_type")
    ev.withColumn("local_rnk", row_number().over(wLocal))
      .join(broadcast(offsets), Seq("event_type", "bin"))
      .withColumn("r", col("offset") + col("local_rnk"))
      .join(broadcast(tgt),
        col("event_type") === col("t_type") && col("r") === col("k"))
      .select(col("event_type"), col("pct").cast("int").as("pct"),
        col("n"), col("r").as("rank"), col("value"))
      .orderBy("event_type", "pct")
  }

  val all: Seq[GraftQuery] =
    Seq(qRollupRevenue, qCubeLineitem, qNtileDeciles, qGroupingSets,
      qDecilesScalable, qPercentileScalable, qGroupPercentileScalable)
}
