package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Remaining scalar/shape coverage: pivot, explode, math functions,
  * and the spark.sql text-SQL surface. */
object Extras {

  /** Pivot (wide conditional aggregation). Spark's .pivot with an
    * explicit value list ⇒ deterministic column set; the oracle spells
    * the same thing as CASE aggregation. */
  val qPivot: GraftQuery = GraftQuery(
    "q44_pivot",
    """SELECT user_id,
      |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
      |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
      |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
      |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
      |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("user_id")
  }

  /** explode/unnest + re-aggregate: per-token document frequency. */
  val qExplodeTokens: GraftQuery = GraftQuery(
    "q45_explode_tokens",
    """SELECT token, COUNT(DISTINCT doc_id) AS doc_freq, COUNT(*) AS total_freq
      |FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      |      FROM documents)
      |GROUP BY token
      |ORDER BY token""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("token"))
      .groupBy("token")
      .agg(countDistinct(col("doc_id")).as("doc_freq"), count(lit(1)).as("total_freq"))
      .orderBy("token")
  }

  /** Exactly-specified math functions (abs/sign/ceil/floor/round/mod/
    * sqrt are IEEE-determined; transcendentals like log/exp are NOT
    * bit-specified across libm implementations and stay out of
    * hash-compared outputs). */
  val qMathFuncs: GraftQuery = GraftQuery(
    "q46_math_funcs",
    """SELECT l_orderkey, l_linenumber,
      |  abs(l_extendedprice - 50000) AS abs_delta,
      |  CAST(sign(l_extendedprice - 50000) AS INTEGER) AS delta_sign,
      |  CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_ceil7,
      |  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_kbucket,
      |  CAST(round(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2)), 2) AS DOUBLE) AS discount_amount,
      |  CAST(l_orderkey % 97 AS BIGINT) AS key_mod97,
      |  sqrt(l_quantity) AS qty_sqrt,
      |  greatest(l_quantity, 25.0) AS qty_floor25,
      |  least(l_quantity, 25.0) AS qty_cap25
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      abs(col("l_extendedprice") - 50000).as("abs_delta"),
      signum(col("l_extendedprice") - 50000).cast("int").as("delta_sign"),
      ceil(col("l_quantity") / 7).as("qty_ceil7"),
      floor(col("l_extendedprice") / 1000).as("price_kbucket"),
      // round() over an EXACT decimal product: double round() tie-breaks
      // differ across engines near .xx5; decimal ties are exact and both
      // engines round them away-from-zero
      round(col("l_extendedprice").cast("decimal(12,2)") * col("l_discount").cast("decimal(4,2)"), 2)
        .cast("double").as("discount_amount"),
      (col("l_orderkey") % 97).as("key_mod97"),
      sqrt(col("l_quantity")).as("qty_sqrt"),
      greatest(col("l_quantity"), lit(25.0)).as("qty_floor25"),
      least(col("l_quantity"), lit(25.0)).as("qty_cap25"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** The text-SQL surface: the engine accepts SQL strings over
    * registered views (spark.sql), not just the DataFrame DSL. Same
    * pricing-summary semantics as q01, entered as SQL. */
  val qSqlApi: GraftQuery = GraftQuery(
    "q47_sql_api",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  SUM(l_quantity) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM lineitem
      |WHERE l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.registerAll(s, d)
    s.sql(
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  SUM(l_quantity) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** T2 reference parity (Application.py:207): case-insensitive regex
    * routing — classify free text by alternation patterns. */
  val qRegexRoute: GraftQuery = GraftQuery(
    "q51_regex_route",
    """SELECT doc_id,
      |  regexp_matches(text, '(?i)spark.*join|merge.*sort') AS is_join_topic,
      |  regexp_matches(text, '(?i)stream|window|batch') AS is_stream_topic,
      |  CASE WHEN regexp_matches(text, '(?i)spark.*join|merge.*sort') THEN 'join'
      |       WHEN regexp_matches(text, '(?i)stream|window|batch') THEN 'stream'
      |       ELSE 'other' END AS route
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val joinTopic = col("text").rlike("(?i)spark.*join|merge.*sort")
    val streamTopic = col("text").rlike("(?i)stream|window|batch")
    Tables.documents(s, d).select(
      col("doc_id"),
      joinTopic.as("is_join_topic"),
      streamTopic.as("is_stream_topic"),
      when(joinTopic, "join").when(streamTopic, "stream").otherwise("other").as("route"))
      .orderBy("doc_id")
  }

  /** Approximate distinct counting (HLL++) — the sketch differs from
    * DuckDB's, so this is rows-only; its error bound vs the exact
    * count is asserted in ApproxSpec. */
  val qApproxDistinct: GraftQuery = GraftQuery.noOracle("q52_approx_distinct") { (s, d) =>
    Tables.lineitem(s, d).groupBy("l_returnflag").agg(
      approx_count_distinct(col("l_partkey"), rsd = 0.02).as("approx_parts"),
      countDistinct(col("l_partkey")).as("exact_parts"))
      .orderBy("l_returnflag")
  }

  /** Exact percentiles (linear interpolation between closest ranks) —
    * Spark percentile() and DuckDB quantile_cont share the definition,
    * and interpolating between parquet-exact doubles is IEEE-stable. */
  val qPercentiles: GraftQuery = GraftQuery(
    "q53_percentiles",
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS median_qty,
      |  quantile_cont(l_quantity, 0.9) AS p90_qty,
      |  quantile_cont(l_extendedprice, 0.5) AS median_price,
      |  quantile_cont(l_extendedprice, 0.99) AS p99_price
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).groupBy("l_returnflag").agg(
      expr("percentile(l_quantity, 0.5)").as("median_qty"),
      expr("percentile(l_quantity, 0.9)").as("p90_qty"),
      expr("percentile(l_extendedprice, 0.5)").as("median_price"),
      expr("percentile(l_extendedprice, 0.99)").as("p99_price"))
      .orderBy("l_returnflag")
  }

  /** CUBE grouping sets (all four grouping combinations). */
  val qCube: GraftQuery = GraftQuery(
    "q54_cube",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,1))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(12,1)")).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  def all: Seq[GraftQuery] = Seq(qPivot, qExplodeTokens, qMathFuncs, qSqlApi,
    qRegexRoute, qApproxDistinct, qPercentiles, qCube)
}
