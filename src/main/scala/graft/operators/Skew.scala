package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities. At 100 TB a handful of hot keys (a viral
  * user, an empty-string normalization artifact) turn one shuffle
  * partition into the whole job's critical path. Two standard cures,
  * both semantics-preserving:
  *
  *  - [[saltedAggregate]]: two-stage aggregation — group on
  *    (key, salt) first (spreads a hot key over N partitions), then
  *    re-aggregate by key. Requires the aggregate to decompose
  *    (sum/count/min/max — anything with a merge form).
  *  - [[saltedJoin]]: replicate the small side N ways, salt the big
  *    side randomly — every big-side row still meets its match exactly
  *    once, but a hot key's rows spread over N reducers.
  *
  * AQE's skewedJoin handles sort-merge cases adaptively; explicit
  * salting remains the tool for aggregations and for joins AQE can't
  * rebalance (e.g. after a cached exchange).
  */
object Skew {

  /** Two-stage (salted) sum/count aggregation: exactly equals the
    * direct groupBy — addition is associative — but no single reducer
    * ever sees a whole hot key. */
  def saltedAggregate(df: DataFrame, key: Column, sumCol: Column,
      salts: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(hash(monotonically_increasing_id()), lit(salts)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(sum(sumCol).as("partial_sum"), count(lit(1)).as("partial_n"))
    partial.groupBy("k")
      .agg(sum(col("partial_sum")).as("total"), sum(col("partial_n")).as("n"))
  }

  /** Skew-safe equi-join of a skewed big side against a small side:
    * small side is replicated `salts` times, big side rows pick one
    * replica — result identical to the plain join. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<int>")))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted aggregation over the 5-value event_type key — maximal skew
    * by construction (every row is one of five keys). Oracle is the
    * direct group-by: results must be IDENTICAL (decimal sums exact
    * under any grouping order). */
  val qSaltedAgg: GraftQuery = GraftQuery(
    "q41_salted_agg",
    """SELECT event_type,
      |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS total,
      |  COUNT(*) AS n
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    saltedAggregate(Tables.events(s, d),
        col("event_type"), col("value").cast("decimal(14,2)"))
      .select(col("k").as("event_type"),
        col("total").cast("double").as("total"), col("n"))
      .orderBy("event_type")
  }

  /** Salted JOIN against the plain-join oracle: replicate-small /
    * salt-big must be result-identical to the direct equi-join. */
  val qSaltedJoin: GraftQuery = GraftQuery(
    "q83_salted_join",
    """SELECT c.c_mktsegment,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(e.value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY c.c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    val big = Tables.events(s, d).select(col("user_id").as("c_custkey"), col("value"))
    val small = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
    saltedJoin(big, small, "c_custkey")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("sum_value"))
      .orderBy("c_mktsegment")
  }

  /** Partition count the salt recommendation is sized against (the
    * session's shuffle parallelism). */
  val skewParts = 32

  /** A key is flagged skewed when it alone would fill more than two
    * average shuffle partitions (the same 2× heuristic AQE's
    * skewedPartitionFactor defaults embody). */
  val skewFactor = 2

  /** Skew DIAGNOSTIC — the observability side of q41/q83: per-key
    * load census with an integer salt-factor recommendation, the
    * report a pipeline owner reads before deciding which keys need
    * [[saltedAggregate]]/[[saltedJoin]] (or whether AQE's runtime
    * skew split suffices).
    *
    * All decision arithmetic is exact integers (cross-multiplied —
    * never a double ratio): share_ppm = cnt·1e6 div total,
    * salt_factor = ⌈cnt·parts/total⌉ = the number of salt buckets
    * that brings the key's per-reducer load back to the average
    * partition load, is_skewed = cnt·parts > 2·total.
    *
    * 100 TB: one map-side-combined groupBy over the key (the grouped
    * relation is key-cardinality-sized); the total comes from an
    * unpartitioned window over THAT tiny relation, not a second scan
    * of the fact table. */
  val qSkewReport: GraftQuery = GraftQuery(
    "q170_skew_report",
    s"""WITH per_key AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM events GROUP BY event_type),
       |tot AS (
       |  SELECT event_type, cnt,
       |    CAST(SUM(cnt) OVER () AS BIGINT) AS total
       |  FROM per_key)
       |SELECT event_type, cnt,
       |  CAST((cnt * 1000000) // total AS BIGINT) AS share_ppm,
       |  CAST((cnt * $skewParts + total - 1) // total AS INTEGER) AS salt_factor,
       |  CAST(cnt * $skewParts > $skewFactor * total AS BOOLEAN) AS is_skewed
       |FROM tot
       |ORDER BY cnt DESC, event_type""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val perKey = Tables.events(s, d)
      .groupBy("event_type").agg(count(lit(1)).as("cnt"))
    perKey
      .withColumn("total", sum("cnt").over(Window.partitionBy()))
      .select(col("event_type"), col("cnt"),
        expr("(cnt * 1000000) div total").as("share_ppm"),
        expr(s"(cnt * $skewParts + total - 1) div total").cast("int").as("salt_factor"),
        (col("cnt") * skewParts > col("total") * skewFactor).as("is_skewed"))
      .orderBy(col("cnt").desc, col("event_type"))
  }

  def all: Seq[GraftQuery] = Seq(qSaltedAgg, qSaltedJoin, qSkewReport)
}
