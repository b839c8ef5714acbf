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

  def all: Seq[GraftQuery] = Seq(qSaltedAgg, qSaltedJoin)
}
