package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-flow analytics: the first-order Markov TRANSITION MATRIX of
  * event types within per-user streams — which action follows which,
  * and with what conditional probability. The behavioral twin of
  * q175's attribution (same per-user (ts, event_id) ordering, same
  * single user_id exchange): funnels ask "did the user reach step
  * k?", the transition matrix asks "where does traffic FLOW?" — the
  * input to next-action prediction and anomaly detection on event
  * streams.
  *
  * Conditional probabilities are exact integer ppm
  * ((n·1_000_000) div from_total — the q163/q181 convention): no
  * doubles near comparisons, partition-independent, engine-stable.
  *
  * Scale (100 TB): ONE exchange on user_id; lead() evaluates inside
  * the sorted partition; the (from, to) aggregate is map-side
  * combinable with at most |types|² = 25 groups — the output relation
  * is O(1) in corpus size. A trillion events yield the same 25-row
  * matrix through partial aggregation; nothing downstream of the
  * window ever shuffles more than the type-pair census.
  */
object EventFlow {

  val qTransitions: GraftQuery = GraftQuery(
    "q221_event_transitions",
    """WITH seq AS (
      |  SELECT user_id, event_type,
      |    lead(event_type) OVER (
      |      PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      |  FROM events),
      |pairs AS (
      |  SELECT event_type AS from_type, next_type AS to_type,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM seq WHERE next_type IS NOT NULL
      |  GROUP BY event_type, next_type),
      |totals AS (
      |  SELECT from_type, CAST(SUM(n) AS BIGINT) AS from_total
      |  FROM pairs GROUP BY from_type)
      |SELECT p.from_type, p.to_type, p.n, t.from_total,
      |  CAST((p.n * 1000000) // t.from_total AS BIGINT) AS p_ppm
      |FROM pairs p JOIN totals t USING (from_type)
      |ORDER BY from_type, to_type""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, d)
      .select(col("user_id"), col("event_type"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .where(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("from_type").agg(sum("n").as("from_total"))
    pairs.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"), col("from_total"),
        expr("(n * 1000000) div from_total").as("p_ppm"))
      .orderBy("from_type", "to_type")
  }

  def all: Seq[GraftQuery] = Seq(qTransitions)
}
