package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: a Spark DataFrame program over the testdata
  * tables plus (when SQL-expressible) the equivalent DuckDB SQL the
  * driver uses as correctness oracle.
  *
  * Oracle-parity ground rules (see SURVEY §5.2, §7.4 and the t2 gate):
  *   - Every computed column is aliased IDENTICALLY on both sides.
  *   - Results carry a deterministic total order (ORDER BY a unique
  *     key both sides) — no reliance on engine row order.
  *   - Double AGGREGATES are computed exactly: inputs cast to DECIMAL,
  *     summed (exact, associative — safe under any parallelism /
  *     partial aggregation), then cast back to DOUBLE. Per-row double
  *     arithmetic is IEEE-deterministic and needs no such care.
  *   - Integer-ish outputs: Spark size()/length() are INT while DuckDB
  *     len()/length() are BIGINT — the DuckDB side casts explicitly.
  *   - `events.ts` is nanosecond parquet; both Spark and DuckDB ≥1.0
  *     truncate to microseconds on read, so µs-level values compare
  *     equal; second-level epoch/date_trunc used where it matters.
  */
final case class GraftQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

object GraftQuery {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, fn, Some(oracle))

  def apply(name: String, oracle: String, headline: Boolean)(
      fn: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, fn, Some(oracle), headline)

  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, fn, None)
}
