package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (band) join: match rows whose numeric/temporal value falls in
  * an interval derived from the other side. Spark plans a raw
  * `a BETWEEN lo AND hi` join as BroadcastNestedLoopJoin — O(n·m), dead
  * at scale. The scalable composition is bin bucketing: quantize both
  * sides to fixed-width bins, equi-join on the bin id (the interval
  * side explodes to every bin it overlaps), then apply the exact
  * predicate. The equi-join prunes candidates to O(rows × bins-per-
  * interval); the final filter keeps semantics EXACT — binning is a
  * candidate generator, not an approximation.
  *
  * DuckDB executes the same query with its native IEJoin, which makes
  * it a genuine cross-engine check that the binned plan loses nothing.
  */
object RangeJoin {

  /** Candidate-pruned exact band join.
    * @param probe     side carrying the interval [lo, hi]
    * @param build     side carrying the point value
    * @param lo hi     interval bounds on probe
    * @param point     point column on build
    * @param binWidth  quantization width — tune to the typical interval
    *                  size so intervals span O(1) bins
    */
  def bandJoin(probe: DataFrame, build: DataFrame, lo: Column, hi: Column,
      point: Column, binWidth: Double): DataFrame = {
    val probeBinned = probe
      .withColumn("__lo", lo).withColumn("__hi", hi)
      .withColumn("__bin",
        explode(sequence(floor(col("__lo") / binWidth).cast("long"),
          floor(col("__hi") / binWidth).cast("long"))))
    val buildBinned = build
      .withColumn("__pt", point)
      .withColumn("__bin", floor(col("__pt") / binWidth).cast("long"))
    probeBinned.join(buildBinned, "__bin")
      .where(col("__pt") >= col("__lo") && col("__pt") <= col("__hi"))
      .drop("__bin", "__lo", "__hi", "__pt")
  }

  /** Events band-joined to parts in a price window around the event
    * value, aggregated per event (events.value·10 ± 25 vs
    * p_retailprice). Oracle is the direct BETWEEN join — DuckDB IEJoin
    * vs our binned plan must agree exactly. */
  val qRangeJoin: GraftQuery = GraftQuery(
    "q40_range_join",
    """SELECT e.event_id,
      |  COUNT(p.p_partkey) AS n_parts,
      |  MIN(p.p_partkey) AS min_partkey
      |FROM events e
      |JOIN part p
      |  ON p.p_retailprice BETWEEN e.value * 10 - 25 AND e.value * 10 + 25
      |GROUP BY e.event_id
      |ORDER BY e.event_id""".stripMargin) { (s, d) =>
    val events = Tables.events(s, d).select(col("event_id"), col("value"))
    val part = Tables.part(s, d).select(col("p_partkey"), col("p_retailprice"))
    bandJoin(events, part,
        lo = col("value") * 10 - 25, hi = col("value") * 10 + 25,
        point = col("p_retailprice"), binWidth = 50.0)
      .groupBy("event_id")
      .agg(count(col("p_partkey")).as("n_parts"),
        min(col("p_partkey")).as("min_partkey"))
      .orderBy("event_id")
  }

  def all: Seq[GraftQuery] = Seq(qRangeJoin)
}
