package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support: the co-located-join path. Writing both
  * sides of a recurring join bucketed (and sorted) by the join key
  * lets every subsequent join run WITHOUT a shuffle — bucket i joins
  * bucket i, already hash-partitioned on disk. At 100 TB this converts
  * the nightly fact-fact join from the largest exchange in the plant
  * to a mapper-side merge.
  *
  * Bucket count rules of thumb: target bucket files of 100-500 MB at
  * production scale; both sides of a co-located join need the SAME
  * count (or one a divisor of the other, with
  * spark.sql.bucketing.coalesceBucketsInJoin.enabled).
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (parquet). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — with equal
    * bucket counts Spark elides both shuffle exchanges (verify:
    * executedPlan has no ShuffleExchange). The merge hint pins the
    * sort-merge strategy: on small inputs Spark would otherwise pick a
    * broadcast join and the bucket layout would go unused. */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).hint("merge").join(spark.table(rightTable), key)

  /** True iff the executed plan of `df` contains no shuffle exchange.
    * Matches the shuffle distributions explicitly (hash, range, single
    * partition, round-robin) rather than a Broadcast lookbehind: a
    * `ReusedExchange ..., BroadcastExchange ...` line is NOT a shuffle,
    * but would end in "Exchange" and defeat the lookbehind form. */
  def isShuffleFree(df: DataFrame): Boolean =
    "Exchange (hashpartitioning|rangepartitioning|SinglePartition|RoundRobinPartitioning)".r
      .findFirstIn(df.queryExecution.executedPlan.toString).isEmpty
}
