package graft.model

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** dbt-snapshot parity: SCD type-2 change tracking. The reference
  * declares the capability slot but never fills it
  * (/root/reference/dbt_project_old/dbt_postgres/snapshots/.gitkeep);
  * this is the standard contract dbt's `check` strategy implements:
  *
  * Target = source columns + (scd_id, valid_from, valid_to). A row is
  * CURRENT iff valid_to IS NULL. Each run:
  *   - unchanged keys: untouched
  *   - changed keys (any tracked column differs): current row closed
  *     (valid_to = runTs), new current row appended
  *   - new keys: appended as current
  *   - vanished keys: left open (dbt default: deletes aren't tracked)
  *
  * Storage is plain-parquet rewrite (stage + swap, like incremental
  * models); at 100 TB the identical contract rides a MERGE-capable
  * table format. Only CURRENT rows are compared against the source —
  * history is append-only and never rescanned for the diff, so run
  * cost is O(source + current), not O(history).
  */
object Snapshot {

  val metaCols: Seq[String] = Seq("scd_id", "valid_from", "valid_to")

  /** Run one snapshot pass. `runTs` injectable for determinism. */
  def run(spark: SparkSession, source: DataFrame, path: String,
      uniqueKey: String, runTs: Column = current_timestamp()): DataFrame = {
    val dataCols = source.columns.toSeq
    require(!dataCols.exists(metaCols.contains), s"source must not carry $metaCols")
    val hashed = source.withColumn("__chk", checkHash(dataCols))

    val exists = java.nio.file.Files.exists(java.nio.file.Paths.get(path))
    val next = if (!exists) {
      hashed.select(openRow(dataCols, runTs): _*)
    } else {
      val prev = spark.read.parquet(path)
      val current = prev.where(col("valid_to").isNull)
        .withColumn("__chk", checkHash(dataCols))
      val history = prev.where(col("valid_to").isNotNull)

      val srcK = hashed.select(col(uniqueKey).as("__k"), col("__chk").as("__src_chk"))
      // current rows: close those whose key exists in source with a new hash
      val kept = current.join(srcK, current(uniqueKey) === srcK("__k"), "left")
        .withColumn("valid_to",
          when(col("__src_chk").isNotNull && col("__src_chk") =!= col("__chk"), runTs)
            .otherwise(col("valid_to")))
        .select(prev.columns.toIndexedSeq.map(col): _*)
      // source rows that are new keys or changed vs current: append as open
      val curK = current.select(col(uniqueKey).as("__k"), col("__chk").as("__cur_chk"))
      val opened = hashed.join(curK, hashed(uniqueKey) === curK("__k"), "left")
        .where(col("__cur_chk").isNull || col("__cur_chk") =!= col("__chk"))
        .select(openRow(dataCols, runTs): _*)

      history.unionByName(kept).unionByName(opened)
    }

    // stage + rename-aside swap: the plan reads `path` lazily, and the
    // previous snapshot must survive any mid-swap failure (FsOps doc)
    val tmp = s"$path.__staging"
    next.write.mode(SaveMode.Overwrite).parquet(tmp)
    graft.spark.FsOps.swapInto(spark, tmp, path)
    spark.read.parquet(path)
  }

  /** Row-content hash: \u0001 field separator, \u0000 null sentinel —
    * concatenation WITHOUT a separator would collide ("ab","c") with
    * ("a","bc"), and a printable sentinel would collide with real data. */
  private def checkHash(dataCols: Seq[String]): Column =
    md5(concat_ws("\u0001",
      dataCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))

  private def openRow(dataCols: Seq[String], runTs: Column) =
    dataCols.map(col) ++ Seq(
      col("__chk").as("scd_id"),
      runTs.cast("timestamp").as("valid_from"),
      lit(null).cast("timestamp").as("valid_to"))
}
