package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Ingest job: reference parity for ETL/ETL.py (operators S1/S2).
  *
  * The reference reads a CSV in 100k-row pandas chunks, TRUNCATEs the
  * target table, appends chunk-by-chunk, and stops after 13 chunks
  * (ETL/ETL.py:45-54 — a hard ≈1.3M-row volume cap).
  *
  * Spark-first re-expression:
  *  - chunked read → partition-parallel `spark.read.csv`; chunk size
  *    becomes `spark.sql.files.maxPartitionBytes` — no loop, no
  *    driver-side memory ceiling to work around.
  *  - truncate-then-append → one atomic `SaveMode.Overwrite` write
  *    (same idempotent full-reload contract, minus the window where
  *    the reference's table is empty mid-load).
  *  - the 13-chunk cap → `limit(rowCap)`. NOTE: like the reference's
  *    "first 13 chunks", WHICH rows survive the cap is not defined —
  *    Spark takes them from whichever partitions answer first.
  */
object Ingest {

  val referenceRowCap: Int = 1_300_000 // 13 chunks × 100k, ETL/ETL.py:48-50

  /** S1: header + inferred-schema CSV scan (ETL.py:20-30). Column names
    * preserved exactly, including case ("VendorID", "RateCodeID"). */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", true).option("inferSchema", true).csv(path)

  /** S2: idempotent full reload with volume cap (ETL.py:33-58). */
  def load(spark: SparkSession, csvPath: String, targetDir: String,
      rowCap: Int = referenceRowCap): Long = {
    readCsv(spark, csvPath)
      .limit(rowCap)
      .write.mode(SaveMode.Overwrite).parquet(targetDir)
    spark.read.parquet(targetDir).count()
  }
}
