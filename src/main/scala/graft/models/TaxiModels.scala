package graft.models

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.graftshim.PgFloat8Text
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Reference-parity transformation models: the dbt `raw_texi` /
  * `core_texi` pipeline re-expressed Spark-first.
  *
  * Reference: /root/reference/dbt_project_old/dbt_postgres/models/
  *   raw_texi.sql:5-6 (SELECT * staging),
  *   core_texi.sql:8-101 (typed projection → md5 surrogate key →
  *   window dedup → derived columns → bound filters).
  *
  * Scale notes (100 TB): the only exchange in this pipeline is the
  * window's hashpartitioning(unique_id). Because the key is an md5 of
  * 9 columns it is effectively uniform — no salting needed. At scale,
  * prefer [[dedupNewestAggForm]] (partial-aggregatable max_by) over the
  * window form: it map-side combines, so the shuffle carries one row
  * per key per partition instead of every row.
  */
object TaxiModels {

  /** Staging model: SELECT * passthrough (raw_texi.sql:5-6, operator P1). */
  def rawTexi(source: DataFrame): DataFrame = source.select(col("*"))

  /** The 9 key columns joined '-'-separated, Postgres-concat NULL
    * semantics (NULL renders as '' but separators are kept —
    * core_texi.sql:10-30, operator E2). `concat_ws` would *skip*
    * separators of null args, so build with `concat` over
    * coalesce(render-to-string, ''). */
  def surrogateKeyInput(cols: Seq[Column]): Column =
    concat(cols.flatMap(c =>
      Seq(coalesce(c.cast("string"), lit("")), lit("-"))).dropRight(1): _*)

  def uniqueId(cols: Seq[Column]): Column = md5(surrogateKeyInput(cols))

  /** One key column rendered as Postgres would render it in `||`
    * concatenation: float8 through [[PgFloat8Text]] (`15.0`→`15`, PG
    * notation thresholds), everything else via Spark's string cast
    * (already PG-identical for int/bigint/date and for timestamps at
    * the whole-second/fractional-trimmed form both engines print).
    * float4 key columns don't exist in any covered pipeline; they'd
    * need a float-precision shortest renderer, not a double widen. */
  def pgText(c: Column, dt: DataType): Column = dt match {
    case DoubleType => PgFloat8Text(c)
    case _          => c.cast("string")
  }

  /** Schema-aware surrogate-key input: same concat/NULL contract as the
    * Column-only overload, but each column is rendered PG-canonically
    * per its actual type — the E2 parity form (the reference's key
    * includes three float8 columns, core_texi.sql:11-30). */
  def surrogateKeyInput(df: DataFrame, names: Seq[String]): Column =
    concat(names.flatMap { n =>
      Seq(coalesce(pgText(col(n), df.schema(n).dataType), lit("")), lit("-"))
    }.dropRight(1): _*)

  def uniqueId(df: DataFrame, names: Seq[String]): Column =
    md5(surrogateKeyInput(df, names))

  /** Core model (core_texi.sql:8-101): full reference semantics.
    * `ingestionDate` injectable for deterministic tests (E4 is
    * `current_date`, nondeterministic by design — SURVEY §5.2). */
  def coreTexi(raw: DataFrame, ingestionDate: Column = current_date()): DataFrame = {
    val keyNames = Seq("VendorID", "tpep_pickup_datetime", "tpep_dropoff_datetime",
      "passenger_count", "RateCodeID", "payment_type", "dropoff_longitude",
      "dropoff_latitude", "fare_amount")
    // typed projection + rename (core_texi.sql:31-51, operators P2/E3)
    val transformed = raw
      .where(col("tpep_pickup_datetime").isNotNull &&
             col("tpep_dropoff_datetime").isNotNull) // F1, core_texi.sql:53-55
      .select(
        uniqueId(raw, keyNames).as("unique_id"),              // E1/E2, :10-31
        ingestionDate.cast("date").as("ingestion_date"),      // E4, :32
        col("VendorID").cast("int").as("vendor_id"),
        col("tpep_pickup_datetime").cast("timestamp").as("pickup_datetime"),
        col("tpep_dropoff_datetime").cast("timestamp").as("dropoff_datetime"),
        col("passenger_count").cast("int").as("passenger_count"),
        col("trip_distance").cast("double").as("trip_distance"),
        col("pickup_longitude").cast("double").as("pickup_longitude"),
        col("pickup_latitude").cast("double").as("pickup_latitude"),
        col("RateCodeID").cast("int").as("rate_code_id"),
        col("store_and_fwd_flag"),
        col("dropoff_longitude").cast("double").as("dropoff_longitude"),
        col("dropoff_latitude").cast("double").as("dropoff_latitude"),
        col("payment_type").cast("int").as("payment_type"),
        col("fare_amount").cast("double").as("fare_amount"),
        col("extra").cast("double").as("extra"),
        col("mta_tax").cast("double").as("mta_tax"),
        col("tip_amount").cast("double").as("tip_amount"),
        col("tolls_amount").cast("double").as("tolls_amount"),
        col("improvement_surcharge").cast("double").as("improvement_surcharge"),
        col("total_amount").cast("double").as("total_amount"))

    // keep-newest-per-key dedup (W1 + F2, core_texi.sql:57-62,99)
    val w = Window.partitionBy(col("unique_id")).orderBy(col("ingestion_date").desc)
    val deduped = transformed
      .withColumn("row_number", row_number().over(w))
      .where(col("row_number") === 1)
      .drop("row_number")

    // derived columns + bound filters (core_texi.sql:86-101).
    // epochSeconds: EXTRACT(EPOCH FROM dropoff - pickup) — no interval
    // type needed, long-cast difference (SURVEY §1.2).
    val epochSeconds =
      col("dropoff_datetime").cast("long") - col("pickup_datetime").cast("long")
    val durationMin = epochSeconds.cast("double") / 60.0
    // The `<= 300` filter deliberately RECOMPUTES the unguarded speed
    // expression (core_texi.sql:101 vs :88-92, operator F3): rows with
    // trip_distance = 0 pass (0 <= 300) and land with NULL speed.
    val speedUnguarded = col("trip_distance") / (epochSeconds.cast("double") / 3600.0)
    val speedGuarded = when(col("trip_distance") > 0 && epochSeconds > 0,
      speedUnguarded).otherwise(lit(null))                    // E7, :88-92

    deduped
      .withColumn("trip_duration_minutes", durationMin)        // E5/E6, :86
      .withColumn("avg_speed_mph", speedGuarded)
      .withColumn("is_long_trip",
        when(col("trip_distance") > 10, true).otherwise(false)) // E8, :93-97
      .where(epochSeconds > 0 && speedUnguarded <= 300.0)       // F2/F3, :100-101
  }

  /** Scale-path dedup equivalent: keep-newest via max_by over a struct
    * — partial-aggregatable (map-side combine), unlike the window form
    * which must shuffle every row then sort within partitions. Same
    * keep-one-per-key contract; tie-break on tied order keys is
    * nondeterministic in BOTH forms (core_texi.sql:32 makes all rows
    * tie on ingestion_date within a run — SURVEY §2.6).
    *
    * The ordering key is wrapped in a never-null struct
    * (isNotNull, orderCol): bare max_by IGNORES rows whose ordering
    * value is NULL, so a key whose order column is NULL in every row
    * would emit one all-NULL row instead of keeping a real one (the
    * window form orders NULLs last but always keeps a row). With the
    * wrapper, non-null order values still win over null ones. */
  def dedupNewestAggForm(df: DataFrame, key: String, orderCol: String): DataFrame = {
    val payload = struct(df.columns.toIndexedSeq.map(col): _*)
    val ordKey = struct(col(orderCol).isNotNull.as("_has"), col(orderCol).as("_v"))
    df.groupBy(col(key).as("__k"))
      .agg(max_by(payload, ordKey).as("__row"))
      .select(col("__row.*"))
  }

  /** The ML training pull (S6, /root/reference/Data-Insights/train.py:26-33):
    * 7-column projection, 3 positive-bound predicates, LIMIT. Catalyst
    * pushes projection+filters to the scan; limit is a LocalLimit —
    * no global sort, matching the reference's nondeterministic subset. */
  def mlTrainingPull(core: DataFrame, limitN: Int = 100000): DataFrame =
    core.select("trip_distance", "passenger_count", "trip_duration_minutes",
        "avg_speed_mph", "rate_code_id", "payment_type", "fare_amount")
      .where(col("fare_amount") > 0 && col("trip_distance") > 0 &&
             col("trip_duration_minutes") > 0)
      .limit(limitN)
}
