package graft.streaming

import graft.GraftQuery
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface (north-star; the reference has no
  * streaming — SURVEY §2.12). The `events` table doubles as a file
  * stream source: readStream → windowed aggregation → memory sink,
  * driven synchronously for verification via processAllAvailable().
  *
  * Scale design: the same plan deployed against a real source (Kafka,
  * incoming parquet drops) runs unchanged; watermarking bounds state,
  * and the hourly-window aggregation state is O(#windows × #types),
  * independent of input volume. Complete mode is used here so a single
  * batch emits every window (append mode would hold windows open until
  * the watermark passes them — right for production, wrong for a
  * one-shot verification read).
  */
object Streams {

  /** The file's ts column is nanos-as-long under the legacy read
    * (see Tables.events); converted to µs TimestampType first thing. */
  val eventsFileSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Hourly tumbling-window counts per event type, executed as a real
    * streaming query over the events parquet and returned as a batch
    * DataFrame once all available input is processed. */
  def hourlyCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val name = "graft_stream_hourly"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The file stream source wants a DIRECTORY of arriving files (its
    // production shape); stage the single testdata file into one via
    // symlink without touching the read-only testdata tree.
    val streamDir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), "graft_stream", sfDir.replaceAll("[^A-Za-z0-9]", "_"))
    java.nio.file.Files.createDirectories(streamDir)
    val link = streamDir.resolve("events.parquet")
    if (!java.nio.file.Files.exists(link))
      java.nio.file.Files.createSymbolicLink(
        link, java.nio.file.Paths.get(sfDir, "events.parquet"))
    val stream = spark.readStream.schema(eventsFileSchema)
      .parquet(streamDir.toString)
      .withColumn("ts", graft.sources.Tables.nanosToTimestamp(col("ts")))
    val agg = stream
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("sum_value"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
      .select(col("win.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("hour_start", "event_type")
  }

  /** The streaming query, oracle-checked against the equivalent batch
    * SQL — tumbling windows over event time are deterministic, so the
    * streaming result must equal the batch group-by. */
  val qStreamHourly: GraftQuery = GraftQuery(
    "q35_stream_hourly",
    """SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour_start, event_type""".stripMargin) { (s, d) =>
    hourlyCounts(s, d)
  }

  def all: Seq[GraftQuery] = Seq(qStreamHourly)
}
