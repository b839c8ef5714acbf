package graft

import graft.sources.Tables
import graft.streaming.Streams
import org.apache.spark.sql.functions._

class StreamsSpec extends SparkSpecBase {

  test("streaming hourly aggregation equals the batch equivalent") {
    val streamed = Streams.hourlyCounts(spark, sf001)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    val batch = Tables.events(spark, sf001)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("hour_start", "event_type")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
    assert(streamed.length === batch.length)
    assert(streamed.toSeq === batch.toSeq)
  }
}
