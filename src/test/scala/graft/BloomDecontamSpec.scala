package graft

import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.BloomSketch

/** q123: the bloom prefilter is a semantic no-op that actually prunes. */
class BloomDecontamSpec extends SparkSpecBase {

  private def shingleStream(benchSide: Boolean) = {
    val src = Tables.documents(spark, sf001).select(col("doc_id"), col("source"))
    val ex = Dedup.indexedShingleSets(spark, sf001).join(src, "doc_id")
    val cond = if (benchSide) col("source") === "src0" else col("source") =!= "src0"
    ex.where(cond)
  }

  test("bloom-pruned result equals the pure exact join (no false negatives)") {
    val bench = shingleStream(benchSide = true)
      .select(explode(col("toks")).as("sh")).distinct()
    val exact = shingleStream(benchSide = false)
      .select(col("doc_id").as("train_doc"), explode(col("toks")).as("sh"))
      .join(bench, "sh")
      .groupBy("train_doc").agg(count(lit(1)).as("n_shared"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = SparkEntry.queries("q123_bloom_decontam")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === exact)
    assert(got.nonEmpty, "fixture plants contamination; result must not be empty")
  }

  test("the prefilter prunes: survivors are a strict subset of the stream") {
    val bench = shingleStream(benchSide = true)
      .select(explode(col("toks")).as("sh")).distinct()
    val bloom = bench
      .agg(BloomSketch.agg(xxhash64(col("sh")),
        operators.BloomDecontam.expectedItems, operators.BloomDecontam.numBits).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val train = shingleStream(benchSide = false)
      .select(explode(col("toks")).as("sh"))
    val total = train.count()
    val survivors = train
      .where(BloomSketch.mightContain(bloom, xxhash64(col("sh")))).count()
    val members = train.join(bench, "sh").count()
    assert(survivors < total, "bloom pruned nothing")
    assert(survivors >= members, "bloom dropped a true member (false negative!)")
    // at 40 bits/item the false-positive overhead should be tiny
    assert(survivors - members <= total / 100,
      s"false-positive rate too high: $survivors survivors vs $members members")
  }
}
