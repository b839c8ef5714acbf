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

  test("q209: a near-dup of a contaminated doc is expanded at hop 1") {
    import spark.implicits._
    // bench B shares exactly ONE 3-shingle ("b1 b2 b3") with train T1;
    // T2 is T1 with that region swapped out: jaccard(T1,T2) = 58/64 =
    // 0.906 >= 0.9 but T2 shares NO shingle with B. T3 is unrelated.
    val fill = (1 to 60).map(i => f"w$i%03d").mkString(" ")
    val bench = "b1 b2 b3 " + (1 to 40).map(i => f"v$i%03d").mkString(" ")
    val t1 = "b1 b2 b3 " + fill
    val t2 = "x1 x2 x3 " + fill
    val t3 = (1 to 50).map(i => f"z$i%03d").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("graft_contam").toString
    Seq((1L, bench, "src0"), (10L, t1, "src1"), (20L, t2, "src1"),
      (30L, t3, "src2"))
      .map { case (id, text, src) => (id, text, "en", src, 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = SparkEntry.queries("q209_contamination_expansion")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(10L -> 0, 20L -> 1),
      s"T1 must seed, T2 must expand at hop 1, T3 must survive: $got")
  }
}
