package graft

import graft.operators.{KmvSketch, PrioritySample}
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Priority sampling + KMV sketch: the estimator guarantees hold on
  * the fixed corpus, and the bounded-heap sketch equals the exact
  * sorted-prefix definition. */
class KmvPrioritySpec extends SparkSpecBase {

  test("priority sample: k rows, HT total-weight estimate near truth") {
    val out = SparkEntry.queries("q217_priority_sample")(spark, sf001)
      .collect()
    assert(out.length == PrioritySample.k)
    val estTotal = out.map(_.getAs[Long]("est_w")).sum.toDouble
    val trueTotal = Tables.documents(spark, sf001)
      .agg(sum("n_chars")).collect()(0).getLong(0).toDouble
    val ratio = estTotal / trueTotal
    // k=20 HT estimate: loose 2x band — the point is it is a total-
    // weight ESTIMATE, not a sum of sampled weights (which would be
    // far smaller)
    assert(ratio > 0.5 && ratio < 2.0, s"est=$estTotal true=$trueTotal")
    // sampled weights alone are nowhere near the corpus total
    val sampledW = out.map(_.getAs[Long]("w")).sum.toDouble
    assert(sampledW < trueTotal * 0.5)
  }

  test("priority sample equals the full-sort top-k definition") {
    val viaOp = SparkEntry.queries("q217_priority_sample")(spark, sf001)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    val grid = PrioritySample.grid
    val full = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("n_chars").cast("long").as("w"))
      .withColumn("u1", conv(substring(md5(
        concat(lit("psamp:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long") + 1)
      .withColumn("priority", expr(s"(w * $grid) div u1"))
      .orderBy(desc("priority"), asc("doc_id"))
      .limit(PrioritySample.k)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(viaOp == full)
  }

  test("per-source sample (q228) equals the per-source window-rank definition") {
    val grid = PrioritySample.grid
    val viaOp = SparkEntry.queries("q228_group_priority_sample")(spark, sf001)
      .select("source", "sample_rank", "doc_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(desc("priority"), asc("doc_id"))
    val viaWindow = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source"), col("n_chars").cast("long").as("w"))
      .withColumn("u1", conv(substring(md5(
        concat(lit("psamp:"), col("doc_id").cast("string"))), 1, 8), 16, 10)
        .cast("long") + 1)
      .withColumn("priority", expr(s"(w * $grid) div u1"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= graft.operators.GroupSample.k)
      .select("source", "rn", "doc_id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaOp == viaWindow,
      "bounded-heap per-source sample must equal the window-rank top-k")
  }

  test("KMV sketch rows are exactly the K smallest hashes per source") {
    val sk = KmvSketch.sketches(spark, sf001)
    val exact = Dedup_sourceHashesForTest()
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy("h")))
      .where(col("rn") <= KmvSketch.K)
      .select("source", "h")
    assert(sk.count() > 0)
    assert(sk.exceptAll(exact).isEmpty && exact.exceptAll(sk).isEmpty)
  }

  private def Dedup_sourceHashesForTest() =
    graft.operators.Dedup.indexedShingleSets(spark, sf001)
      .join(Tables.documents(spark, sf001).select("doc_id", "source"), "doc_id")
      .select(col("source"), explode(col("toks")).as("sh"))
      .select(col("source"),
        conv(substring(md5(col("sh")), 1, 12), 16, 10).cast("long").as("h"))
      .distinct()

  test("KMV union estimates land within 40% of exact distinct unions") {
    val est = SparkEntry.queries("q218_kmv_source_overlap")(spark, sf001)
      .select("src_a", "src_b", "est_union").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val hashes = Dedup_sourceHashesForTest().persist()
    try {
      // |A∪B| = |A| + |B| − |A∩B|; intersections via equi-join on h
      val counts = hashes.groupBy("source").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val inter = hashes.as("a").join(hashes.as("b"),
          col("a.h") === col("b.h") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
      val srcs = counts.keys.toSeq.sorted
      val exact = (for {
        a <- srcs; b <- srcs if a < b
      } yield (a, b) -> (counts(a) + counts(b) - inter.getOrElse((a, b), 0L))).toMap
      assert(est.keySet == exact.keySet)
      est.foreach { case (k, e) =>
        val t = exact(k).toDouble
        assert(math.abs(e - t) / t < 0.4, s"pair $k est=$e exact=$t")
      }
    } finally hashes.unpersist(): Unit
  }
}
