package graft

import graft.operators.{Apss, Dedup}
import org.apache.spark.sql.functions._

/** Prefix filtering is LOSSLESS: the filtered pair set equals the
  * brute-force all-pairs join at the same threshold. */
class ApssSpec extends SparkSpecBase {

  test("prefix-filtered pairs == brute-force pairs at tau = 0.6") {
    val toks = Dedup.indexedShingleSets(spark, sf001)
    // brute force: every doc pair sharing >= 1 shingle, exact gate
    val ex = toks.select(col("doc_id"), explode(col("toks")).as("sh"))
    val cand = ex.as("a").join(ex.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val brute = Dedup.withJaccardToks(cand, toks)
      .where(expr(s"${Apss.tauDen} * n_inter >= ${Apss.tauNum} * n_union"))
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val filtered = Apss.exactPairs(spark, sf001)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(brute.nonEmpty, "testdata should contain near-dup pairs")
    assert(filtered == brute,
      s"missed=${(brute -- filtered).take(5)} extra=${(filtered -- brute).take(5)}")
  }

  test("prefix length arithmetic: (3m+4) div 5 == ceil(3m/5) for m = 1..200") {
    (1 to 200).foreach { m =>
      assert((3 * m + 4) / 5 == math.ceil(3.0 * m / 5).toInt, s"m=$m")
    }
  }

  test("q322: batch-vs-corpus exact pairs == brute-force cross pairs at tau = 0.6") {
    import graft.operators.{Apss, Dedup}
    val toks = Dedup.indexedShingleSets(spark, sf001)
    val exB = toks.where(pmod(col("doc_id"), lit(5)) === 4)
      .select(col("doc_id").as("doc_a"), explode(col("toks")).as("sh"))
    val exC = toks.where(pmod(col("doc_id"), lit(5)) =!= 4)
      .select(col("doc_id").as("doc_b"), explode(col("toks")).as("sh"))
    val cand = exB.join(exC, "sh").select("doc_a", "doc_b").distinct()
    val brute = Dedup.withJaccardToks(cand, toks)
      .where(expr(s"${Apss.tauDen} * n_inter >= ${Apss.tauNum} * n_union"))
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val filtered = SparkEntry.queries("q322_apss_batch_vs_corpus")(spark, sf001)
      .select("doc_batch", "doc_corpus")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.nonEmpty, "testdata should contain cross near-dup pairs")
    assert(filtered == brute,
      s"missed=${(brute -- filtered).take(5)} extra=${(filtered -- brute).take(5)}")
  }
}
