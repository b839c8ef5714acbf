package graft

import graft.operators.{MmrRerank, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** MMR diversity + duplicated-region coalescing invariants. */
class MmrSpanSpec extends SparkSpecBase {

  test("MMR: step 1 is the relevance argmax; selection is more diverse than plain top-k") {
    val emb = Tables.embeddings(spark, sf001)
    val q = emb.where(col("vec_id") === MmrRerank.queryId)
      .select(col("embedding").as("qe"))
    val scored = emb.where(col("vec_id") =!= MmrRerank.queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        Similarity.cosine(col("embedding"), col("qe")).as("rel"),
        col("embedding"))
    val topIds = scored.orderBy(desc("rel"), asc("vec_id"))
      .limit(MmrRerank.k).select("vec_id")
      .collect().map(_.getLong(0)).toSeq

    val sel = SparkEntry.queries("q222_mmr_rerank")(spark, sf001)
      .orderBy("step").collect().map(_.getAs[Long]("vec_id")).toSeq
    assert(sel.head == topIds.head, "MMR step 1 must be the relevance argmax")
    assert(sel.distinct.size == MmrRerank.k)

    def maxPairSim(ids: Seq[Long]): Double = {
      val sub = emb.where(col("vec_id").isin(ids: _*))
      sub.as("a").join(sub.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(Similarity.cosine(col("a.embedding"), col("b.embedding")).as("s"))
        .agg(max("s")).collect()(0).getDouble(0)
    }
    assert(maxPairSim(sel) <= maxPairSim(topIds),
      "diversified selection must not be MORE self-similar than plain top-k")
  }

  test("span coalescing agrees with q117's duplicated-position counts") {
    val q117 = SparkEntry.queries("q117_dup_ngram_spans")(spark, sf001)
      .select("doc_id", "n_dup").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val q223 = SparkEntry.queries("q223_dup_region_coalesce")(spark, sf001)
      .collect()
    assert(q223.nonEmpty)
    q223.foreach { r =>
      val doc = r.getAs[Long]("doc_id")
      val nDup = r.getAs[Long]("n_dup_pos")
      val nIsl = r.getAs[Long]("n_islands")
      val covered = r.getAs[Long]("covered_tokens")
      val ppm = r.getAs[Long]("covered_ppm")
      assert(nDup == q117(doc).toLong, s"doc $doc: q223/q117 position counts differ")
      assert(nIsl >= 1 && nIsl <= nDup)
      // a p-position island spans at least p+4 tokens (strict int positions)
      assert(covered >= nDup + 4 * nIsl)
      assert(ppm <= 1000000L)
    }
    // docs q223 omits have zero duplicated positions in q117
    val present = q223.map(_.getAs[Long]("doc_id")).toSet
    q117.foreach { case (doc, n) =>
      if (!present.contains(doc)) assert(n == 0, s"doc $doc dropped but n_dup=$n")
    }
  }
}
