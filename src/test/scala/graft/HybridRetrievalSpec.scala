package graft

import graft.operators.HybridRetrieval
import org.apache.spark.sql.functions._

/** RRF fusion invariants that the oracle hash can't articulate on its
  * own: pool membership, contribution arithmetic, and the plan shape
  * (no global sort anywhere in the candidate generation). */
class HybridRetrievalSpec extends SparkSpecBase {

  private lazy val out =
    SparkEntry.queries("q134_hybrid_rrf")(spark, sf001).collect()

  test("returns topN fused rows, no duplicates, excluding the query doc") {
    assert(out.length === HybridRetrieval.topN)
    val ids = out.map(_.getLong(0))
    assert(ids.distinct.length === ids.length)
    assert(!ids.contains(0L), "query-by-example doc must not retrieve itself")
  }

  test("rrf column equals the contribution formula from the rank columns") {
    out.foreach { r =>
      val lex = Option(r.get(1)).map(_.asInstanceOf[Int])
      val vec = Option(r.get(2)).map(_.asInstanceOf[Int])
      val expected = lex.map(k => 1.0 / (HybridRetrieval.rrfK + k)).getOrElse(0.0) +
        vec.map(k => 1.0 / (HybridRetrieval.rrfK + k)).getOrElse(0.0)
      assert(r.getDouble(3) === expected, s"row $r")
      assert(lex.isDefined || vec.isDefined, "a fused row must be in some pool")
      lex.foreach(k => assert(k >= 1 && k <= HybridRetrieval.poolK))
      vec.foreach(k => assert(k >= 1 && k <= HybridRetrieval.poolK))
    }
  }

  test("fused order is rrf desc with doc_id tiebreak") {
    val keys = out.map(r => (-r.getDouble(3), r.getLong(0))).toSeq
    assert(keys === keys.sorted)
  }

  test("candidate generation never global-sorts: no Sort below the final " +
      "TakeOrderedAndProject") {
    val plan = SparkEntry.queries("q134_hybrid_rrf")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    // acceptable sorts: TakeOrderedAndProject's own, and the LOCAL
    // (global=false) ≤poolK-row sorts feeding the fusion SortMergeJoin
    // (full-outer cannot broadcast). A GLOBAL Sort node would mean a
    // retriever sorted its whole corpus — the thing the bounded-heap
    // pools exist to avoid.
    assert(!plan.split("\n").exists(l =>
        l.contains("Sort [") && l.contains("], true,")),
      s"unexpected global Sort:\n$plan")
    // both retrievers reduce through the bounded-heap partial aggregate
    assert("partial_topkbyscore".r.findAllIn(plan).length === 2, plan.take(2000))
  }

  test("q211: metrics on a planted label geometry are hand-checkable") {
    import spark.implicits._
    // anchor 0 (label 0): neighbors by cosine are 1 (0.9, label 1),
    // 2 (0.8, label 0), 3 (0.6, label 1) -> n_rel=1, first_rel_rank=2,
    // mrr_ppm=500000, p@k=100
    def v(parts: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0f)
      parts.foreach { case (i, x) => a(i) = x }
      a
    }
    val rows = Seq(
      (0L, v(0 -> 1f), 0),
      (1L, v(0 -> 0.9f, 1 -> 0.43589f), 1),
      (2L, v(0 -> 0.8f, 1 -> 0.6f), 0),
      (3L, v(0 -> 0.6f, 1 -> 0.8f), 1))
    val tmp = java.nio.file.Files.createTempDirectory("graft_irm").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = SparkEntry.queries("q211_retrieval_metrics")(spark, tmp).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(0) === 0L && r.getInt(1) === 0)
    assert(r.getAs[Long]("n_rel_at_k") === 1L)
    assert(r.getAs[Long]("p_at_k_permille") === 100L)
    assert(r.getAs[Long]("first_rel_rank") === 2L)
    assert(r.getAs[Long]("mrr_ppm") === 500000L)
  }

  test("q211 plan: scored relation reduces through the bounded heap, no window") {
    val plan = SparkEntry.queries("q211_retrieval_metrics")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("topkbyscore"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
  }
}
