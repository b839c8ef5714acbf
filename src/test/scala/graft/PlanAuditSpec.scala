package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan quality gates: the properties that make these queries
  * scale are asserted, not assumed — a refactor that silently drops a
  * pushdown, a broadcast, or a top-k specialization fails here. */
class PlanAuditSpec extends SparkSpecBase {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf001)
      .queryExecution.explainString(FormattedMode)

  test("q01: filter and projection are pushed to the parquet scan") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"))
    assert(p.contains("ReadSchema") && !p.contains("l_orderkey"),
      "scan must prune to the referenced columns only")
  }

  test("q03/q04: dimension joins broadcast, never shuffle the dims") {
    Seq("q03_top_customers", "q04_regional_revenue").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q should broadcast dims")
      assert(!p.contains("SortMergeJoin"), s"$q should not sort-merge")
    }
  }

  test("q11: ordered limit plans TakeOrderedAndProject, not a global sort") {
    val p = plan("q11_topk_orders")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q07: window dedup gets WindowGroupLimit map-side pruning") {
    val p = plan("q07_window_dedup")
    assert(p.contains("WindowGroupLimit"))
  }

  test("q30: top-k via partial-aggregatable TopKByScore (partial + final)") {
    val p = plan("q30_sim_topk")
    assert(p.contains("topkbyscore"))
    assert(p.contains("partial_topkbyscore") || p.contains("Partial"),
      "aggregate must have a map-side partial phase")
  }

  test("no oracle-paired query uses a cartesian or nested-loop join") {
    // the two forms that blow up at scale; every join in the catalog
    // should be hash/broadcast/sort-merge after candidate pruning.
    // Deliberate exceptions — each broadcast-nested-loops a BOUNDED
    // small side against the corpus:
    //  - q30: brute-force ANN scoring is O(queries × corpus) by
    //    definition (tiny query set broadcast); scale path is q32/q50.
    //  - q55: IVF quantizer assignment/routing is O(corpus × cells)
    //    with cells ~ sqrt(corpus) broadcast — the standard IVF cost.
    //  - q63: a single-row corpus-count literal cross-joined in.
    //  - q75: calendar × event-type grid — both sides are bounded
    //    aggregates (days in span, distinct types).
    //  - q89: a single-row max-day literal cross-joined in.
    //  - q93: the int8 prefilter scores queries × corpus BY DESIGN —
    //    that's the cheap approximate tier (4x less I/O than float);
    //    only the 20 survivors per query reach exact rescoring.
    //  - q113: BM25 needs the corpus-wide (N, avgdl) pair on every
    //    scored row — a single aggregated row cross-joined in, the
    //    same bounded shape as q63/q89.
    //  - q115/q119/q124: the LM vocabulary size is the same single-
    //    aggregated-row cross join (smoothing denominator on every
    //    scored doc).
    val intentionallyExhaustive =
      Set("q30_sim_topk", "q55_ivf_fixed_topk", "q63_tfidf_topterms",
        "q75_gap_fill", "q89_sliding_mau", "q93_int8_prefilter_topk",
        "q113_bm25_score", "q115_lm_fluency", "q119_curation_funnel",
        "q124_assemble_examples")
    SparkEntry.catalog.filter(_.oracle.nonEmpty)
      .filterNot(q => intentionallyExhaustive(q.name)).foreach { q =>
        val p = SparkEntry.queries(q.name)(spark, sf001)
          .queryExecution.explainString(FormattedMode)
        assert(!p.contains("CartesianProduct"), s"${q.name} plans a cartesian product")
        assert(!p.contains("BroadcastNestedLoopJoin"), s"${q.name} plans a nested-loop join")
      }
  }
}
