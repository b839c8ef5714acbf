package graft

import graft.operators.PageRank

class PageRankSpec extends SparkSpecBase {

  private lazy val rows = PageRank.qPageRank.fn(spark, sf001).collect()

  test("q248: every rank is at least the teleport floor") {
    val floorR = PageRank.initR * 15 / 100
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(2) >= floorR))
  }

  test("q248: total mass is conserved up to integer-floor loss") {
    // each round loses < 1 unit per (edge share + damping div) — at
    // micro-unit scale the relative loss is negligible but one-sided
    val n = rows.length
    val total = rows.map(_.getLong(2)).sum
    assert(total <= n * PageRank.initR)
    assert(total >= (n * PageRank.initR * 999) / 1000,
      "integer floors must not bleed more than 0.1% of the mass")
  }

  test("q248: bit-identical across runs (integer arithmetic, no fp drift)") {
    val again = PageRank.qPageRank.fn(spark, sf001).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(2))).toSeq)
  }
}
