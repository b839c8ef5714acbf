package graft

import graft.operators.ModelQueries

/** The Merkle audit and the row-level diff must corroborate: a bucket
  * is flagged iff it contains a q202 delta row. */
class MerkleDiffSpec extends SparkSpecBase {

  test("q266 flags exactly the buckets containing q202 delta rows") {
    val flagged = ModelQueries.qMerkleDiff.fn(spark, sf001)
      .select("bucket").collect().map(_.getLong(0)).toSet
    val deltaBuckets = ModelQueries.qSnapshotDiff.fn(spark, sf001)
      .select("doc_id").collect().map(r => r.getLong(0) % 256).toSet
    assert(flagged == deltaBuckets,
      s"merkle-only: ${flagged -- deltaBuckets}; diff-only: ${deltaBuckets -- flagged}")
  }

  test("q266 parent nodes prune: every clean level-1 node has 16 clean children") {
    val rows = ModelQueries.qMerkleDiff.fn(spark, sf001).collect()
    val dirtyNodes = rows.map(_.getLong(0)).toSet
    // all 16 level-1 nodes exist; any node NOT dirty implies none of
    // its child buckets appear in the flagged set
    val flaggedBuckets = rows.map(_.getLong(1)).toSet
    (0L until 16L).filterNot(dirtyNodes).foreach { node =>
      val children = (node * 16) until (node * 16 + 16)
      assert(children.forall(b => !flaggedBuckets(b)))
    }
  }
}
