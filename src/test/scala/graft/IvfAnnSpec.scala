package graft

import graft.operators.{IvfAnn, Similarity}
import org.apache.spark.sql.functions._

class IvfAnnSpec extends SparkSpecBase {

  test("expression-form assignment equals the join+heap form cell-for-cell") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val centroids = graft.operators.IvfAnn.fixedCentroids(emb, 10)
    val viaExpr = graft.operators.IvfAnn.assign(emb, centroids)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaJoin = graft.operators.IvfAnn.assignJoined(emb, centroids)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr.nonEmpty)
    assert(viaExpr === viaJoin)
  }

  test("IVF search returns k ranked neighbors and achieves useful recall vs brute force") {
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val index = IvfAnn.build(emb, numCells = 8)
    val centroids = IvfAnn.centroidDf(spark, index.model)
    val approx = IvfAnn.search(index.assigned, centroids, col("vec_id") < 16, k = 5, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val exact = Similarity.bruteForceTopK(emb, col("vec_id") < 16, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(approx.map(_._1).distinct.length === 16)
    assert(approx.groupBy(_._1).values.forall(_.length <= 5))
    val recall = approx.toSet.intersect(exact.toSet).size.toDouble / exact.length
    // random 64-d gaussian vectors are a worst case for IVF; with 3 of 8
    // cells probed, expect well above the 3/8 floor of random probing
    assert(recall >= 0.3, s"recall=$recall")
  }

  test("fixed-centroid IVF: assignment is total and search output is well-formed") {
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val centroids = IvfAnn.fixedCentroids(emb, IvfAnn.fixedStride)
    val assigned = IvfAnn.assign(emb, centroids)
    assert(assigned.count() === emb.count()) // every vector lands in exactly one cell
    val out = IvfAnn.search(assigned, centroids, col("vec_id") < 8, k = 3, nProbe = 2)
      .collect()
    assert(out.map(_.getLong(0)).distinct.length === 8)
    assert(out.groupBy(_.getLong(0)).values.forall(g =>
      g.map(_.getInt(1)).sorted.sameElements(1 to g.length)))
  }

  test("index build is deterministic under the fixed seed") {
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val a = IvfAnn.build(emb, 8).assigned.select("vec_id", "cell")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
    val b = IvfAnn.build(emb, 8).assigned.select("vec_id", "cell")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted
    assert(a === b)
  }
}
