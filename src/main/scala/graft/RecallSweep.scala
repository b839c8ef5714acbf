package graft

import graft.operators.{IvfAnn, Similarity}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Recall/cost sweep for the approximate ANN tiers — the tuning
  * surface that turns "read the scale artifact and guess" into a
  * measured operating point. Synthesizes the same ≥100k-vector corpus
  * as ScaleBench, computes exact top-3 for a spread query set, then
  * walks the configuration grid:
  *
  *   - single-table LSH at Hamming radius 0/1/2
  *   - multi-table LSH (L ∈ {2,4,6,8}) at Hamming radius 1
  *   - IVF with nProbe ∈ {2,4,8,16,32}
  *
  * printing recall@3, mean candidates per query (the cost that scales
  * to 100 TB — candidate volume, not this box's wall time), and wall
  * seconds. Run:
  *   sbt "runMain graft.RecallSweep [sfDir] [targetVecs]"
  */
object RecallSweep {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val targetVecs = if (args.length > 1) args(1).toInt else 100000
    val spark = graft.spark.Sessions.local("graft-recallsweep",
      graft.spark.Sessions.defaultCores)

    val vecs = ScaleBench.synthVecs(spark, sfDir, targetVecs).persist()
    val nVecs = vecs.count()
    // queries spread across DISTINCT base vectors (vec_id = base*factor
    // + rep): taking every (nVecs/64)th id samples 64 different bases,
    // unlike vec_id<16 which is 16 noisy replicas of base 0
    val qStride = math.max(1L, nVecs / 64)
    val queryFilter = pmod(col("vec_id"), lit(qStride)) === 0

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toSet

    val (exact, tExact) = time(pairSet(
      Similarity.bruteForceTopK(vecs, queryFilter, 3)))
    val nQueries = exact.map(_._1).size
    println(f"corpus=$nVecs queries=$nQueries exact_sec=$tExact%.2f")
    println(f"${"config"}%-28s ${"recall@3"}%9s ${"cands/q"}%10s ${"sec"}%7s")

    def report(name: String, candsPerQ: Double, sec: Double, approx: Set[(Long, Long)]): Unit = {
      val recall = if (exact.nonEmpty) exact.intersect(approx).size.toDouble / exact.size else -1
      println(f"$name%-28s $recall%9.3f $candsPerQ%10.0f $sec%7.2f")
    }

    // ---- LSH single + multi table (counting the SAME candidate join
    // the top-k ranks, via the shared helper) ----
    def lshRun(numTables: Int, radius: Int): Unit = {
      val (nCands, _) = time(
        Similarity.multiTableCandidates(vecs, queryFilter, numTables, radius).count())
      val (top, sec) = time(pairSet(
        Similarity.multiTableTopK(vecs, queryFilter, 3, numTables, radius)))
      report(s"lsh L=$numTables hamming<=$radius", nCands.toDouble / nQueries, sec, top)
    }
    lshRun(1, 0); lshRun(1, 1); lshRun(1, 2)
    Seq(2, 4, 6, 8).foreach(lshRun(_, 1))

    // ---- IVF nProbe sweep ----
    val stride = math.max(1L, nVecs / 256).toInt
    val centroids = IvfAnn.fixedCentroids(vecs, stride)
    val assigned = IvfAnn.assign(vecs, centroids).persist()
    assigned.count()
    val cellSizes = assigned.groupBy("cell").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(2, 4, 8, 16, 32).foreach { nProbe =>
      val (top, sec) = time(
        IvfAnn.search(assigned, centroids, queryFilter, k = 3, nProbe = nProbe)
          .select(col("query_id"), col("neighbor_id"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet)
      // cost = probed cell mass per query ≈ nProbe × mean cell size
      val candsPerQ = nProbe * cellSizes.values.sum.toDouble / cellSizes.size
      report(s"ivf nProbe=$nProbe/${cellSizes.size}", candsPerQ, sec, top)
    }

    assigned.unpersist(); vecs.unpersist()
    spark.stop()
  }
}
