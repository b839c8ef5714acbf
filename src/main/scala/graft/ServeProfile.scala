package graft

import org.apache.spark.sql.functions._

/** Dev tool: per-invocation anatomy of q328 (headline serve) — which
  * driver-side steps of the query lambda re-pay per call once every
  * session memo is warm. */
object ServeProfile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(16)
    val spark = graft.spark.Sessions.local("serveprofile", cpus)
    def t(tag: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"SPROF $tag%-26s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    // warm every memo through the real query twice
    t("q328_cold")(SparkEntry.queries("q328_planned_batch_serve")(spark, d).count())
    t("q328_warm")(SparkEntry.queries("q328_planned_batch_serve")(spark, d).count())
    import graft.operators.{IvfAnn, IvfPq}
    import graft.sources.Tables
    t("planner_memo")(IvfPq.nProbeForRecall(spark, d, IvfPq.plannedTargetPct))
    val emb = Tables.embeddings(spark, d)
    t("build_lambda_plan") {
      val p = IvfPq.nProbeForRecall(spark, d, IvfPq.plannedTargetPct)
      val centroids = IvfAnn.fixedCentroids(emb, IvfAnn.fixedStride)
      val path = IvfPq.codesSegment(spark, d, "full", IvfAnn.assign(emb, centroids))
      (p, centroids, path)
    }
    // the returned frame, executed twice (the per-pass cost the bench
    // actually times after its own warm pass)
    val df = SparkEntry.queries("q328_planned_batch_serve")(spark, d)
    t("exec_only_1")(df.count())
    t("exec_only_2")(df.count())
    t("q328_warm2")(SparkEntry.queries("q328_planned_batch_serve")(spark, d).count())
    spark.stop()
  }
}
