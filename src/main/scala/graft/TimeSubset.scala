package graft
/** Dev tool: warm per-query timing of a SPARK_GRAFT_ONLY subset (same
  * contract as Verify's filter); falls back to the full catalog. */
object TimeSubset {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val spark = graft.spark.Sessions.local("timing", 16)
    SparkEntry.catalog.filter(q => only.forall(_.contains(q.name))).foreach { q =>
      try {
        q.fn(spark, d).count() // warm
        val t0 = System.nanoTime()
        val n = q.fn(spark, d).count()
        println(f"TIMING ${q.name}%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s  $n%9d rows")
      } catch { case e: Throwable =>
        println(s"TIMING ${q.name} FAILED ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
