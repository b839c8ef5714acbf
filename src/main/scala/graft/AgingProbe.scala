package graft

/** Dev tool: measures the SESSION-AGE TAX — how a fixed sentinel
  * query's warm wall time grows as the session accumulates query
  * executions (the r13 catalog-interference investigation: mid-pass
  * queries measured 5–25x their isolated time while the cache
  * footprint was 12 MB, so the suspect is per-execution session state,
  * not storage). Runs the sentinel, then interleaves catalog execution
  * with sentinel re-timings every `step` queries. */
object AgingProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(16)
    val step = sys.env.get("SPARK_GRAFT_AGING_STEP").map(_.toInt).getOrElse(40)
    val sentinels = sys.env.getOrElse("SPARK_GRAFT_AGING_SENTINELS",
      "q48_embedding_neardup,q52_approx_distinct,q01_pricing_summary")
      .split(",").toSeq
    val spark = graft.spark.Sessions.local("agingprobe", cpus)
    def timeOf(n: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(n)(spark, d).count()
      catch { case _: Throwable => }
      (System.nanoTime() - t0) / 1e9
    }
    def sentinelReport(age: Int): Unit = sentinels.foreach { s =>
      timeOf(s) // warm (first touch builds indexes; later touches no-op)
      println(f"AGING age=$age%4d $s%-28s ${timeOf(s)}%7.3f s")
    }
    sentinelReport(0)
    SparkEntry.catalog.map(_.name).grouped(step).zipWithIndex.foreach {
      case (grp, gi) =>
        grp.foreach(timeOf)
        sentinelReport((gi + 1) * step)
    }
    spark.stop()
  }
}
