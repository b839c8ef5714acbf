package graft
/** Dev tool: warm per-query timing of the full catalog at a given SF. */
object CatalogTiming {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.spark.Sessions.local("timing", 16)
    SparkEntry.catalog.foreach { q =>
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
