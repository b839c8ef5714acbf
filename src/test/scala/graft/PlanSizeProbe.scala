package graft

/** Dev tool: rank catalog queries by PHYSICAL PLAN STRING LENGTH — the
  * cheap detector for un-checkpointed iterative lineage (the
  * maxPlanStringLength-truncation WARN means some loop's final plan
  * renders to megabytes and Catalyst/event-log stringification pays
  * for it even when execution is fast). Streaming queries are skipped
  * (their fn drains a stream; the batch read-back plan is trivial).
  * Usage: sbt "Test/runMain graft.PlanSizeProbe [minBytes]" */
object PlanSizeProbe {
  def main(args: Array[String]): Unit = {
    val minBytes = args.headOption.map(_.toInt).getOrElse(100000)
    val spark = graft.spark.Sessions.local("plan-size-probe", 8)
    val sizes = SparkEntry.catalog
      .filterNot(_.name.contains("stream"))
      .flatMap { q =>
        try {
          val p = q.fn(spark, TestSpark.sf001)
            .queryExecution.explainString(
              org.apache.spark.sql.execution.SimpleMode)
          Some(q.name -> p.length)
        } catch { case e: Throwable =>
          System.err.println(s"[plansize] ${q.name} failed: ${e.getMessage}")
          None
        }
      }
    sizes.sortBy(-_._2).takeWhile(_._2 >= minBytes).foreach { case (n, s) =>
      println(f"PLANSIZE $s%9d  $n")
    }
    println(s"PLANSIZE_DONE max=${sizes.map(_._2).maxOption.getOrElse(0)}")
    spark.stop()
  }
}
