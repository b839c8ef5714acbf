package graft

/** Dev tool: print the join/exchange/window skeleton of catalog query
  * plans — the quick "did this plan a broadcast or a shuffle" check
  * without the full PLANS.md dump. Usage:
  *   sbt "Test/runMain graft.PlanProbe q115_lm_fluency q117_dup_ngram_spans"
  * With no args it probes the round-5 analytic queries. */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.spark.Sessions.local("plan-probe", 8)
    val names = if (args.nonEmpty) args.toSeq
    else Seq("q115_lm_fluency", "q116_semantic_dedup", "q117_dup_ngram_spans",
      "q119_curation_funnel", "q121_bpe_top_pairs", "q122_chunk_documents")
    names.foreach { n =>
      val p = SparkEntry.queries(n)(spark, TestSpark.sf001)
        .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
      val joins = p.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Exchange") || l.contains("Window"))
        .map(_.trim.take(120)).toSeq
      println(s"=== $n\n" + joins.mkString("\n"))
    }
    spark.stop()
  }
}
