package graft

import org.apache.spark.sql.functions._

/** q136/q137 invariants beyond the oracle hash. */
class SessionWindowAndBudgetSpec extends SparkSpecBase {

  test("q136: native session windows equal the batch lag-gap rebuild " +
      "computed in-engine") {
    val streaming = SparkEntry.queries("q136_stream_session_window")(spark, sf001)
      .collect().map(_.toSeq)
    // batch rebuild with the same >= gap boundary
    val ev = graft.sources.Tables.events(spark, sf001)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts")
    val batch = ev.select(col("user_id"), col("ts"))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        (col("prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev")) >= 1800000000L)
          .cast("long"))
      .withColumn("sid", sum(col("new_s")).over(
        w.rowsBetween(Long.MinValue, 0)))
      .groupBy("user_id", "sid")
      .agg(min("ts").as("session_start"),
        (max(col("ts")) + expr("INTERVAL 30 MINUTE")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "session_end", "n_events")
      .orderBy("user_id", "session_start")
      .collect().map(_.toSeq)
    assert(streaming.nonEmpty)
    assert(streaming.toSeq === batch.toSeq)
  }

  test("q137: kept token mix tracks the per-mille targets under the budget") {
    val rows = SparkEntry.queries("q137_token_budget_mix")(spark, sf001).collect()
    assert(rows.nonEmpty)
    val keptTotal = rows.map(_.getLong(3)).sum
    val corpusTotal = rows.map(_.getLong(4)).sum
    // the budget is half the corpus: kept mass must sit near it (hash
    // gates are statistically, not exactly, the target rate) and
    // NEVER above the sum of per-language caps
    assert(keptTotal > (corpusTotal / 2 * 8) / 10, s"kept=$keptTotal of $corpusTotal")
    rows.foreach { r =>
      val (lang, permille, keptTok, totTok) =
        (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4))
      assert(keptTok <= totTok)
      // a language can never exceed its own corpus supply; when the
      // cap binds (rate >= 1), kept == total
      val budget = corpusTotal / 2
      val targetTok = budget * permille / 1000
      if (totTok <= targetTok)
        assert(keptTok === totTok, s"$lang under-sampled below its cap")
      else
        // sampled languages land near their target (hash-gate noise)
        assert(math.abs(keptTok - targetTok) < math.max(2000L, targetTok / 3),
          s"$lang kept=$keptTok target=$targetTok")
    }
  }

  test("q137: rerunning yields the identical kept set (hash-gate " +
      "determinism, not sampling)") {
    val a = SparkEntry.queries("q137_token_budget_mix")(spark, sf001)
      .collect().map(_.toSeq)
    val b = SparkEntry.queries("q137_token_budget_mix")(spark, sf001)
      .collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }
}
