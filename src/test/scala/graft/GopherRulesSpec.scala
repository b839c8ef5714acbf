package graft

/** q197/q198 rule-bundle semantics on planted corpora + the plan
  * shapes that make them scale; q199 hard-negative selection. */
class GopherRulesSpec extends SparkSpecBase {

  // --- planted documents with known rule outcomes ---

  // passes all 5 rules: 40 tokens (4 stopword hits), mean word length
  // (4+1+2+3 + 36*5)/40 = 4.725 in [4,5], max word len 5, all distinct
  private val passAll =
    "the a of and " + (1 to 36).map(i => f"w$i%03dx").mkString(" ")
  // fails ONLY the stopword floor (2 hits < 3): still kept (n_failed=1)
  private val oneFail =
    "the a " + (1 to 38).map(i => f"v$i%03dx").mkString(" ")
  // fails all 5: 10 tokens of one 12-char word, no stopwords
  private val failAll = Seq.fill(10)("aaaaaaaaaaaa").mkString(" ")

  private def docsDf(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.map { case (id, text, src) => (id, text, "en", src, 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def stage(rows: Seq[(Long, String, String)]): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_gopher").toString
    docsDf(rows).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("q197: per-rule flags, failed count, and keep decision") {
    val tmp = stage(Seq((1L, passAll, "s"), (2L, oneFail, "s"), (3L, failAll, "s")))
    val out = SparkEntry.queries("q197_gopher_rules")(spark, tmp)
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
          r.getBoolean(6), r.getInt(7), r.getBoolean(8))).toMap
    assert(out(1L) === ((true, true, true, true, true, 0, true)))
    assert(out(2L) === ((true, true, false, true, true, 1, true)),
      "a single marginal rule miss must not discard the document")
    assert(out(3L) === ((false, false, false, false, false, 5, false)))
  }

  test("q197 plan: one narrow projection — no join/window/aggregate, " +
    "only the presentation-sort exchange") {
    val plan = SparkEntry.queries("q197_gopher_rules")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
    assert(!plan.toLowerCase.contains("aggregate"), plan.take(2000))
    assert("Exchange".r.findAllIn(plan).size === 1, plan.take(2000))
  }

  test("q198: a failing domain is dropped wholesale, even its passing docs") {
    // bad source: 1 passing doc among 6 (5/6 > 4/5 fail rate)
    // good source: 1 all-fail among 5 (1/5 <= 4/5) — 4 docs kept
    val tmp = stage(
      Seq((10L, passAll, "bad")) ++
        (11L to 15L).map(i => (i, failAll, "bad")) ++
        Seq((20L, passAll, "good"), (21L, oneFail, "good"),
          (22L, passAll, "good"), (23L, passAll, "good"),
          (24L, failAll, "good")))
    val out = SparkEntry.queries("q198_domain_gate")(spark, tmp).collect()
    assert(out.map(_.getLong(0)).sorted.toSeq === Seq(20L, 21L, 22L, 23L),
      "doc 10 passes the bundle but its domain must gate it out")
    assert(out.forall(r => r.getString(1) == "good"
      && r.getLong(2) == 5L && r.getLong(3) == 1L))
  }

  test("q198 plan: domain verdict broadcast back — the doc side never shuffles") {
    val plan = SparkEntry.queries("q198_domain_gate")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }

  // --- q199 hard negatives ---

  test("q199: nearest different-label vector wins; own label excluded") {
    import spark.implicits._
    def v(xs: (Int, Float)*): Array[Float] = {
      val a = new Array[Float](64)
      xs.foreach { case (i, x) => a(i) = x }
      a
    }
    // anchor 0 (label 0) along e0; same-label near-parallel id 1 must
    // be excluded; id 2 (label 1, cos .8) beats id 3 (label 2, cos .6)
    val rows = Seq(
      (0L, v(0 -> 1f), 0),
      (1L, v(0 -> 0.99f, 1 -> 0.14f), 0),
      (2L, v(0 -> 0.8f, 1 -> 0.6f), 1),
      (3L, v(0 -> 0.6f, 1 -> 0.8f), 2))
    val tmp = java.nio.file.Files.createTempDirectory("graft_hardneg").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val out = SparkEntry.queries("q199_hard_negatives")(spark, tmp).collect()
    assert(out.length === 1)
    assert(out(0).getLong(0) === 0L && out(0).getLong(2) === 2L
      && out(0).getInt(3) === 1)
    assert(math.abs(out(0).getDouble(4) - 0.8) < 1e-6)
  }

  test("q206: confusion cells partition the corpus and tie out to q197/q129") {
    val rows = SparkEntry.queries("q206_gate_agreement")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Seq(n, b, ro, mo, ne) = Seq("n_docs", "n_both", "n_rule_only",
        "n_model_only", "n_neither").map(r.getAs[Long])
      assert(b + ro + mo + ne === n, s"cells must partition: $r")
      val agree = r.getAs[Long]("agree_permille")
      assert(agree === (b + ne) * 1000 / n, s"integer agreement rate: $r")
    }
    // marginals tie out to the two source gates run standalone
    val ruleKeep = SparkEntry.queries("q197_gopher_rules")(spark, sf001)
      .where(org.apache.spark.sql.functions.col("keep_doc")).count()
    assert(rows.map(r => r.getAs[Long]("n_both") + r.getAs[Long]("n_rule_only")).sum === ruleKeep)
    val modelKeep = SparkEntry.queries("q129_quality_gate_score")(spark, sf001)
      .where(org.apache.spark.sql.functions.col("keep") === 1).count()
    assert(rows.map(r => r.getAs[Long]("n_both") + r.getAs[Long]("n_model_only")).sum === modelKeep)
  }

  test("q206 plan: both decisions in one scan — no self-join of scored relations") {
    val plan = SparkEntry.queries("q206_gate_agreement")(spark, sf001)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("Join"), plan.take(2000))
    // FormattedMode prints each node in tree + detail section: one
    // scan node appears as exactly one "(n) Scan parquet" detail line
    assert(plan.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*""")) === 1,
      plan.take(2000))
  }

  test("q199 plan: anchors broadcast, argmax via map-side-partial " +
    "ObjectHashAggregate — no window over the scored relation") {
    val plan = SparkEntry.queries("q199_hard_negatives")(spark, sf001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert(plan.contains("topkbyscore"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "the label-exclusion join must broadcast the anchors:\n" + plan.take(2000))
  }
}
