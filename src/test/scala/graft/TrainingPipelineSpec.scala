package graft

class TrainingPipelineSpec extends SparkSpecBase {

  test("q109 stratified mix keeps per-language fractions near the gate weights") {
    val docs = graft.sources.Tables.documents(spark, sf001)
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = SparkEntry.queries("q109_stratified_mix")(spark, sf001)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val weights = Map("en" -> 0.9, "es" -> 0.5, "de" -> 0.5, "fr" -> 0.25, "zh" -> 0.125)
    weights.foreach { case (lang, w) =>
      val n = totals.getOrElse(lang, 0L)
      if (n >= 8) {
        val frac = kept.getOrElse(lang, 0L).toDouble / n
        // 16-bit hash gate; small-sample tolerance via a binomial bound
        val tol = 4 * math.sqrt(w * (1 - w) / n)
        assert(math.abs(frac - w) <= tol, s"$lang kept=$frac want=$w±$tol (n=$n)")
      }
    }
  }

  test("q109 sampling is join-stable: same doc_id always samples identically") {
    val once = SparkEntry.queries("q109_stratified_mix")(spark, sf001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val again = SparkEntry.queries("q109_stratified_mix")(spark, sf001)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(once == again && once.nonEmpty)
  }

  test("q110 split is a partition: every doc in exactly one split, ratios sane") {
    val rows = SparkEntry.queries("q110_train_split")(spark, sf001).collect()
    val total = graft.sources.Tables.documents(spark, sf001).count()
    assert(rows.length == total)
    val bySplit = rows.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.getOrElse("train", 0) > bySplit.getOrElse("val", 0))
    assert(bySplit.getOrElse("val", 0) >= bySplit.getOrElse("test", 0) / 2,
      s"split sizes: $bySplit")
  }

  test("q111 packing: offsets are contiguous per shard stream and spans are exact") {
    val rows = SparkEntry.queries("q111_pack_sequences")(spark, sf001).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(0), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    rows.groupBy(t => (t._1, t._2)).foreach { case ((lang, shard), docs) =>
      val ordered = docs.sortBy(_._3)
      // stream property: each doc starts where the previous one ended
      ordered.foldLeft(0L) { case (expectedStart, (_, _, id, nTok, start, first, last, nSeqs)) =>
        assert(start == expectedStart, s"$lang/$shard doc $id start=$start want=$expectedStart")
        assert(first == start / 2048 && last == (start + nTok - 1) / 2048,
          s"$lang/$shard doc $id span wrong")
        assert(nSeqs == last - first + 1 && nSeqs >= 1)
        start + nTok
      }
    }
  }

  test("q112 corpus card: rollup levels are consistent (sources sum to language)") {
    val rows = SparkEntry.queries("q112_corpus_card")(spark, sf001).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val langTotals = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val leafSums = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(langTotals == leafSums, s"lang=$langTotals leaves=$leafSums")
    assert(grand.head.getLong(2) == langTotals.values.sum)
  }
}
