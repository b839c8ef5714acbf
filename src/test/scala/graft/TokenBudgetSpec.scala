package graft

import org.apache.spark.sql.functions._

/** q137 invariants beyond the oracle hash: cap/target behavior of the
  * budget-derived rates and hash-gate rerun determinism. */
class TokenBudgetSpec extends SparkSpecBase {

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

  test("q138 capstone: the manifest's totals reconcile with q119's " +
      "funnel survivors and the q110 split rule") {
    val manifest = SparkEntry.queries("q138_curation_manifest")(spark, sf001)
      .collect()
    assert(manifest.nonEmpty)
    // per-language doc totals in the manifest can never exceed the
    // funnel's survivor counts (mixture only removes)
    val funnelKept = SparkEntry.queries("q119_curation_funnel")(spark, sf001)
      .collect().map(r => r.getString(0) -> r.getInt(4).toLong).toMap
    manifest.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      val docs = rows.map(_.getLong(2)).sum
      assert(docs <= funnelKept.getOrElse(lang, 0L),
        s"$lang manifest=$docs > funnel survivors=${funnelKept.get(lang)}")
    }
    // seq_budget is the contiguous-packing lower bound of sum_tokens
    manifest.foreach { r =>
      val (tok, seq) = (r.getLong(3), r.getLong(4))
      assert(seq === (tok + 2047) / 2048, s"row $r")
    }
    // split values are exactly the q110 domain
    assert(manifest.map(_.getString(1)).toSet.subsetOf(Set("train", "val", "test")))
  }

  test("q174: sqrt-temperature weights flatten the natural distribution") {
    val rows = SparkEntry.queries("q174_temperature_mix")(spark, sf001).collect()
    assert(rows.length >= 3)
    rows.foreach { r =>
      // the quantized weight recomputes from the language's own total
      val expected = math.floor(math.sqrt(r.getLong(4).toDouble) * (1 << 20)).toLong
      assert(r.getLong(1) === expected, s"${r.getString(0)} weight off-grid")
      assert(r.getLong(3) <= r.getLong(4))
    }
    // flattening: effective keep RATE decreases as language size grows
    // (w_l/T_l ∝ T_l^(-1/2) — bigger languages are sampled harder)
    val bySize = rows.sortBy(_.getLong(4))
      .map(r => (r.getLong(4), r.getLong(3).toDouble / r.getLong(4)))
    assert(bySize.head._2 > bySize.last._2,
      s"smallest language must keep a higher fraction: $bySize")
    // total kept mass tracks the half-corpus budget
    val keptTotal = rows.map(_.getLong(3)).sum
    val corpusTotal = rows.map(_.getLong(4)).sum
    assert(math.abs(keptTotal - corpusTotal / 2) < corpusTotal / 5,
      s"kept=$keptTotal vs budget=${corpusTotal / 2}")
  }
}
