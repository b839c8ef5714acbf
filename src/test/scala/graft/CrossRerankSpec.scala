package graft

import graft.operators.CrossRerank

class CrossRerankSpec extends SparkSpecBase {

  test("q330: rerank changes the RRF order exactly where lexical and dense disagree") {
    val scored = CrossRerank.scoredPool(spark, sf001).collect()
    assert(scored.nonEmpty && scored.length <= 128)
    case class P(doc: Long, lex: Option[Int], vec: Option[Int],
        rrf: Double, ce: Double)
    val pool = scored.map(r => P(r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getInt(1)),
      if (r.isNullAt(2)) None else Some(r.getInt(2)),
      r.getDouble(3), r.getDouble(4)))
    def rrfBefore(a: P, b: P): Boolean =
      a.rrf > b.rrf || (a.rrf == b.rrf && a.doc < b.doc)
    def ceBefore(a: P, b: P): Boolean =
      a.ce > b.ce || (a.ce == b.ce && a.doc < b.doc)
    val pairs = for {
      a <- pool; b <- pool if a.doc < b.doc
    } yield (a, b)
    // the rerank is not a no-op: some pair flips between the orders
    val flipped = pairs.filter { case (a, b) => rrfBefore(a, b) != ceBefore(a, b) }
    assert(flipped.nonEmpty, "cross-encoder must reorder the pool")
    // and at least one flip happens where the component signals
    // DISAGREE (lexical says one order, dense says the other) — the
    // region a rank-fusion tie-break cannot adjudicate and a pairwise
    // scorer exists to settle
    val disagreedFlip = flipped.exists { case (a, b) =>
      (a.lex, b.lex, a.vec, b.vec) match {
        case (Some(la), Some(lb), Some(va), Some(vb)) =>
          (la.compareTo(lb)) * (va.compareTo(vb)) < 0
        case _ => false
      }
    }
    assert(disagreedFlip,
      "expected a flipped pair with opposing lexical/dense rank signs")
    // every pooled candidate got a score (absent-modality features are
    // zero, never null)
    assert(scored.forall(!_.isNullAt(4)))
    // scores are exact multiples of 0.25 (halves-grid arithmetic) —
    // the property that makes the oracle hash-stable
    assert(pool.forall(p => p.ce * 4 == math.rint(p.ce * 4)))
  }

  test("q330: weights are exact halves and the top-10 carries both rank evidences") {
    (CrossRerank.w1.flatten ++ CrossRerank.b1 ++ CrossRerank.w2).foreach { w =>
      assert(w * 2 == math.rint(w * 2) && math.abs(w) <= 1.5, s"weight $w off grid")
    }
    val top = SparkEntry.queries("q330_cross_encoder_rerank")(spark, sf001)
      .collect()
    assert(top.length == graft.operators.HybridRetrieval.topN)
    assert(top.map(_.getInt(5)).toSeq == (1 to top.length))
    // rerank order is by (ce_score desc, doc_id)
    top.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(4) > b.getDouble(4) ||
        (a.getDouble(4) == b.getDouble(4) && a.getLong(0) < b.getLong(0)))
    }
  }
}
