package graft

import graft.operators.MaxSim
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.CharGramVector

class MaxSimSpec extends SparkSpecBase {
  import spark.implicits._

  test("pure-Scala charGramVec mirrors the CharGramVector expression exactly") {
    val samples = MaxSim.queryTerms ++ Seq(
      "a", "ab", "abc", "the quick brown fox",
      "unicode: éèê mixed with ascii",
      "  leading and trailing  ")
    val got = samples.toDF("t")
      .select(CharGramVector(col("t"), MaxSim.dim).as("v"))
      .collect().map(_.getSeq[Long](0).toArray)
    samples.zip(got).foreach { case (s, expr) =>
      assert(MaxSim.charGramVec(s, MaxSim.dim).toSeq === expr.toSeq,
        s"mismatch for '$s'")
    }
  }

  test("maxsim rewards multi-aspect docs over single-aspect ones") {
    // doc 1's chunks each answer a DIFFERENT query term (padded so
    // each term lands in its own 200-cp chunk); doc 2 repeats only
    // the first term. Late interaction must rank doc 1 first — the
    // property a single collapsed doc vector cannot express (doc 2
    // has a PERFECT match for term 0 and still must lose).
    val pad = "x " * 90 // ~180 cp of filler between aspects
    val multi = MaxSim.queryTerms.mkString(pad, pad, pad)
    val single = (MaxSim.queryTerms.head + " " + pad) * 3
    val docs = Seq((1L, multi), (2L, single.trim)).toDF("doc_id", "text")
    val scores = MaxSim.maxsimScores(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(scores(1L) > scores(2L),
      s"multi-aspect doc must outrank the single-aspect one: $scores")
  }
}
