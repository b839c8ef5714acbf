package graft

import graft.operators.Bpe
import graft.sources.Tables
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** q120/q121: the distributed BPE learner against an independent
  * single-node reference implementation. */
class BpeSpec extends SparkSpecBase {

  // ---- reference implementation (plain Scala, no Spark) ----

  private def refApply(syms: Vector[String], l: String, r: String): Vector[String] =
    syms.foldLeft(Vector.empty[String]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == l && x == r) acc.init :+ (l + r)
      else acc :+ x
    }

  private def refBpe(wf: Map[String, Long], numMerges: Int,
      minFreq: Long): Seq[(Int, String, String, Long)] = {
    var words = wf.toSeq.map { case (w, f) => (w.split("").toVector, f) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += f
      if (counts.isEmpty) done = true
      else {
        val ((l, r), n) = counts.minBy { case ((l, r), n) => (-n, l, r) }
        if (n < minFreq) done = true
        else {
          rank += 1
          out += ((rank, l, r, n))
          words = words.map { case (syms, f) => (refApply(syms, l, r), f) }
        }
      }
    }
    out.result()
  }

  test("learned merges match the single-node reference exactly") {
    val docs = Tables.documents(spark, sf001)
    val got = Bpe.learn(docs, numMerges = 12)
      .map(m => (m.rank, m.left, m.right, m.freq))
    val wf = Bpe.wordFreq(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = refBpe(wf, numMerges = 12, minFreq = 2L)
    assert(got === want)
    assert(got.nonEmpty, "corpus should support at least one merge")
  }

  test("greedy left-to-right application: 'aaa' + (a,a) -> [aa, a]") {
    import spark.implicits._
    val docs = Seq((1L, "aaa aaa", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val merges = Bpe.learn(docs, numMerges = 1, minFreq = 1L)
    // pairs of "aaa" (freq 2): (a,a) counted at two positions -> n = 4
    assert(merges === Seq(Bpe.Merge(1, "a", "a", 4L)))
    // second generation: applying (a,a) must leave [aa, a], so the
    // next top pair is (aa, a)
    val two = Bpe.learn(docs, numMerges = 2, minFreq = 1L)
    assert(two(1) === Bpe.Merge(2, "aa", "a", 2L))
  }

  test("q121 top pair equals the learner's first merge") {
    val top = SparkEntry.queries("q121_bpe_top_pairs")(spark, sf001)
      .limit(1).collect()(0)
    val first = Bpe.learn(Tables.documents(spark, sf001), numMerges = 1)(0)
    assert(top.getString(0) === first.left + first.right)
    assert(top.getLong(1) === first.freq)
  }
}
