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

  test("q125: engine encoder matches the reference per document") {
    val docs = Tables.documents(spark, sf001)
    val merges = Bpe.learn(docs, numMerges = 12).map(m => (m.left, m.right))
    def encRef(w: String): Long =
      merges.foldLeft(w.split("").toVector) { case (syms, (l, r)) =>
        refApply(syms, l, r)
      }.length.toLong
    val expected = docs.select(col("doc_id"), lower(col("text")).as("t"))
      .collect()
      .map { r =>
        val ws = r.getString(1).split(" ", -1)
        // empty word -> 0 symbols, single char -> 1, else encode
        val toks = ws.map(w =>
          if (w.length >= 2) encRef(w) else math.min(w.length, 1).toLong).sum
        r.getLong(0) -> (ws.length, toks)
      }.toMap
    val got = SparkEntry.queries("q125_bpe_encode")(spark, sf001)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2)))
      .toMap
    assert(got === expected)
    // BPE never increases token count below the character tokenization
    val monotone = SparkEntry.queries("q125_bpe_encode")(spark, sf001)
      .where(col("n_bpe_tokens") > col("n_chars_in_words")).count()
    assert(monotone === 0L)
  }

  test("q125: empty words (space runs) count zero tokens, not one") {
    import spark.implicits._
    val docs = Seq((1L, "a  bb", "en", "s", 5L)) // double space -> empty word
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpe_empty").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = SparkEntry.queries("q125_bpe_encode")(spark, tmp).collect()(0)
    // words: ["a", "", "bb"]; no merges learnable (all pair freqs < 2)
    assert((r.getInt(1), r.getLong(2), r.getLong(3)) === ((3, 3L, 3L)))
  }

  test("q121 top pair equals the learner's first merge") {
    val top = SparkEntry.queries("q121_bpe_top_pairs")(spark, sf001)
      .limit(1).collect()(0)
    val first = Bpe.learn(Tables.documents(spark, sf001), numMerges = 1)(0)
    assert(top.getString(0) === first.left + first.right)
    assert(top.getLong(1) === first.freq)
  }
}
