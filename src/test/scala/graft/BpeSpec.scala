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

  // ---- pure mirror of the BATCHED trainer: same safeBatchLen, pair
  // counting and rewrite done in plain Scala so the prefix-safety
  // argument can be property-tested against refBpe without paying a
  // Spark job per random corpus ----
  private def pureBatched(wf: Map[String, Long], numMerges: Int,
      minFreq: Long, topB: Int): Seq[(Int, String, String, Long)] = {
    var words = wf.toSeq.map { case (w, f) => (w.split("").toVector, f) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    val created = mutable.Set.empty[String]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += f
      val rows = counts.toIndexedSeq
        .sortBy { case ((l, r), n) => (-n, l, r) }
        .take(topB)
        .map { case ((l, r), n) => (l, r, n) }
      if (rows.isEmpty || rows(0)._3 < minFreq) done = true
      else {
        val outside = if (rows.length == topB) rows.last._3 else 0L
        var k = math.min(Bpe.safeBatchLen(rows, outside, created), numMerges - rank)
        val freqCut = rows.indexWhere(_._3 < minFreq)
        if (freqCut >= 0 && freqCut < k) { k = freqCut; done = true }
        val batch = rows.take(k)
        batch.foreach { case (l, r, n) =>
          rank += 1; out += ((rank, l, r, n)); created += (l + r)
        }
        words = words.map { case (syms, f) =>
          (batch.foldLeft(syms) { case (s, (l, r, _)) => refApply(s, l, r) }, f)
        }
      }
    }
    out.result()
  }

  test("batched prefix preserves the reference merge sequence on randomized corpora") {
    // small alphabets force the adversarial cases the safety argument
    // handles: conflicted pairs that keep their counts, risers like
    // (c,ab) outranking later snapshot pairs, self-pairs, dense ties
    val rng = new scala.util.Random(42)
    for (trial <- 1 to 300) {
      val alphaN = 2 + rng.nextInt(3)
      val alpha = "abcd".take(alphaN)
      val words = (1 to (5 + rng.nextInt(40))).map { _ =>
        val len = 2 + rng.nextInt(7)
        (1 to len).map(_ => alpha(rng.nextInt(alphaN))).mkString
      }
      val wf = words.groupBy(identity).map { case (w, ws) =>
        w -> (ws.size.toLong * (1 + rng.nextInt(5)))
      }
      val minFreq = 1L + rng.nextInt(2)
      val want = refBpe(wf, numMerges = 25, minFreq = minFreq)
      for (topB <- Seq(2, 8, 64)) {
        val got = pureBatched(wf, numMerges = 25, minFreq = minFreq, topB = topB)
        assert(got === want,
          s"trial $trial topB=$topB minFreq=$minFreq wf=$wf")
      }
    }
  }

  test("safeBatchLen refuses the riser counterexample (skip-based batching is unsound)") {
    // snapshot of {cab x100, de x90}: applying (a,b) creates riser
    // (c,ab)@100, so neither the conflicted (c,a) nor the disjoint
    // (d,e) may join (a,b)'s batch
    val rows = IndexedSeq(("a", "b", 100L), ("c", "a", 100L), ("d", "e", 90L))
    assert(Bpe.safeBatchLen(rows, 0L) === 1)
    // self-pairs may only end a batch: "aaa" risers through itself
    assert(Bpe.safeBatchLen(IndexedSeq(("a", "a", 200L), ("d", "e", 10L)), 0L) === 1)
    // genuinely disjoint dominant pairs DO batch
    val disjoint = IndexedSeq(("a", "b", 1000L), ("c", "d", 900L), ("e", "f", 800L))
    assert(Bpe.safeBatchLen(disjoint, 0L) === 3)
  }

  test("Spark batched trainer equals the sequential reference at several batch widths") {
    val docs = Tables.documents(spark, sf001)
    val wfDf = Bpe.wordFreq(docs)
    val wf = wfDf.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = refBpe(wf, numMerges = 40, minFreq = 1L)
    for (topB <- Seq(1, 8, 64)) {
      val got = Bpe.learnBatched(wfDf, numMerges = 40, minFreq = 1L, topB = topB)
      assert(got.merges.map(m => (m.rank, m.left, m.right, m.freq)) === want,
        s"topB=$topB")
      if (topB == 1) assert(got.passes >= got.merges.size) // sequential baseline
      else if (got.merges.size > 1) assert(got.passes <= got.merges.size)
    }
  }

  test("in-memory trainer equals the reference on randomized corpora and the real table") {
    // the production learnFromWords path for vocabularies under the
    // driver budget: exactness IS the contract
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 100) {
      val alphaN = 2 + rng.nextInt(3)
      val alpha = "abcd".take(alphaN)
      val words = (1 to (5 + rng.nextInt(40))).map { _ =>
        val len = 2 + rng.nextInt(7)
        (1 to len).map(_ => alpha(rng.nextInt(alphaN))).mkString
      }
      val wf = words.groupBy(identity).map { case (w, ws) =>
        w -> (ws.size.toLong * (1 + rng.nextInt(5)))
      }
      val got = Bpe.learnInMemory(
        wf.toArray.map { case (w, f) => (w.split(""), f) },
        numMerges = 25, minFreq = 1L)
      assert(got.map(m => (m.rank, m.left, m.right, m.freq)) ===
        refBpe(wf, numMerges = 25, minFreq = 1L), s"trial $trial wf=$wf")
    }
    // dispatch: the real corpus vocabulary is under the budget, so
    // learnFromWords must route in-memory and still match the
    // distributed batcher bit-for-bit
    val wfDf = Bpe.wordFreq(Tables.documents(spark, sf001))
    val inMem = Bpe.learnFromWords(wfDf, numMerges = 30, minFreq = 2L)
    val dist = Bpe.learnBatched(wfDf, numMerges = 30, minFreq = 2L).merges
    assert(inMem === dist)
    // forced-distributed dispatch (wordBudget = 0, the ScaleBench
    // beyond-budget configuration) must take the batcher path and
    // still produce the identical sequence
    val forced = Bpe.learnFromWords(wfDf, numMerges = 30, minFreq = 2L,
      wordBudget = 0L)
    assert(forced === inMem)
  }

  test("q121 top pair equals the learner's first merge") {
    val top = SparkEntry.queries("q121_bpe_top_pairs")(spark, sf001)
      .limit(1).collect()(0)
    val first = Bpe.learn(Tables.documents(spark, sf001), numMerges = 1)(0)
    assert(top.getString(0) === first.left + first.right)
    assert(top.getLong(1) === first.freq)
  }
}
