package graft

import graft.operators.Dedup
import graft.functions.TextFunctions
import graft.models.TaxiModels
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  /** Deterministic property driver (no scalatestplus bridge offline):
    * evaluate `gen` across fixed seeds. */
  private def forAllSeeded[A](gen: Gen[A], n: Int = 20)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(check)
    }

  test("identical shingle sequences collide in LSH bands; unrelated docs don't") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "alpha beta gamma delta epsilon"), // exact sequence dup
      (2L, "zeta eta theta iota kappa"),
      (3L, "epsilon delta gamma beta alpha")) // same WORDS, different order
      .toDF("doc_id", "text")
    val pairs = Dedup.candidatePairs(docs).collect()
    // shingle-based: word-reorder (doc 3) is NOT a near-dup
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((0L, 1L)))
  }

  test("shingles: 3-gram sequences, short docs collapse to one shingle") {
    val got = Seq(("a b c d", "x y")).toDF("t", "short")
      .select(Dedup.shingles(col("t")), Dedup.shingles(col("short"))).first()
    assert(got.getSeq[String](0) === Seq("a b c", "b c d"))
    assert(got.getSeq[String](1) === Seq("x y"))
  }

  test("jaccard verification over shingle sets") {
    val docs = Seq(
      (0L, "a b c d e"),       // shingles: abc,bcd,cde
      (1L, "a b c d e"),       // identical → 1.0
      (2L, "a b c x y"))       // shingles: abc,bcx,cxy → inter 1, union 5
      .toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (0L, 2L)).toDF("doc_a", "doc_b")
    val j = Dedup.withJaccard(pairs, docs).orderBy("doc_b").collect()
    assert(j(0).getAs[Double]("jaccard") === 1.0)
    assert(j(1).getAs[Double]("jaccard") === 0.2)
  }

  test("simhash: near-identical token sets have small hamming distance, disjoint large") {
    val df = Seq(
      (0L, Seq("spark", "join", "merge", "stream", "batch", "row", "col", "scan")),
      (1L, Seq("spark", "join", "merge", "stream", "batch", "row", "col", "sort")),
      (2L, Seq("zebra", "yak", "xerus", "wombat", "vole", "uakari", "tapir", "sloth")))
      .toDF("doc_id", "toks")
      .select(col("doc_id"), Dedup.simhash64(col("toks")).as("h"))
    val h = df.orderBy("doc_id").collect().map(_.getLong(1))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(0), h(1)) < ham(h(0), h(2)))
    assert(ham(h(0), h(1)) <= 16)
  }

  test("simhash_md5 native expression matches the composed built-ins form exactly") {
    val df = Seq(
      (0L, Seq("spark", "join", "merge", "stream", "batch", "row", "col", "scan")),
      (1L, Seq("alpha")),
      (2L, Seq("a", "b", "a", "")), // dup + empty tokens
      (3L, Seq[String]()))          // empty set → all votes -1 → 0
      .toDF("doc_id", "toks")
    val got = df.select(
      col("doc_id"),
      org.apache.spark.sql.graftshim.SimHashMd5(col("toks")).as("native"),
      Dedup.simhash64Composed(col("toks")).as("composed"))
      .orderBy("doc_id").collect()
    got.foreach(r => assert(r.getLong(1) === r.getLong(2), s"doc ${r.getLong(0)}"))
    assert(got(3).getLong(1) === 0L)
  }

  test("simhash_md5: single token equals its own 60-bit md5 value") {
    // one token → every set bit of hash60 wins its vote 1:0
    val tok = "hello"
    val expected = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).take(8)
        .map(b => f"${b & 0xff}%02x").mkString.take(15), 16)
    val got = Seq(Seq(tok)).toDF("toks")
      .select(org.apache.spark.sql.graftshim.SimHashMd5(col("toks"))).first().getLong(0)
    assert(got === expected)
  }

  test("connected components: chains collapse to min label, disjoint clusters stay apart") {
    // chain 1-2-3-4 (via consecutive pairs) + separate pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(pairs)
    val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    labels.unpersist()
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("property: components equal brute-force union-find on random graphs") {
    val rnd = new scala.util.Random(11)
    (0 until 5).foreach { _ =>
      val edges = (0 until 12).map(_ => (rnd.nextInt(16).toLong, rnd.nextInt(16).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val parent = scala.collection.mutable.Map((0L to 15L).map(n => n -> n): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // canonical label = min node id in the component
      val expected = nodes.map { n =>
        val root = find(n)
        n -> nodes.filter(m => find(m) == root).min
      }.toMap
      val labels = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
      val got = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      labels.unpersist()
      assert(got === expected)
    }
  }

  test("agg-form dedup keeps a REAL row when the order column is all-NULL for a key") {
    val df = Seq(("k", null: java.lang.Long, "a"), ("k", null: java.lang.Long, "b"),
      ("m", 5L: java.lang.Long, "c"), ("m", null: java.lang.Long, "d"))
      .toDF("unique_id", "ord", "payload")
    val out = TaxiModels.dedupNewestAggForm(df, "unique_id", "ord")
      .collect().map(r => r.getString(0) -> Option(r.getString(2))).toMap
    assert(out("k").isDefined, "all-NULL order key must still keep a real row")
    assert(out("m") === Some("c")) // non-null order value wins over null
  }

  test("property: agg-form dedup always yields unique keys and preserves key set") {
    forAllSeeded(Gen.nonEmptyListOf(Gen.chooseNum(0, 9)), n = 10) { ks =>
      val df = ks.zipWithIndex.map { case (k, i) => (k.toString, i.toLong) }
        .toDF("unique_id", "ord")
      val out = TaxiModels.dedupNewestAggForm(df, "unique_id", "ord")
      val outKeys = out.select("unique_id").as[String].collect().toSeq
      assert(outKeys.distinct.size === outKeys.size)
      assert(outKeys.toSet === ks.map(_.toString).toSet)
    }
  }

  test("property: md5 surrogate key is deterministic, 32-hex, null-stable") {
    forAllSeeded(Gen.zip(Gen.option(Gen.alphaNumStr), Gen.option(Gen.alphaNumStr)), n = 10) {
      case (a, b) =>
        val df = Seq((a.orNull, b.orNull)).toDF("x", "y")
        val cols = Seq(col("x"), col("y"))
        val k1 = df.select(TaxiModels.uniqueId(cols)).first().getString(0)
        val k2 = df.select(TaxiModels.uniqueId(cols)).first().getString(0)
        assert(k1 === k2)
        assert(k1.length === 32)
        assert(k1.forall(c => c.isDigit || ('a' to 'f').contains(c)))
    }
  }
}
