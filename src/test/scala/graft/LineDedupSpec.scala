package graft

import org.apache.spark.sql.functions._

/** q126: removal decisions and byte-exact reconstruction. */
class LineDedupSpec extends SparkSpecBase {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("planted duplicates: first occurrence survives, rewrite is exact") {
    import spark.implicits._
    val b1 = "a b c d e f g h i j" // block 1 (10 tokens)
    val b2 = "k l m n o p q r s t" // block 2
    val b3 = "u v w x y z aa bb cc dd" // unique to doc 3
    val docs = Seq(
      (1L, s"$b1 $b2", "en", "s", 0L), // keeps both blocks
      (2L, s"$b1 $b2", "en", "s", 0L), // exact dup doc: loses both
      (3L, s"$b1 $b3", "en", "s", 0L)) // loses b1, keeps b3
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_linededup").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q126_line_dedup")(spark, tmp)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq ===
      Seq((1L, 2, 0), (2L, 2, 2), (3L, 2, 1)))
    assert(out(0).getString(3) === md5hex(s"$b1 $b2"))
    assert(out(1).getString(3) === md5hex("")) // fully deduplicated away
    assert(out(2).getString(3) === md5hex(b3)) // only the unique block
  }

  // pure mirror of q128's segmentation rule, for building expected
  // values in the planted tests
  private def isAnchor(tok: String): Boolean =
    "012".contains(md5hex(tok).head)

  private def segments(toks: Seq[String]): Seq[Seq[String]] = {
    val out = scala.collection.mutable.ArrayBuffer
      .empty[scala.collection.mutable.ArrayBuffer[String]]
    toks.foreach { t =>
      // seg_id(p) = count of anchors at positions <= p: an anchor
      // always starts a new segment; a leading non-anchor run is seg 0
      if (out.isEmpty || isAnchor(t))
        out += scala.collection.mutable.ArrayBuffer.empty[String]
      out.last += t
    }
    out.map(_.toSeq).toSeq
  }

  test("q128: straddling misaligned duplicate that q126 misses is removed") {
    import spark.implicits._
    // word pool with known anchor status under md5 (first hex in 0-2)
    val pool = (1 to 200).map(i => s"w$i")
    val anchors = pool.filter(isAnchor)
    val plains = pool.filterNot(isAnchor)
    assert(anchors.size >= 6 && plains.size >= 40)
    // span X: ~16 tokens with 3 interior anchors — its interior
    // segments are content-defined, so both copies segment identically
    val x = Seq(plains(0), plains(1), anchors(0), plains(2), plains(3),
      plains(4), anchors(1), plains(5), plains(6), plains(7),
      anchors(2), plains(8), plains(9), plains(10), plains(11), plains(12))
    // doc A: X at offset 0; doc B: X at offset 7 (misaligned vs any
    // 10-token block grid AND vs a 5-stride grid), novel text around
    val fillB = Seq(plains(20), plains(21), plains(22), plains(23),
      plains(24), plains(25), plains(26))
    val tailB = Seq(plains(30), plains(31))
    val docA = x.mkString(" ")
    val docB = (fillB ++ x ++ tailB).mkString(" ")
    val docs = Seq(
      (1L, docA, "en", "s", 0L),
      (2L, docB, "en", "s", 0L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_anchored").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    // q126 (fixed 10-token blocks) provably misses the straddler:
    // no 10-aligned block of doc B equals any block of doc A
    val q126 = SparkEntry.queries("q126_line_dedup")(spark, tmp)
      .orderBy("doc_id").collect()
    assert(q126.map(_.getInt(2)).toSeq === Seq(0, 0),
      "fixed-block dedup should miss the misaligned straddling span")

    // q128 removes the duplicated interior segments of B's copy
    val q128 = SparkEntry.queries("q128_anchored_substring_dedup")(spark, tmp)
      .orderBy("doc_id").collect()
    assert(q128(0).getInt(2) === 0, "first occurrence (doc A) keeps everything")
    assert(q128(0).getString(3) === md5hex(docA))
    // expected removal: segments of B that also occur in A, in
    // first-occurrence order — computed with the pure segmentation mirror
    val segsA = segments(docA.split(" ").toSeq).map(_.mkString(" "))
    val segsB = segments(docB.split(" ").toSeq).map(_.mkString(" "))
    val dupB = segsB.filter(segsA.contains)
    assert(dupB.nonEmpty, "fixture must contain duplicated interior segments")
    val keptB = segsB.filterNot(segsA.contains)
    assert(q128(1).getInt(2) === dupB.map(_.split(" ").length).sum)
    assert(q128(1).getString(3) === md5hex(keptB.flatMap(_.split(" ")).mkString(" ")))
  }

  test("q132: intra-doc repeats removed; cross-doc copies untouched") {
    import spark.implicits._
    val b1 = "a b c d e f g h i j" // 10 tokens = one aligned block
    val b2 = "k l m n o p q r s t"
    val b3 = "u v w x y z aa bb cc dd"
    val docs = Seq(
      (1L, s"$b1 $b2 $b1 $b3", "en", "s", 0L), // interior repeat of b1
      (2L, s"$b1 $b2 $b1 $b3", "en", "s", 0L), // exact copy of doc 1
      (3L, s"$b3 $b3 $b3", "en", "s", 0L), // chorus: 3x the same block
      (4L, "", "en", "s", 0L)) // empty text = one empty block, kept
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_intradoc").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val out = SparkEntry.queries("q132_intradoc_dedup")(spark, tmp)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq ===
      Seq((1L, 4, 1), (2L, 4, 1), (3L, 3, 2), (4L, 1, 0)))
    // rewrites are byte-exact; the cross-doc copy keeps ITS OWN first
    // occurrence (both docs emerge identical), unlike q126 which strips
    // doc 2 entirely as a corpus-wide duplicate
    assert(out(0).getString(3) === md5hex(s"$b1 $b2 $b3"))
    assert(out(1).getString(3) === out(0).getString(3))
    assert(out(2).getString(3) === md5hex(b3))
    assert(out(3).getString(3) === md5hex(""))
    val q126 = SparkEntry.queries("q126_line_dedup")(spark, tmp)
      .orderBy("doc_id").collect()
    assert(q126(1).getInt(2) === 4, "q126 removes the whole cross-doc copy")
  }

  test("q132: misaligned repeat (off the block grid) is kept, by design") {
    import spark.implicits._
    val b1 = "a b c d e f g h i j"
    // b1 reappears shifted 5 tokens: no ALIGNED block equals another,
    // so the fixed-grid pass keeps everything — the documented contract
    // (q128's content-defined segmentation is the catch for these)
    val doc = s"$b1 pad1 pad2 pad3 pad4 pad5 $b1"
    val docs = Seq((1L, doc, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_intradoc2").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = SparkEntry.queries("q132_intradoc_dedup")(spark, tmp).first()
    assert(r.getInt(2) === 0)
    assert(r.getString(3) === md5hex(doc))
  }

  test("q132 plan: no exchange besides the presentation sort") {
    val plan = SparkEntry.queries("q132_intradoc_dedup")(spark, sf001)
      .queryExecution.executedPlan.toString
    // one narrow projection over the scan: no joins, no aggregates,
    // no window — the only exchange is the final orderBy's range sort
    assert(!plan.contains("Join"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
    assert(!plan.toLowerCase.contains("aggregate"), plan.take(2000))
    assert("Exchange".r.findAllIn(plan).size === 1, plan.take(2000))
  }

  test("q141: full spans removed at min match length — the shapes q128 provably keeps") {
    import spark.implicits._
    val pool = (1 to 200).map(i => s"w$i")
    val anchors = pool.filter(isAnchor)
    val plains = pool.filterNot(isAnchor)
    // shape 1: an exactly-L-token span with NO anchors — it sits inside
    // one anchor-free stretch, so q128's segmentation can never isolate
    // it (the containing segments differ via their differing context)
    val spanP = plains.slice(40, 50) // 10 = minMatchTokens
    assert(spanP.forall(!isAnchor(_)) && spanP.size === 10)
    // shape 2: the straddler span with interior anchors — q128 removes
    // only the interior segments and keeps the copy's EDGE tokens
    val x = Seq(plains(0), plains(1), anchors(0), plains(2), plains(3),
      plains(4), anchors(1), plains(5), plains(6), plains(7),
      anchors(2), plains(8), plains(9), plains(10), plains(11), plains(12))
    val fillA = Seq("fa1", "fa2", "fa3")
    val tailA = Seq("ta1", "ta2")
    val fillB = Seq("fb1", "fb2", "fb3", "fb4", "fb5", "fb6")
    val tailB = Seq("tb1", "tb2", "tb3")
    val fillC = Seq("fc1", "fc2", "fc3", "fc4", "fc5", "fc6", "fc7")
    val tailC = Seq("tc1", "tc2")
    val docs = Seq(
      (1L, (fillA ++ spanP ++ tailA).mkString(" "), "en", "s", 0L),
      (2L, (fillB ++ spanP ++ tailB).mkString(" "), "en", "s", 0L),
      (3L, x.mkString(" "), "en", "s", 0L),
      (4L, (fillC ++ x ++ tailC).mkString(" "), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_exactsub").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    // q128 keeps shape 1 entirely, and keeps shape 2's edges
    val q128 = SparkEntry.queries("q128_anchored_substring_dedup")(spark, tmp)
      .orderBy("doc_id").collect()
    assert(q128(0).getInt(2) === 0 && q128(1).getInt(2) === 0,
      "anchor-free span must survive q128 in both copies")
    assert(q128(3).getInt(2) > 0 && q128(3).getInt(2) < x.size,
      "q128 removes shape 2's interior segments but keeps edge tokens")

    // q141 removes every duplicated span >= L in FULL, all occurrences
    val q141 = SparkEntry.queries("q141_exact_substring_dedup")(spark, tmp)
      .orderBy("doc_id").collect()
    assert(q141.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq ===
      Seq((1L, 15, 10), (2L, 19, 10), (3L, 16, 16), (4L, 25, 16)))
    assert(q141(0).getString(3) === md5hex((fillA ++ tailA).mkString(" ")))
    assert(q141(1).getString(3) === md5hex((fillB ++ tailB).mkString(" ")))
    assert(q141(2).getString(3) === md5hex("")) // the whole doc was the span
    assert(q141(3).getString(3) === md5hex((fillC ++ tailC).mkString(" ")))
  }

  test("q141: sub-threshold duplicates and short docs survive untouched") {
    import spark.implicits._
    // a 9-token duplicate (< L) must NOT fire; a doc shorter than L has
    // no windows at all
    val nine = (1 to 9).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"u1 u2 $nine", "en", "s", 0L),
      (2L, s"$nine v1 v2", "en", "s", 0L),
      (3L, "tiny doc", "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_exactsub2").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q141_exact_substring_dedup")(spark, tmp)
      .orderBy("doc_id").collect()
    assert(out.map(_.getInt(2)).toSeq === Seq(0, 0, 0))
    assert(out(0).getString(3) === md5hex(s"u1 u2 $nine"))
    assert(out(2).getString(3) === md5hex("tiny doc"))
  }

  test("corpus invariants: counts conserved; near-dup docs lose blocks") {
    val r = SparkEntry.queries("q126_line_dedup")(spark, sf001).cache()
    assert(r.where(col("n_removed") > col("n_blocks") || col("n_blocks") <= 0)
      .count() === 0L)
    assert(r.count() ===
      graft.sources.Tables.documents(spark, sf001).count())
    // the fixture plants near-duplicate documents whose aligned blocks
    // collide — corpus-wide line dedup must fire on them
    assert(r.agg(sum("n_removed")).first().getLong(0) > 0L)
  }
}
