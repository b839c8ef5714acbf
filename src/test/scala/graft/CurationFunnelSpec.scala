package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** q119: funnel-shape invariants (the oracle checks exact values;
  * these assert the semantics that make the report readable). */
class CurationFunnelSpec extends SparkSpecBase {

  private lazy val funnel =
    SparkEntry.queries("q119_curation_funnel")(spark, sf001).cache()

  test("gates only ever narrow: n_total >= n_exact >= n_span >= n_kept") {
    val bad = funnel.where(
      col("n_exact") > col("n_total") || col("n_span") > col("n_exact") ||
        col("n_kept") > col("n_span") || col("n_kept") < 0).count()
    assert(bad === 0L)
  }

  test("funnel partitions the whole corpus by language") {
    val total = funnel.agg(sum("n_total")).first().getLong(0)
    assert(total === Tables.documents(spark, sf001).count())
  }

  test("q124: one example per kept doc, valid splits, modality coverage") {
    val ex = SparkEntry.queries("q124_assemble_examples")(spark, sf001).cache()
    val kept = funnel.agg(sum("n_kept")).first().getLong(0)
    assert(ex.count() === kept)
    assert(ex.select("doc_id").distinct().count() === kept)
    val badSplit = ex.where(!col("split").isin("train", "val", "test")).count()
    assert(badSplit === 0L)
    // embeddings cover vec_id = doc_id 0..499 on this fixture, so the
    // join must land for EVERY example — a NULL emb_dim means the join
    // key broke, not a coverage gap
    assert(ex.where(col("emb_dim").isNull).count() === 0L)
    val dims = ex.select("emb_dim").distinct().collect().map(_.getInt(0)).toSeq
    assert(dims === Seq(64))
  }

  test("q130: planted interleaved duplicates resolve against the corpus index") {
    import spark.implicits._
    // ids ≡ 4 (mod 5) are the batch; everything else the corpus.
    //  - 4  duplicates corpus doc 2 (2 < 4)        → loses to the corpus
    //  - 9  unique                                  → keeps
    //  - 14 == 19 (batch-internal dup, no corpus)   → 14 keeps, 19 drops
    //  - 24 duplicates corpus doc 28 (24 < 28!)     → the BATCH doc is the
    //    appended corpus's min — interleaved ids, not append-only
    val mk = (id: Long, text: String) => (id, text, "en", "s", text.length.toLong)
    val docs = Seq(
      mk(0, "alpha beta gamma delta epsilon zeta"),
      mk(1, "one two three four five six seven"),
      mk(2, "shared corpus text that doc four copies"),
      mk(3, "filler corpus document number three"),
      mk(5, "more corpus filler keeps the model busy"),
      mk(28, "late corpus copy that doc twentyfour beats"),
      mk(4, "shared corpus text that doc four copies"),
      mk(9, "a unique batch document nothing matches"),
      mk(14, "twin batch text appearing twice in the batch"),
      mk(19, "twin batch text appearing twice in the batch"),
      mk(24, "late corpus copy that doc twentyfour beats"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_incr_funnel").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q130_incremental_funnel")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(out.keySet === Set(4L, 9L, 14L, 19L, 24L))
    assert(out(4L) === 0, "batch copy of an earlier corpus doc must drop")
    assert(out(9L) === 1, "unique batch doc must keep")
    assert(out(14L) === 1, "batch-internal first occurrence must keep")
    assert(out(19L) === 0, "batch-internal second occurrence must drop")
    assert(out(24L) === 1,
      "batch doc with a LATER corpus duplicate is the appended min — keeps")
  }

  test("q130 covers exactly the batch slice with 0/1 gate values") {
    // cache for the repeated filters, but UNPERSIST before leaving:
    // the session is JVM-shared and a cached q130 result would replace
    // the whole plan PlanAuditSpec later audits with an InMemoryRelation
    val out = SparkEntry.queries("q130_incremental_funnel")(spark, sf001).cache()
    try {
      val batchN = Tables.documents(spark, sf001)
        .where(pmod(col("doc_id"), lit(5)) === 4).count()
      assert(out.count() === batchN)
      Seq("keep_exact", "keep_span", "keep_fluency").foreach { c =>
        assert(out.where(!col(c).isin(0, 1)).count() === 0L, s"$c not 0/1")
      }
      // span + fluency gates must do real work on the batch too
      assert(out.where(col("keep_fluency") === 0).count() > 0)
      assert(out.where(col("keep_fluency") === 1).count() > 0)
    } finally out.unpersist()
  }

  test("each gate does real work on this corpus") {
    val r = funnel.agg(sum("n_total"), sum("n_exact"), sum("n_span"),
      sum("n_kept")).first()
    val (t, e, sp, k) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // the test corpus has no exact duplicates (q26 keeps all 500), so
    // the exact gate is a no-op here — the dedup semantics themselves
    // are oracle-checked; the analytic gates must bite
    assert(e <= t)
    assert(sp < e, "span gate dropped nothing")
    assert(k < sp, "fluency gate dropped nothing")
    assert(k > 0, "funnel must keep a non-empty corpus")
  }
}
