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
