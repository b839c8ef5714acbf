package graft

import graft.operators.{IvfAnn, SemDedup, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** q116 semantic dedup: gate-margin and drop-rule properties. */
class SemDedupSpec extends SparkSpecBase {

  private lazy val result =
    SparkEntry.queries("q116_semantic_dedup")(spark, sf001).cache()

  test("per-cell accounting is conserved and covers the corpus") {
    val bad = result.where(
      col("n_kept") + col("n_dropped") =!= col("n_vecs") ||
        col("n_dropped") < 0 || col("n_vecs") <= 0).count()
    assert(bad === 0L)
    val total = result.agg(sum("n_vecs")).first().getLong(0)
    assert(total === Tables.embeddings(spark, sf001).count())
  }

  test("the dedup gate has real margin: no within-cell cosine near τ") {
    // the drop SET is fp-stable only if no score sits near the 0.4
    // threshold — same discipline as the q48/q103 near-dup gates.
    // Measured: min |cos − τ| ≥ 5.6e-4 at sf0.001/0.01/0.1, ~12
    // orders of magnitude above double ulp at 0.4.
    val emb = Tables.embeddings(spark, sf001)
    val assigned = IvfAnn.assign(emb,
      IvfAnn.fixedCentroids(emb, IvfAnn.fixedStride))
    val a = assigned.select(col("vec_id").as("va"), col("embedding").as("ea"),
      col("cell"))
    val b = assigned.select(col("vec_id").as("vb"), col("embedding").as("eb"),
      col("cell").as("cell_b"))
    val minGap = a.join(b, col("cell") === col("cell_b") && col("va") < col("vb"))
      .select(abs(Similarity.cosine(col("ea"), col("eb")) - SemDedup.minCos)
        .as("gap"))
      .agg(min("gap")).first().getDouble(0)
    assert(minGap > 1e-5, s"cosine gap to τ collapsed: $minGap")
  }

  test("greedy-by-id: each cell keeps its lowest id; something drops") {
    // the minimum vec_id of a cell can never have a lower-id neighbor,
    // so n_kept >= 1 in every cell
    assert(result.where(col("n_kept") < 1).count() === 0L)
    // τ=0.4 was placed to make the operator non-trivial on this corpus
    val dropped = result.agg(sum("n_dropped")).first().getLong(0)
    assert(dropped > 0L, "gate dropped nothing — threshold has drifted")
  }
}
