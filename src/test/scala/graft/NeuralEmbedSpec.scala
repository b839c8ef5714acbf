package graft

import graft.operators.{IvfAnn, NeuralEmbed, QualityGate, Similarity}
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** q142–q144: the fixed-weight neural encoder — fit provenance,
  * exactness, and the downstream gate margin. */
class NeuralEmbedSpec extends SparkSpecBase {

  test("fit provenance: refit + quantize reproduces the exported constants") {
    // the q129 discipline: the shipped layer-1 weights must be exactly
    // quantize(fit(sf0.01)) — a seeded, reproducible training run, not
    // hand-tuned numbers
    val (w1, b1) = NeuralEmbed.fit(spark, "/root/testdata/sf0.01")
    assert(w1.size === NeuralEmbed.hidden && b1.size === NeuralEmbed.hidden)
    for (k <- 0 until NeuralEmbed.hidden) {
      assert(w1(k).map(QualityGate.quantize) === NeuralEmbed.w1(k),
        s"hidden unit $k weights diverge from the exported constants")
    }
    assert(b1.map(QualityGate.quantize) === NeuralEmbed.b1)
  }

  test("every exported weight sits on the exactness grid") {
    val all = NeuralEmbed.w1.flatten ++ NeuralEmbed.b1 ++ NeuralEmbed.w2.flatten
    all.foreach { v =>
      assert(v * (1L << 21) == math.rint(v * (1L << 21)), s"off-grid weight $v")
      assert(v.toString.toDouble == v, s"non-roundtripping literal $v")
    }
  }

  test("embedding norms are positive corpus-wide (the q143/q144 guard never bites here)") {
    val n = Tables.documents(spark, sf001).count()
    assert(NeuralEmbed.neuralVecs(spark, sf001).count() === n,
      "no document should produce the all-clamped zero embedding on this corpus")
  }

  test("q144 gate has real margin: no within-cell neural cosine near τ") {
    // fp-stability of the drop set, the q116/q48 discipline
    val vecs = NeuralEmbed.neuralVecs(spark, sf001)
    val assigned = IvfAnn.assign(vecs,
      IvfAnn.fixedCentroids(vecs, IvfAnn.fixedStride))
    val a = assigned.select(col("vec_id").as("va"), col("embedding").as("ea"),
      col("cell"))
    val b = assigned.select(col("vec_id").as("vb"), col("embedding").as("eb"),
      col("cell").as("cell_b"))
    val minGap = a.join(b, col("cell") === col("cell_b") && col("va") < col("vb"))
      .select(abs(Similarity.cosine(col("ea"), col("eb"))
        - NeuralEmbed.neuralMinCos).as("gap"))
      .agg(min("gap")).first().getDouble(0)
    assert(minGap > 1e-6, f"within-cell cosine sits $minGap%.2e from τ")
  }

  test("q144 accounting is conserved and covers the guarded corpus") {
    val r = SparkEntry.queries("q144_neural_semdedup")(spark, sf001).cache()
    assert(r.where(col("n_kept") + col("n_dropped") =!= col("n_vecs") ||
      col("n_dropped") < 0 || col("n_vecs") <= 0).count() === 0L)
    assert(r.agg(sum("n_vecs")).first().getLong(0) ===
      NeuralEmbed.neuralVecs(spark, sf001).count())
    r.unpersist()
  }
}
