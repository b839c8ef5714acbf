package graft

import graft.operators.{JlProjection, Similarity}
import org.apache.spark.sql.functions._

class JlProjectionSpec extends SparkSpecBase {

  test("project() of a one-hot vector reproduces the sign matrix row exactly") {
    import spark.implicits._
    // emb = 1.0 at position i → p[j] must be exactly signs(i)(j) * 4096
    val oneHots = (0 until 64).map { i =>
      (i.toLong, Array.tabulate(64)(k => if (k == i) 1.0f else 0.0f))
    }
    val got = oneHots.toDF("vec_id", "embedding")
      .select(col("vec_id"), JlProjection.project(col("embedding")).as("p"))
      .collect().map(r => r.getLong(0).toInt -> r.getSeq[Long](1).toArray).toMap
    for (i <- 0 until 64; j <- 0 until 16)
      assert(got(i)(j) === JlProjection.signs(i)(j) * 4096L,
        s"sign matrix mismatch at ($i, $j)")
  }

  test("q156: deterministic, full rank structure, bounded cosine distortion") {
    val run1 = SparkEntry.queries("q156_jl_topk")(spark, sf001).collect()
    val run2 = SparkEntry.queries("q156_jl_topk")(spark, sf001).collect()
    assert(run1.map(_.toSeq).toSeq === run2.map(_.toSeq).toSeq)
    // 8 queries x exactly 3 ranked neighbors
    val byQ = run1.groupBy(_.getLong(0))
    assert(byQ.size === 8)
    byQ.values.foreach(rs => assert(rs.map(_.getInt(1)).sorted.toSeq === Seq(1, 2, 3)))

    // JL distortion measured over ALL (query, neighbor) pairs — NOT
    // the returned top-3, which are selected BY inflated projected
    // cosine and therefore carry maximal positive error by
    // construction (measured: 0.53 mean on the selected pairs vs the
    // unbiased ~1/sqrt(K)=0.25 per-pair std). A broken projection
    // decorrelates fully (mean |err| → mean |cos| distance ≈ uniform),
    // so an unbiased mean < 0.3 still catches it.
    val emb = graft.sources.Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding"))
    val exact = emb.as("a").join(emb.as("b"),
        col("a.vec_id") < 8 && col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("qa"), col("b.vec_id").as("nb"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val proj = emb
      .select(col("vec_id"), JlProjection.project(col("embedding")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def pcos(a: Array[Long], b: Array[Long]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      d / math.sqrt(a.map(x => x * x).sum.toDouble) /
        math.sqrt(b.map(x => x * x).sum.toDouble)
    }
    val errs = exact.keys.toSeq.map { case (q, n) =>
      math.abs(pcos(proj(q), proj(n)) - exact((q, n)))
    }
    assert(errs.sum / errs.length < 0.3,
      s"mean cosine distortion ${errs.sum / errs.length} too large")
  }
}
