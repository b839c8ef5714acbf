package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  private def vecDf(vs: Seq[(Long, Seq[Float])]) = vs.toDF("vec_id", "embedding")

  test("cosine: identical → 1, opposite → -1, orthogonal → 0") {
    val df = Seq((Seq(1f, 0f, 2f), Seq(1f, 0f, 2f), Seq(-1f, 0f, -2f), Seq(0f, 3f, 0f)))
      .toDF("a", "b", "c", "d")
    val r = df.select(
      Similarity.cosine(col("a"), col("b")),
      Similarity.cosine(col("a"), col("c")),
      Similarity.cosine(col("a"), col("d"))).first()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1) + 1.0) < 1e-12)
    assert(math.abs(r.getDouble(2)) < 1e-12)
  }

  test("bruteForceTopK returns k ranked neighbors per query, excluding self") {
    val base = Seq.fill(Similarity.dim)(0f)
    def v(i: Int, x: Float) = base.updated(0, x).updated(1, i.toFloat / 10)
    val df = vecDf((0 until 6).map(i => (i.toLong, v(i, 1f + i))))
    val out = Similarity.bruteForceTopK(df, col("vec_id") < 2, 3)
    val byQuery = out.collect().groupBy(_.getLong(0))
    assert(byQuery.keySet === Set(0L, 1L))
    byQuery.values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.toSeq === Seq(1, 2, 3))
      assert(!rows.exists(r => r.getLong(2) === r.getLong(0)))
    }
  }

  test("LSH signature: fixed width, deterministic, identical vectors collide") {
    val df = vecDf(Seq(
      (0L, Seq.tabulate(Similarity.dim)(i => i.toFloat)),
      (1L, Seq.tabulate(Similarity.dim)(i => i.toFloat)),
      (2L, Seq.tabulate(Similarity.dim)(i => -i.toFloat))))
    val sigs = df.select(Similarity.lshSignature(col("embedding"))).collect().map(_.getString(0))
    assert(sigs.forall(s => s.length === Similarity.numPlanes && s.forall("01".contains(_))))
    assert(sigs(0) === sigs(1))
    assert(sigs(0) !== sigs(2)) // antipodal vectors flip every nonzero bit
  }

  test("bounded-heap TopK aggregate selects exactly what the window form selects") {
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val viaAgg = Similarity.bruteForceTopK(emb, col("vec_id") < 16, 7)
      .orderBy("query_id", "rank").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val viaWin = Similarity.bruteForceTopKWindow(emb, col("vec_id") < 16, 7)
      .orderBy("query_id", "rank").collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(viaAgg.length === 16 * 7)
    assert(viaAgg.toSeq === viaWin.toSeq)
  }

  test("TopK aggregate under repartitioning (partial merge path) is stable") {
    val emb = graft.sources.Tables.embeddings(spark, sf001).repartition(13)
    val a = Similarity.bruteForceTopK(emb, col("vec_id") < 4, 5)
      .orderBy("query_id", "rank").collect().toSeq
    val b = Similarity.bruteForceTopK(emb.repartition(3), col("vec_id") < 4, 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(a === b)
  }

  test("native CosineSimilarity expression is bit-for-bit equal to the composed form") {
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val a = emb.select(col("vec_id"), col("embedding"))
    val paired = a.join(
      a.select(col("vec_id").as("id2"), col("embedding").as("e2")),
      col("vec_id") === col("id2") - 1)
    val diffs = paired.select(
      Similarity.cosine(col("embedding"), col("e2")).as("native"),
      Similarity.cosineComposed(col("embedding"), col("e2")).as("composed"))
      .where(col("native") =!= col("composed"))
    assert(diffs.count() === 0)
  }

  test("dot/precomputed-norm cosine is bit-identical to the fused cosine") {
    import org.apache.spark.sql.graftshim.DotProduct
    val rnd = new scala.util.Random(9)
    val df = vecDf((0L until 300L).map(i =>
      i -> Seq.fill(64)(rnd.nextFloat() * 4 - 2)))
    val pairs = df.crossJoin(df.select(col("embedding").as("e2")).limit(5))
    val diffs = pairs.select(
        operators.Similarity.cosine(col("embedding"), col("e2")).as("fused"),
        (DotProduct(col("embedding"), col("e2")) /
          sqrt(DotProduct(col("embedding"), col("embedding"))) /
          sqrt(DotProduct(col("e2"), col("e2")))).as("split"))
      .where(col("fused") =!= col("split"))
    assert(diffs.count() === 0)
  }

  test("fused LSH signature is bit-identical to the composed form, incl. edge cases") {
    val rnd = new scala.util.Random(3)
    val vecs: Seq[(Long, Seq[Float])] =
      (0L until 200L).map(i => i -> Seq.fill(64)(rnd.nextFloat() * 2 - 1)) ++
        Seq(200L -> Seq.fill(64)(0f),        // all-zero → every plane '>= 0'
          201L -> Seq.fill(10)(1f),          // wrong width → degenerate all-'0'
          202L -> Seq.fill(70)(1f),          // too long → degenerate all-'0'
          // NaN projections: Spark SQL's >= ranks NaN above everything
          // → '1' bits; Java's primitive >= would disagree
          203L -> (Float.NaN +: Seq.fill(63)(1f)))
    val df = vecDf(vecs)
    val diffs = df.select(
        operators.Similarity.lshSignature(col("embedding")).as("fused"),
        operators.Similarity.lshSignatureComposed(col("embedding")).as("composed"))
      .where(col("fused") =!= col("composed"))
    assert(diffs.count() === 0)
    // null element → every projection null → all-'0' (composed parity)
    val withNull = Seq(1L -> Seq(1f, 2f)).toDF("vec_id", "embedding")
      .select(transform(col("embedding"),
        (x, i) => when(i === 0, lit(null)).otherwise(x)).as("embedding"))
    assert(withNull.select(operators.Similarity.lshSignature(col("embedding")))
      .first().getString(0) === "00000000")
  }

  test("int8 prefilter+rescore recalls the exact top-5 almost entirely") {
    val exact = operators.Similarity.qSimTopK.fn(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val quant = operators.Similarity.qInt8PrefilterTopK.fn(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(exact.nonEmpty)
    val recall = exact.intersect(quant).size.toDouble / exact.size
    // int8 keeps ~2 decimal digits of each coordinate; with a 20-wide
    // candidate pool the exact top-5 should survive near-fully
    assert(recall >= 0.9, s"int8-prefiltered recall@5 = $recall")
  }

  test("hyperplanes are seed-stable ±1 (same LCG regeneration matches)") {
    val rnd = new java.util.Random(42)
    val regen = Array.fill(Similarity.numPlanes, Similarity.dim)(
      if (rnd.nextBoolean()) 1 else -1)
    assert(Similarity.hyperplanes.flatten.toSeq === regen.flatten.toSeq)
    assert(Similarity.hyperplanes.forall(_.forall(v => v == 1 || v == -1)))
  }

  test("LSH tables are independent and table 0 is the original basis") {
    assert(Similarity.tableHyperplanes(0).flatten.toSeq ===
      Similarity.hyperplanes.flatten.toSeq)
    val flats = (0 until 4).map(Similarity.tableHyperplanes(_).flatten.toSeq)
    assert(flats.distinct.size === 4) // distinct seeds → distinct bases
  }

  test("hammingProbes enumerates exactly the Hamming<=radius ball, distinct") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq("10110010").toDF("sig")
    def ball(radius: Int): Seq[String] =
      df.select(explode(Similarity.hammingProbes(col("sig"), radius)))
        .as[String].collect().toSeq
    def hd(a: String, b: String): Int = a.zip(b).count { case (x, y) => x != y }
    for (r <- 0 to 2) {
      val probes = ball(r)
      val expectedCount = r match { case 0 => 1; case 1 => 9; case 2 => 37 }
      assert(probes.size === expectedCount)
      assert(probes.distinct.size === probes.size)
      assert(probes.forall(p => hd(p, "10110010") <= r))
    }
  }

  test("tablesForRecall inverts the independence model (validated by sweep)") {
    // sweep at 100k vecs: single-table H<=1 recall 0.646, L=2 measured
    // 0.872 vs model 0.875, L=4 measured 0.995 vs model 0.984
    assert(Similarity.tablesForRecall(0.9, 0.646) === 3)
    assert(Similarity.tablesForRecall(0.99, 0.646) === 5)
    assert(Similarity.tablesForRecall(0.9, 0.9) === 1)
    intercept[IllegalArgumentException](Similarity.tablesForRecall(1.0, 0.5))
  }

  test("multiTableTopK at L=1 H<=1 equals the single-table multiprobe window form") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val mt = Similarity.multiTableTopK(emb, col("vec_id") < 8, 3, 1, 1)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    // legacy formulation: explode multiProbeSignatures, window rank
    val sigs = emb.select(col("vec_id"), col("embedding"),
      Similarity.lshSignature(col("embedding")).as("bucket"))
    val q = sigs.where(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(Similarity.multiProbeSignatures(col("bucket"))).as("probe"))
    val e = sigs.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("n_emb"), col("bucket").as("n_bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    val legacy = e.join(broadcast(q),
        col("probe") === col("n_bucket") && col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", Similarity.cosine(col("q_emb"), col("n_emb")))
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= 3)
      .select("query_id", "rank", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(mt === legacy)
  }

  test("q182: drift sums recompute from driver-side int8 quantization") {
    val row = SparkEntry.queries("q182_embedding_drift")(spark, sf001).collect().head
    val vecs = graft.sources.Tables.embeddings(spark, sf001)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    def codes(e: Array[Double]): Array[Long] = {
      val scale = math.max(e.map(math.abs).max, 1e-30) / 127
      e.map(x => math.floor(x / scale + 0.5).toLong)
    }
    val dim = vecs.head._2.length
    val sa = new Array[Long](dim); val sb = new Array[Long](dim)
    vecs.foreach { case (id, e) =>
      val c = codes(e)
      val t = if (id % 2 == 0) sa else sb
      c.indices.foreach(i => t(i) += c(i))
    }
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => a(i) * b(i)).sum
    assert(row.getAs[Long]("dot") === dot(sa, sb))
    assert(row.getAs[Long]("na2") === dot(sa, sa))
    assert(row.getAs[Long]("nb2") === dot(sb, sb))
    assert(row.getAs[Long]("n_a") === vecs.count(_._1 % 2 == 0).toLong)
    assert(math.abs(row.getAs[Double]("drift_cos")) <= 1.0)
  }
}
