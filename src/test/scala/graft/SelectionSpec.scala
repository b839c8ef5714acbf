package graft

import graft.operators.Selection
import org.apache.spark.sql.functions._

/** q150-q152 invariants beyond the oracle hash: the DSIR separation
  * property on a corpus with a real target/proposal distribution gap
  * (the testdata's sources share one vocabulary, so the property
  * can't be seen there), the count-min overestimate guarantee, and
  * budget-cap/determinism checks for the cluster mix. */
class SelectionSpec extends SparkSpecBase {

  test("dsirScores separates target-like from off-target documents") {
    import spark.implicits._
    // target docs speak vocabulary A, off-target vocabulary B; two
    // probe docs (one per vocabulary) are scored OUTSIDE the target
    // set — DSIR must rank the A-speaking probe far above the B one
    val a = Seq("alpha", "beta", "gamma", "delta")
    val b = Seq("omega", "sigma", "tau", "rho")
    def sent(v: Seq[String], n: Int, salt: Int): String =
      (0 until n).map(i => v((i * 7 + salt) % v.size)).mkString(" ")
    val rows =
      (0L until 20L).map(i => (i, sent(a, 30, i.toInt), true)) ++
        (20L until 40L).map(i => (i, sent(b, 30, i.toInt), false)) ++
        Seq((100L, sent(a, 30, 3), false), (101L, sent(b, 30, 4), false))
    val docs = rows.toDF("doc_id", "text", "is_target")
    val scored = Selection.dsirScores(docs, col("is_target"))
      .where(col("doc_id") >= 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(scored(100L) > scored(101L) * 3,
      s"A-probe ${scored(100L)} must dominate B-probe ${scored(101L)}")
  }

  test("q150: hash-gated resampling is deterministic and keeps the argmax doc") {
    val run1 = SparkEntry.queries("q150_dsir_select")(spark, sf001)
      .collect().map(_.toSeq)
    val run2 = SparkEntry.queries("q150_dsir_select")(spark, sf001)
      .collect().map(_.toSeq)
    assert(run1.nonEmpty)
    assert(run1.toSeq === run2.toSeq)
    // the max-weight document has keep probability exactly 1
    val kept = run1.map(_.head.asInstanceOf[Long]).toSet
    val sc = Selection.dsirScores(
      sources.Tables.documents(spark, sf001),
      col("source").isin("src0", "src1"))
    val top = sc.orderBy(col("avg_r").desc, col("doc_id")).limit(1)
      .collect().head.getLong(0)
    assert(kept.contains(top), s"argmax doc $top must always be kept")
  }

  test("q151: count-min estimates never undercount (one-sided error)") {
    val rows = SparkEntry.queries("q151_countmin_tokens")(spark, sf001).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val (term, exact, est) = (r.getString(0), r.getLong(1), r.getLong(2))
      assert(est >= exact, s"'$term': est $est < exact $exact")
    }
    // collisions are bounded by the sketch's epsilon*N expectation;
    // with 512 buckets and a small vocabulary the top tokens should
    // estimate nearly exactly — a gross blowup means broken hashing
    val blowup = rows.map(r => r.getLong(2) - r.getLong(1)).max
    val total = rows.map(_.getLong(1)).sum
    assert(blowup < total, s"overestimate $blowup out of scale")
  }

  test("q160: identical snapshots drift zero; disjoint vocabularies drift ~2e6 ppm") {
    import spark.implicits._
    def corpus(rows: Seq[(Long, String)]): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
      rows.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(dir + "/documents.parquet")
      dir
    }
    // snapshots (doc parity) with IDENTICAL content → every bucket
    // rate matches → zero drift everywhere
    val same = corpus(Seq((0L, "alpha beta gamma delta"), (1L, "alpha beta gamma delta")))
    val sameRows = SparkEntry.queries("q160_sketch_drift")(spark, same).collect()
    assert(sameRows.forall(_.getLong(3) === 0L))
    assert(sameRows.forall(_.getLong(4) === 0L))
    // fully disjoint vocabularies → every occupied bucket one-sided →
    // total L1 ≈ 1e6 + 1e6 (minus per-bucket floor loss ≤ width)
    val disj = corpus(Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "omega sigma tau rho phi chi")))
    val total = SparkEntry.queries("q160_sketch_drift")(spark, disj)
      .collect().head.getLong(4)
    assert(total >= 2000000L - 2048L && total <= 2000000L, s"total=$total")
  }

  test("q152: per-cell kept mass respects supply and the run is deterministic") {
    val run1 = SparkEntry.queries("q152_cluster_budget_mix")(spark, sf001).collect()
    val run2 = SparkEntry.queries("q152_cluster_budget_mix")(spark, sf001).collect()
    assert(run1.nonEmpty)
    assert(run1.map(_.toSeq).toSeq === run2.map(_.toSeq).toSeq)
    run1.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3),
        s"cell ${r.getLong(0)} kept ${r.getLong(2)} > supply ${r.getLong(3)}")
    }
  }

  test("q191: bootstrap replicates are deterministic and bracket the point estimate") {
    val a = SparkEntry.queries("q191_bootstrap_metric")(spark, sf001)
      .collect().map(_.toSeq).toSeq
    val b = SparkEntry.queries("q191_bootstrap_metric")(spark, sf001)
      .collect().map(_.toSeq).toSeq
    assert(a === b, "hash bootstrap must be rerun-identical")
    assert(a.length === graft.operators.Selection.bootReplicates)

    val docs = graft.sources.Tables.documents(spark, sf001)
    val n = docs.count().toDouble
    val pointMean = docs
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.size(org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.col("text"), " "))))
      .first().getLong(0).toDouble / n
    val means = a.map(_(3).asInstanceOf[Double])
    assert(means.min <= pointMean && pointMean <= means.max,
      s"replicate range [${means.min}, ${means.max}] misses point $pointMean")
    // Binomial(4, 1/4) weights: each replicate's effective n stays
    // within ±20% of the corpus size (std ~ sqrt(0.75 n))
    a.foreach { r =>
      val nEff = r(1).asInstanceOf[Long].toDouble
      assert(math.abs(nEff - n) < 0.2 * n, s"n_eff $nEff vs corpus $n")
    }
  }

  // --- q204: median/MAD outlier gate on a planted corpus ---

  private def stageDocs(rows: Seq[(Long, String, Long)]): String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_sel").toString
    rows.map { case (id, src, nc) => (id, s"doc $id", "en", src, nc) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    tmp
  }

  test("q204: a planted extreme outlier is gated; inliers survive") {
    // source 'a': devs sorted 0,0,0,1,1,1,2,2,4,9900 -> med=100,
    // MAD=1 (cume_dist 0.6 at 1), cutoff 3*1=3 -> the 104 (dev 4) and
    // the 10000 spike are out; the near-median mass survives
    val a = Seq(98L, 99L, 99L, 100L, 100L, 100L, 101L, 102L, 104L, 10000L)
    val rows = a.zipWithIndex.map { case (nc, i) => (i.toLong, "a", nc) }
    val out = SparkEntry.queries("q204_mad_gate")(spark, stageDocs(rows))
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("med_chars") === 100L)
    assert(r.getAs[Long]("mad_chars") === 1L)
    assert(r.getAs[Long]("n_outliers") === 2L,
      "the dev-4 doc and the 10000-char spike must be flagged")
    assert(r.getAs[Long]("kept_chars") === a.filter(_ <= 102).sum)
  }

  test("q204: MAD=0 source (constant half) flags every deviating doc") {
    // 6 of 10 docs identical -> med=50, MAD=0; integer gate dev > 0
    // then flags ALL deviating docs, the documented degenerate case
    val rows = (Seq.fill(6)(50L) ++ Seq(49L, 51L, 60L, 40L)).zipWithIndex
      .map { case (nc, i) => (i.toLong, "c", nc) }
    val r = SparkEntry.queries("q204_mad_gate")(spark, stageDocs(rows))
      .collect().head
    assert(r.getAs[Long]("mad_chars") === 0L)
    assert(r.getAs[Long]("n_outliers") === 4L)
  }

  // --- q207: nucleus selection equals a driver-side replay ---

  test("q207: kept set is exactly best-first until the budget line") {
    import org.apache.spark.sql.functions._
    val q = SparkEntry.queries("q207_nucleus_select")(spark, sf001)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("kept_docs"), r.getAs[Long]("kept_tokens"))).toMap
    // independent replay: score every doc, sort per source in the
    // driver, walk the cumulative budget rule
    val docs = graft.sources.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        graft.operators.QualityGate.logitOf(
          org.apache.spark.sql.graftshim.CharGramVector(
            col("text"), graft.operators.TextVector.dim)).as("logit"))
      .collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getDouble(3)))
    val p = graft.operators.Selection.nucleusPermille
    docs.groupBy(_._1).foreach { case (src, rs) =>
      val sorted = rs.sortBy { case (_, id, _, lg) => (-lg, id) }
      val total = sorted.map(_._3).sum
      var cum = 0L; var kd = 0L; var kt = 0L
      sorted.foreach { case (_, _, nt, _) =>
        if (cum * 1000 < total * p) { kd += 1; kt += nt }
        cum += nt
      }
      assert(q(src) === ((kd, kt)), s"source $src: ${q(src)} vs ($kd, $kt)")
    }
  }
}
