package graft

import org.apache.spark.sql.functions._

/** Property checks for the n-gram corpus statistics (q115/q117). */
class NgramStatsSpec extends SparkSpecBase {

  private lazy val fluency =
    SparkEntry.queries("q115_lm_fluency")(spark, sf001).cache()
  private lazy val spans =
    SparkEntry.queries("q117_dup_ngram_spans")(spark, sf001).cache()

  test("q115: training-half documents are fully covered by the LM") {
    // every bigram of an even doc_id was trained on (cb >= 1 for all)
    val trainMiss = fluency
      .where(col("doc_id") % 2 === 0 && col("n_hit") =!= col("n_bigrams"))
      .count()
    assert(trainMiss === 0L)
  }

  test("q115: fluency and hit_rate are probabilities; counts consistent") {
    val bad = fluency.where(
      col("fluency") <= 0 || col("fluency") > 1 ||
        col("hit_rate") < 0 || col("hit_rate") > 1 ||
        col("n_hit") > col("n_bigrams") || col("n_bigrams") <= 0 ||
        col("sum_cb") > col("sum_c1")).count()
    assert(bad === 0L)
  }

  test("q115: the LM separates its training half from unseen text") {
    // scored-on-train docs must average a strictly higher hit rate
    val Array(tr, te) = fluency
      .groupBy((col("doc_id") % 2 === 0).as("train"))
      .agg(avg("hit_rate").as("hr"))
      .orderBy(col("train").desc)
      .collect().map(_.getDouble(1))
    assert(tr === 1.0) // by construction
    assert(te < tr, s"held-out hit rate $te should be below training $tr")
  }

  test("q117: a planted exact duplicate pair has dup_frac 1.0") {
    import spark.implicits._
    // two identical 10-token docs + one all-unique-token doc
    val docs = Seq(
      (1L, "a b c d e f g h i j", "en", "src", 19L),
      (2L, "a b c d e f g h i j", "en", "src", 19L),
      (3L, "k l m n o p q r s t", "en", "src", 19L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_ngram").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    // q117 needs only the documents table in the sf dir
    val out = SparkEntry.queries("q117_dup_ngram_spans")(spark, tmp)
      .orderBy("doc_id").collect()
    assert(out.length === 3)
    assert(out(0).getAs[Double]("dup_frac") === 1.0)
    assert(out(1).getAs[Double]("dup_frac") === 1.0)
    assert(out(2).getAs[Double]("dup_frac") === 0.0)
    assert(out(0).getAs[Int]("n_grams") === 6) // 10 tokens -> 6 5-grams
  }

  test("q117: dup counts never exceed totals; short docs are absent") {
    val bad = spans.where(
      col("n_dup") > col("n_grams") || col("n_grams") <= 0 ||
        col("dup_frac") < 0 || col("dup_frac") > 1).count()
    assert(bad === 0L)
    // every emitted doc has >= 5 tokens (>= 1 5-gram position)
    val docs = graft.sources.Tables.documents(spark, sf001)
      .select(col("doc_id"), size(split(lower(col("text")), " ")).as("nt"))
    val short = spans.join(docs, "doc_id").where(col("nt") < 5).count()
    assert(short === 0L)
  }

  test("q158: planted copies score zero novelty; the introducer scores full") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_novelty").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val fresh = "iota kappa lambda mu nu xi omicron pi"
    Seq(
      (0L, base, "en", "s0", base.length.toLong),       // introducer: 1.0
      (1L, base, "en", "s0", base.length.toLong),       // exact copy: 0.0
      // half-overlap: tokens 1-8 are base's suffix grams (seen), the
      // fresh tail introduces its own grams
      (2L, s"$base $fresh", "en", "s0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(dir + "/documents.parquet")
    val got = SparkEntry.queries("q158_novelty_scores")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    assert(got(0L) === ((4, 4, 1.0)), s"introducer: ${got(0L)}")
    assert(got(1L) === ((4, 0, 0.0)), s"exact copy: ${got(1L)}")
    // doc 2: 12 gram positions; the first 4 are exactly doc 0's grams
    // (first seen there), the straddling + fresh ones are novel
    val (n2, nov2, frac2) = got(2L)
    assert(n2 === 12 && nov2 === 8, s"half-copy: ${got(2L)}")
    assert(math.abs(frac2 - 8.0 / 12.0) < 1e-12)
  }

  test("q159: incremental novelty equals full recompute on the batch; index builds once") {
    graft.operators.NgramStats.firstSeenBuilds.set(0)
    val inc = SparkEntry.queries("q159_incremental_novelty")(spark, sf001)
      .collect().map(_.toSeq).toSeq
    val inc2 = SparkEntry.queries("q159_incremental_novelty")(spark, sf001)
      .collect().map(_.toSeq).toSeq
    assert(inc === inc2)
    assert(graft.operators.NgramStats.firstSeenBuilds.get() <= 1,
      "corpus first-seen index must not rebuild per batch")
    val full = SparkEntry.queries("q158_novelty_scores")(spark, sf001)
      .where(org.apache.spark.sql.functions.expr("doc_id % 5 = 4"))
      .collect().map(_.toSeq).toSeq
    assert(inc === full, "incremental min-merge must equal the recompute")
  }
}
