package graft
/** Dev tool: micro-bench native vs composed expressions at sf0.1. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val spark = graft.spark.Sessions.local("audit", 16)
    val d = "/root/testdata/sf0.1"
    val emb = graft.sources.Tables.embeddings(spark, d)
    val pairs = emb.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(emb.select(col("vec_id").as("id2"), col("embedding").as("e2"))
        .where(col("id2") < 200)))
    def time(tag: String)(f: => Any): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    time("cosine_native  (400k pairs)")(
      pairs.select(sum(graft.operators.Similarity.cosine(col("embedding"), col("e2")))).collect())
    time("cosine_composed(400k pairs)")(
      pairs.select(sum(graft.operators.Similarity.cosineComposed(col("embedding"), col("e2")))).collect())
    val toks = graft.sources.Tables.documents(spark, d)
      .select(graft.functions.TextFunctions.distinctTokens(lower(col("text"))).as("t"))
    time("simhash_native  (5k docs)")(
      toks.select(sum(pmod(graft.operators.Dedup.simhash64(col("t")), lit(1000000L)))).collect())
    time("simhash_md5     (5k docs)")(
      toks.select(sum(pmod(org.apache.spark.sql.graftshim.SimHashMd5(col("t")), lit(1000000L)))).collect())
    time("simhash_composed(5k docs)")(
      toks.select(sum(pmod(graft.operators.Dedup.simhash64Composed(col("t")), lit(1000000L)))).collect())
    val bigDocs = graft.ScaleBench.synthDocs(spark, d, 100000)._1.persist()
    bigDocs.count()
    time("minhash_bands_fused   (100k docs)")(
      graft.operators.Dedup.docBands(bigDocs).select(sum(length(col("band_hash")))).collect())
    time("minhash_bands_composed(100k docs)")(
      graft.operators.Dedup.docBandsComposed(bigDocs).select(sum(length(col("band_hash")))).collect())
    time("shingle_set_fused   (100k docs)")(
      bigDocs.select(split(lower(col("text")), " ").as("t"))
        .select(sum(size(graft.operators.Dedup.shinglesFromToks(col("t"))))).collect())
    time("shingle_set_composed(100k docs)")(
      bigDocs.select(split(lower(col("text")), " ").as("t"))
        .select(sum(size(graft.operators.Dedup.shinglesFromToksComposed(col("t"))))).collect())
    bigDocs.unpersist()
    val bigEmb = graft.ScaleBench.synthVecs(spark, d, 100000).persist()
    bigEmb.count() // materialize: the timings compare SIGNATURE passes only
    time("lsh_sig_fused   (100k vecs)")(
      bigEmb.select(sum(length(graft.operators.Similarity.lshSignature(col("embedding"))))).collect())
    time("lsh_sig_composed(100k vecs)")(
      bigEmb.select(sum(length(graft.operators.Similarity.lshSignatureComposed(col("embedding"))))).collect())
    bigEmb.unpersist()
    val embAll = graft.sources.Tables.embeddings(spark, d)
    time("topk_agg    (2k q x 2k corpus)")(
      graft.operators.Similarity.bruteForceTopK(embAll, col("vec_id") >= 0, 10).count())
    time("topk_window (2k q x 2k corpus)")(
      graft.operators.Similarity.bruteForceTopKWindow(embAll, col("vec_id") >= 0, 10).count())
    // q03 decomposition: the per-order pre-aggregation (single-task
    // scan + partial agg over the one-row-group lineitem file) vs the
    // full query — quantifies the local scan floor docs/SCALE.md notes
    val li = graft.sources.Tables.lineitem(spark, d)
    time("q03_perorder_agg (600k rows)")(
      li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(12,2)") *
          (lit(1).cast("decimal(3,2)") - col("l_discount").cast("decimal(4,2)"))))
        .count())
    time("q03_full")(
      graft.SparkEntry.queries("q03_top_customers")(spark, d).count())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("q03_full_noaqe")(
      graft.SparkEntry.queries("q03_top_customers")(spark, d).count())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
