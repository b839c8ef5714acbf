package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.TopKByScore

/** IVF-style ANN: k-means coarse quantizer over the embedding corpus,
  * search probes only the nProbe nearest centroid cells. The
  * complement of the hyperplane-LSH path (Similarity.qSimLshTopK):
  * LSH buckets are data-independent; IVF cells adapt to the data
  * distribution — at 100 TB the index is a one-off batch job and every
  * query touches corpus_size × nProbe / k rows instead of the corpus.
  *
  * Not oracle-paired (k-means isn't reproducible in DuckDB); covered
  * by a rows-only entry + a recall-vs-brute-force spec.
  */
object IvfAnn {

  final case class Index(model: KMeansModel, assigned: DataFrame)

  /** Fit the coarse quantizer (seeded → deterministic within Spark)
    * and assign every vector to its cell. */
  def build(emb: DataFrame, numCells: Int, seed: Long = 42): Index = {
    val withFeatures = emb.withColumn("features",
      array_to_vector(col("embedding").cast("array<double>")))
    val model = new KMeans().setK(numCells).setSeed(seed)
      .setFeaturesCol("features").fit(withFeatures)
    val assigned = model.transform(withFeatures)
      .select(col("vec_id"), col("embedding"), col("prediction").as("cell"))
    Index(model, assigned)
  }

  /** Centroids as a small DataFrame (cell, centroid array) — broadcast
    * side of the query-routing join. */
  private def centroidDf(spark: SparkSession, model: KMeansModel): DataFrame = {
    import spark.implicits._
    model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toSeq.toDF("cell", "centroid")
  }

  /** Top-k cosine within the nProbe nearest cells per query. */
  def search(spark: SparkSession, index: Index, queryFilter: org.apache.spark.sql.Column,
      k: Int, nProbe: Int): DataFrame = {
    val queries = index.assigned.where(queryFilter)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    // route each query to its nProbe closest centroids (tiny cross join:
    // |queries| × numCells rows)
    val routed = queries.crossJoin(broadcast(centroidDf(spark, index.model)))
      .withColumn("c_sim", Similarity.cosine(col("q_emb"), col("centroid")))
      .withColumn("c_rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("c_sim").desc, col("cell"))))
      .where(col("c_rank") <= nProbe)
      .select("query_id", "q_emb", "cell")
    // probe only the routed cells
    val corpus = index.assigned
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"), col("cell"))
    routed.join(corpus, Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", Similarity.cosine(col("q_emb"), col("n_emb")))
      .groupBy("query_id")
      .agg(TopKByScore(col("cos"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("neighbor_id"))
      .orderBy("query_id", "rank")
  }

  /** Rows-only catalog entry: build a 16-cell index, search top-3 with
    * nProbe=2 for the first 8 vectors. */
  val qIvfTopK: GraftQuery = GraftQuery.noOracle("q50_ivf_topk") { (s, d) =>
    val index = build(Tables.embeddings(s, d), numCells = 16)
    // assigned feeds both routing and corpus sides; re-transforming is a
    // cheap KMeans predict, so no persist (nothing cached to leak)
    search(s, index, col("vec_id") < 8, k = 3, nProbe = 2)
  }

  def all: Seq[GraftQuery] = Seq(qIvfTopK)
}
