package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the full query catalog:
  *  - operators.Relational: the reference's relational surface
  *    (SURVEY §2.1-2.9) over the testdata star schema
  *  - operators.TextQueries / functions.TextFunctions: text analysis
  *  - operators.Dedup: exact + MinHash-LSH + Jaccard + SimHash dedup
  *  - operators.Similarity: brute-force + LSH ANN over embeddings
  *  - operators.Multimodal: binary-payload plumbing (stubbed decode)
  *  - streaming.Streams: Structured Streaming windowed aggregation
  *  - ml.Predictor: spark.ml parity with the reference's sklearn layer
  */
object SparkEntry {

  val catalog: Seq[GraftQuery] =
    operators.Relational.all ++
      operators.TextQueries.all ++
      operators.Dedup.all ++
      operators.Similarity.all ++
      operators.Multimodal.all ++
      operators.AsOfJoin.all ++
      operators.JsonQueries.all ++
      operators.RangeJoin.all ++
      operators.Skew.all ++
      operators.Extras.all ++
      operators.IvfAnn.all ++
      operators.PqAnn.all ++
      operators.IvfPq.all ++
      operators.JlProjection.all ++
      operators.Advanced.all ++
      operators.TextAdvanced.all ++
      operators.BloomDecontam.all ++
      operators.TextVector.all ++
      operators.NeuralEmbed.all ++
      operators.QualityGate.all ++
      operators.TrainingPipeline.all ++
      operators.Selection.all ++
      operators.NgramStats.all ++
      operators.CurationFunnel.all ++
      operators.Bpe.all ++
      operators.LineDedup.all ++
      operators.StarComponents.all ++
      operators.HybridRetrieval.all ++
      operators.CrossRerank.all ++
      operators.GopherRules.all ++
      operators.HardNegatives.all ++
      operators.CdcChunking.all ++
      operators.MaxSim.all ++
      operators.KAnonymity.all ++
      operators.SequencePatterns.all ++
      operators.SemDedup.all ++
      operators.Formats.all ++
      operators.ZOrder.all ++
      operators.ModelQueries.all ++
      operators.PgRender.all ++
      operators.Serving.all ++
      operators.Compaction.all ++
      operators.PhraseSearch.all ++
      operators.Apss.all ++
      operators.PrioritySample.all ++
      operators.KmvSketch.all ++
      operators.GraphCore.all ++
      operators.EventFlow.all ++
      operators.Behavior.all ++
      operators.MmrRerank.all ++
      operators.SpanCoalesce.all ++
      operators.ClusterLabels.all ++
      operators.VocabGrowth.all ++
      operators.GroupSample.all ++
      operators.OlapGrouping.all ++
      operators.PageRank.all ++
      operators.MarketBasket.all ++
      operators.Funnel.all ++
      operators.TrendStats.all ++
      operators.Pca.all ++
      plans.MvRewrite.all ++
      plans.JoinElim.all ++
      streaming.Streams.all ++
      ml.Predictor.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the full core-model pipeline shape (SURVEY §7.2). */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q08CoreEventsModel.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (simhash bit votes, stubbed media decode, ml fit). */
  def oracleSql: Map[String, String] =
    catalog.collect { case GraftQuery(n, _, Some(sql), _) => n -> sql }.toMap

  /** Headline subset benchmarked per-round (Bench). */
  def headlines: Seq[GraftQuery] = catalog.filter(_.headline)
}
