package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.BloomSketch

/** Bloom-prefiltered benchmark decontamination: the scan-side form of
  * q65's inverted-index contamination join.
  *
  * The benchmark shingle set is SMALL by definition (benchmarks are
  * kilo-docs; the corpus is the 100 TB side), so instead of shuffling
  * the corpus' whole shingle stream into an equi-join, the benchmark
  * side is sketched once into a bloom filter (Spark's own
  * BloomFilterAggregate — the machinery behind AQE runtime join
  * filters) and the corpus stream is pruned BY A PER-ROW SCAN
  * EXPRESSION before any exchange: only might-contain survivors reach
  * the exact confirming join. Blooms have NO false negatives, so the
  * prefilter is a pure performance device — the output is exactly the
  * exact-join answer, which is why this query can be oracle-paired
  * against plain SQL with no bloom in it (the correctness gate proves
  * the no-false-negative property end to end, every round).
  *
  * The sketch rides to the probe side as a binary Literal via one
  * driver collect — bounded by numBits/8 (here 512 KiB), the same
  * documented-bounded-artifact class as IvfAnn's centroids. Sizing:
  * 4M bits / 100k expected items ≈ 40 bits/item → FPR ≈ 1e-8 at the
  * tested SFs; at a real 100 TB run you size numBits to the actual
  * benchmark shingle count (it stays driver-trivial: even 1e9 bits is
  * 128 MB, and the benchmark side does not grow with the corpus).
  */
object BloomDecontam {

  val numBits = 1L << 22 // 512 KiB sketch
  val expectedItems = 100000L

  /** Exact doc-level contamination via the bloom-pruned path. */
  private[operators] def contaminatedDocs(s: SparkSession, d: String): DataFrame = {
    val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
    val ex = Dedup.indexedShingleSets(s, d).join(src, "doc_id")
    val bench = ex.where(col("source") === "src0")
      .select(explode(col("toks")).as("sh")).distinct()
    // ONE bounded driver transfer: the serialized sketch (<= numBits/8)
    val bloom = bench
      .agg(BloomSketch.agg(xxhash64(col("sh")), expectedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val trainSh = ex.where(col("source") =!= "src0")
      .select(col("doc_id").as("train_doc"), explode(col("toks")).as("sh"))
    trainSh
      .where(BloomSketch.mightContain(bloom, xxhash64(col("sh"))))
      .join(bench, "sh") // exact confirm, touching only bloom survivors
      .groupBy("train_doc")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Shingles are DISTINCT per doc (shingle sets) and the bench side
    * is deduplicated, so COUNT(*) after the join is the size of the
    * intersection between the doc's shingle set and the benchmark's. */
  val qBloomDecontam: GraftQuery = GraftQuery(
    "q123_bloom_decontam",
    s"""WITH bench AS (
       |  SELECT DISTINCT unnest(${Dedup.shinglesSql}) AS sh
       |  FROM documents WHERE source = 'src0'),
       |train AS (
       |  SELECT doc_id, unnest(${Dedup.shinglesSql}) AS sh
       |  FROM documents WHERE source <> 'src0')
       |SELECT t.doc_id AS train_doc, COUNT(*) AS n_shared
       |FROM train t JOIN bench b ON t.sh = b.sh
       |GROUP BY t.doc_id
       |ORDER BY train_doc""".stripMargin) { (s, d) =>
    contaminatedDocs(s, d).orderBy("train_doc")
  }

  def all: Seq[GraftQuery] = Seq(qBloomDecontam)
}
