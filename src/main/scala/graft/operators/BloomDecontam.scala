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

  /** TRANSITIVE CONTAMINATION EXPANSION — the decontamination posture
    * published eval cards actually require: removing only docs that
    * textually overlap a benchmark (q65/q123) leaves their NEAR-
    * DUPLICATES in the training set, and a near-dup of a contaminated
    * doc leaks the same benchmark content with a few tokens changed.
    * This query expands the contaminated seed set one hop through the
    * verified near-dup graph (q28's banded candidates at jaccard ≥
    * 0.9) and reports every removal with its provenance: hop 0 = the
    * doc itself overlaps the benchmark; hop 1 = it is a near-dup of a
    * hop-0 doc. One hop suffices at jaccard 0.9 in practice because
    * near-dup similarity is nearly transitive at that threshold; a
    * deeper closure is exactly q77/q133's connected components over
    * the same pair relation.
    *
    * 100 TB: seeds come from the bloom-pruned q123 path (scan-side
    * prefilter, no corpus shuffle); the pair graph comes from the
    * PERSISTED band index (built once per corpus, the q27/q28/q94
    * substrate); the seed relation is benchmark-overlap-sized —
    * broadcast onto the pair relation, never the reverse. Nothing in
    * this query scales with corpus × corpus. */
  /** q168's contaminated-seed relation, one checkpointed copy per
    * (session, corpus) — it embeds the 512 KiB bloom literal, so the
    * barrier keeps the literal out of five downstream subtrees;
    * eviction releases the checkpoint blocks (plain unpersist is a
    * no-op on checkpointed frames). */
  private val seedsIndex =
    new graft.spark.SessionMemo[String, DataFrame](
      "bloomdecontam.seedDocs")(
      org.apache.spark.sql.graftshim.Checkpoints.release(_))

  val qContaminationExpansion: GraftQuery = GraftQuery(
    "q209_contamination_expansion",
    s"""WITH bench AS (
       |  SELECT doc_id, unnest(${Dedup.shinglesSql}) AS sh
       |  FROM documents WHERE source = 'src0'),
       |train AS (
       |  SELECT doc_id, unnest(${Dedup.shinglesSql}) AS sh
       |  FROM documents WHERE source <> 'src0'),
       |seeds AS (
       |  SELECT DISTINCT t.doc_id FROM train t JOIN bench b ON t.sh = b.sh),
       |${Dedup.bandsCte},
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       |   AND a.doc_id < b.doc_id),
       |toks AS (
       |  SELECT doc_id, ${Dedup.shinglesSql} AS t FROM documents),
       |ver AS (
       |  SELECT p.doc_a, p.doc_b
       |  FROM pairs p
       |  JOIN toks ta ON p.doc_a = ta.doc_id
       |  JOIN toks tb ON p.doc_b = tb.doc_id
       |  WHERE CAST(len(list_intersect(ta.t, tb.t)) AS DOUBLE) /
       |        len(list_distinct(list_concat(ta.t, tb.t))) >= 0.9),
       |nbr AS (
       |  SELECT v.doc_b AS doc_id FROM ver v JOIN seeds s ON v.doc_a = s.doc_id
       |  UNION
       |  SELECT v.doc_a FROM ver v JOIN seeds s ON v.doc_b = s.doc_id),
       |hop1 AS (
       |  SELECT DISTINCT n.doc_id
       |  FROM nbr n JOIN documents d ON n.doc_id = d.doc_id
       |  WHERE d.source <> 'src0'
       |    AND n.doc_id NOT IN (SELECT doc_id FROM seeds))
       |SELECT doc_id, 0 AS hop FROM seeds
       |UNION ALL
       |SELECT doc_id, 1 AS hop FROM hop1
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
    // the seed relation is benchmark-overlap-sized and referenced FIVE
    // times below (two broadcast joins, an anti join, the union) —
    // materialize it once: without the barrier every reference embeds
    // the 512 KiB bloom-sketch literal in its subtree, the rendered
    // plan hits 10.5 MB (maxPlanStringLength truncation WARN), and
    // each stage's task binary re-ships the sketch
    // memoized per (session, corpus) with the checkpoint blocks
    // released on eviction — repeated invocations must not accumulate
    // unreleasable localCheckpoint storage
    val seeds = seedsIndex.getOrElseUpdate(s, d)(
      contaminatedDocs(s, d)
        .select(col("train_doc").as("doc_id")).distinct()
        .localCheckpoint())
    val ver = Dedup.withJaccardToks(
      Dedup.candidatePairsFromBands(Dedup.indexedBands(s, d)),
      Dedup.indexedShingleSets(s, d))
      .where(col("jaccard") >= 0.9).select("doc_a", "doc_b")
    val nbr = ver
      .join(broadcast(seeds.withColumnRenamed("doc_id", "doc_a")), "doc_a")
      .select(col("doc_b").as("doc_id"))
      .union(ver
        .join(broadcast(seeds.withColumnRenamed("doc_id", "doc_b")), "doc_b")
        .select(col("doc_a").as("doc_id")))
      .distinct()
    val hop1 = nbr
      .join(docs.where(col("source") =!= "src0"), "doc_id")
      .join(broadcast(seeds), Seq("doc_id"), "left_anti")
      .select("doc_id").distinct()
    seeds.select(col("doc_id"), lit(0).as("hop"))
      .unionAll(hop1.select(col("doc_id"), lit(1).as("hop")))
      .orderBy("doc_id")
  }

  def all: Seq[GraftQuery] = Seq(qBloomDecontam, qContaminationExpansion)
}
