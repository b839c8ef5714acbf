package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV / THETA-SKETCH distinct-value overlap across sources (Beyer et
  * al. SIGMOD'07 "On synopses for distinct-value estimation"; the
  * DataSketches theta family): per source, the K smallest 48-bit
  * hashes of its distinct shingles form a mergeable synopsis; any
  * pair's union sketch is the K smallest of the two synopses MERGED,
  * giving |A∪B| ≈ (K−1)·2⁴⁸/θ_K and |A∩B| ≈ ρ/K · |A∪B| (ρ = union-
  * sketch values present in both sides) — cross-source vocabulary
  * overlap WITHOUT ever joining the corpora. q154 answers "which
  * sources share near-dup DOCUMENTS" exactly; this answers "how much
  * distinct CONTENT do two sources share" from K-row synopses.
  *
  * Exactness discipline: KMV is DETERMINISTIC given the hash — there
  * is no RNG — so unlike most sketches this one is oracle-pairable
  * bit-for-bit. Hashes are 48-bit (12 md5 hex chars): small enough
  * that every product in the estimators ((K−1)·2⁴⁸ ≈ 2⁵⁴,
  * ρ·est ≈ 2⁶⁰) stays in BIGINT, large enough that collisions are
  * ~n²/2⁴⁹ — and a collision would not break parity, because both
  * engines sketch the same distinct h values. Estimators are integer
  * floor divisions; no doubles anywhere.
  *
  * Scale (100 TB):
  *  - The ONLY corpus-scale work is distinct (source, h) + a bounded
  *    per-source top-K via [[org.apache.spark.sql.graftshim.TopKByScore]]
  *    (ObjectHashAggregate, K-sized heaps, map-side partials — the
  *    exchange carries ≤ K rows per source per partition, never the
  *    shingle stream).
  *  - The pairwise stage touches ONLY sketch rows: |sources|²·2K tiny
  *    rows, windows bounded at 2K rows per pair. A production
  *    pipeline persists the per-source sketches next to the corpus
  *    and re-runs the pair stage alone — exactly how theta sketches
  *    are deployed (set operations on synopses, not data).
  */
object KmvSketch {

  val K = 64
  val hashBits = 48
  val hashSpace = 1L << hashBits

  /** (source, h) distinct 48-bit shingle hashes. */
  private def sourceHashes(spark: SparkSession, d: String): DataFrame =
    Dedup.indexedShingleSets(spark, d)
      .join(Tables.documents(spark, d).select("doc_id", "source"), "doc_id")
      .select(col("source"), explode(col("toks")).as("sh"))
      .select(col("source"),
        conv(substring(md5(col("sh")), 1, 12), 16, 10).cast("long").as("h"))
      .distinct()

  /** Per-source K-minimum-values sketch rows (source, h), h ascending
    * within each source, ≤ K rows per source. */
  def sketches(spark: SparkSession, d: String): DataFrame =
    sourceHashes(spark, d)
      .groupBy("source")
      .agg(org.apache.spark.sql.graftshim.TopKByScore(
        -col("h").cast("double"), col("h"), K).as("top"))
      .select(col("source"), explode(col("top")).as("e"))
      .select(col("source"), col("e.id").as("h"))

  /** The per-source synopses AS AN INDEX — built once per (session,
    * corpus), exactly how theta sketches deploy: the K-row synopses
    * are persisted next to the corpus and every overlap query re-runs
    * only the set-operation stage over sketch rows. Before this memo
    * each q218 invocation re-paid the corpus-scale distinct + top-K
    * (the r12 catalog regression); localCheckpoint (not persist) so
    * the tiny materialized relation never plan-aliases the fresh
    * [[sketches]] built by specs/streaming folds via CacheManager. */
  private val sketchIndex =
    new graft.spark.SessionMemo[String, DataFrame]("kmv.sketches")(
      org.apache.spark.sql.graftshim.Checkpoints.release(_))

  def indexedSketches(spark: SparkSession, d: String): DataFrame =
    sketchIndex.getOrElseUpdate(spark, d)(
      sketches(spark, d).localCheckpoint())

  /** Per-source partial sketch of ONE document batch — bounded TopK
    * heaps over the batch's own shingles (the streaming q229 unit;
    * KMV's monoid property makes the merge of per-batch partials equal
    * the whole-corpus sketch). */
  def partialSketch(docs: DataFrame): DataFrame =
    docs.select(col("source"),
        explode(Dedup.shingles(coalesce(col("text"), lit("")))).as("sh"))
      .select(col("source"),
        conv(substring(md5(col("sh")), 1, 12), 16, 10).cast("long").as("h"))
      .distinct()
      .groupBy("source")
      .agg(org.apache.spark.sql.graftshim.TopKByScore(
        -col("h").cast("double"), col("h"), K).as("top"))
      .select(col("source"), explode(col("top")).as("e"))
      .select(col("source"), col("e.id").as("h"))

  /** Fold (source, h) partial-sketch rows into per-source K-minimum
    * sketches (dedup by value, keep the K smallest). */
  def foldSketches(partials: DataFrame): DataFrame =
    partials.distinct()
      .groupBy("source")
      .agg(org.apache.spark.sql.graftshim.TopKByScore(
        -col("h").cast("double"), col("h"), K).as("top"))
      .select(col("source"), explode(col("top")).as("e"))
      .select(col("source"), col("e.id").as("h"))

  /** Per-source sketch summary: size, θ (K-th minimum), and the KMV
    * distinct estimate (exact when the sketch holds the whole set). */
  def summarize(sk: DataFrame): DataFrame =
    sk.groupBy("source")
      .agg(count(lit(1)).as("n_sk"), max("h").as("theta"))
      .select(col("source"), col("n_sk"), col("theta"),
        when(col("n_sk") < K, col("n_sk"))
          .otherwise(expr(s"(($K - 1) * $hashSpace) div theta"))
          .as("est_distinct"))
      .orderBy("source")

  /** Batch SQL twin of [[summarize]] ∘ (whole-corpus sketch) — the
    * q229 oracle: the streamed fold must land on exactly this. */
  val summarySql: String =
    s"""WITH sh AS (
       |  SELECT DISTINCT d.source,
       |    CAST('0x' || substring(md5(t.sh), 1, 12) AS BIGINT) AS h
       |  FROM (SELECT doc_id, unnest(${Dedup.shinglesSql}) AS sh
       |        FROM documents) t
       |  JOIN documents d USING (doc_id)),
       |sk AS (
       |  SELECT source, h FROM (
       |    SELECT source, h,
       |      ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
       |    FROM sh)
       |  WHERE rn <= $K)
       |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_sk,
       |  CAST(MAX(h) AS BIGINT) AS theta,
       |  CAST(CASE WHEN COUNT(*) < $K THEN COUNT(*)
       |            ELSE (($K - 1) * $hashSpace) // MAX(h) END AS BIGINT) AS est_distinct
       |FROM sk GROUP BY source
       |ORDER BY source""".stripMargin

  /** q218: pairwise distinct-content overlap estimates from the
    * per-source synopses. For each source pair (a < b): the union
    * sketch's K-th value θ, the sketch-exact overlap count ρ, and the
    * integer KMV estimators for |A∪B| and |A∩B| (exact when the
    * merged synopsis holds the entire union). */
  val qKmvOverlap: GraftQuery = GraftQuery(
    "q218_kmv_source_overlap",
    s"""WITH sh AS (
       |  SELECT DISTINCT d.source,
       |    CAST('0x' || substring(md5(t.sh), 1, 12) AS BIGINT) AS h
       |  FROM (SELECT doc_id, unnest(${Dedup.shinglesSql}) AS sh
       |        FROM documents) t
       |  JOIN documents d USING (doc_id)),
       |sk AS (
       |  SELECT source, h FROM (
       |    SELECT source, h,
       |      ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS rn
       |    FROM sh)
       |  WHERE rn <= $K),
       |srcs AS (SELECT DISTINCT source FROM sk),
       |pairs AS (
       |  SELECT a.source AS src_a, b.source AS src_b
       |  FROM srcs a JOIN srcs b ON a.source < b.source),
       |mem AS (
       |  SELECT src_a, src_b, h,
       |    MAX(in_a) AS in_a, MAX(in_b) AS in_b
       |  FROM (
       |    SELECT p.src_a, p.src_b, s.h, 1 AS in_a, 0 AS in_b
       |    FROM pairs p JOIN sk s ON s.source = p.src_a
       |    UNION ALL
       |    SELECT p.src_a, p.src_b, s.h, 0, 1
       |    FROM pairs p JOIN sk s ON s.source = p.src_b)
       |  GROUP BY src_a, src_b, h),
       |ranked AS (
       |  SELECT src_a, src_b, h, in_a, in_b,
       |    ROW_NUMBER() OVER (PARTITION BY src_a, src_b ORDER BY h) AS rn,
       |    COUNT(*) OVER (PARTITION BY src_a, src_b) AS n_all
       |  FROM mem),
       |agg AS (
       |  SELECT src_a, src_b,
       |    CAST(MAX(h) AS BIGINT) AS theta,
       |    CAST(COUNT(*) AS BIGINT) AS n_sk,
       |    CAST(MAX(n_all) AS BIGINT) AS n_all,
       |    CAST(SUM(in_a * in_b) AS BIGINT) AS rho
       |  FROM ranked WHERE rn <= $K
       |  GROUP BY src_a, src_b)
       |SELECT src_a, src_b, theta, CAST(rho AS BIGINT) AS rho,
       |  CAST(CASE WHEN n_all <= $K THEN n_all
       |            ELSE (($K - 1) * $hashSpace) // theta END AS BIGINT) AS est_union,
       |  CAST(rho * (CASE WHEN n_all <= $K THEN n_all
       |                   ELSE (($K - 1) * $hashSpace) // theta END) // n_sk
       |    AS BIGINT) AS est_inter
       |FROM agg
       |ORDER BY src_a, src_b""".stripMargin) { (s, d) =>
    // the synopsis index is the only corpus-scale input; everything
    // below touches ≤ |sources|²·2K sketch rows and stays lazy
    val sk = indexedSketches(s, d)
    val srcs = sk.select("source").distinct()
    val pairs = srcs.as("a").join(srcs.as("b"),
        col("a.source") < col("b.source"))
      .select(col("a.source").as("src_a"), col("b.source").as("src_b"))
    val tagged =
      pairs.join(sk.select(col("source").as("src_a"), col("h")), "src_a")
        .select(col("src_a"), col("src_b"), col("h"),
          lit(1).as("in_a"), lit(0).as("in_b"))
      .unionByName(
        pairs.join(sk.select(col("source").as("src_b"), col("h")), "src_b")
          .select(col("src_a"), col("src_b"), col("h"),
            lit(0).as("in_a"), lit(1).as("in_b")))
    val mem = tagged.groupBy("src_a", "src_b", "h")
      .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
    val wPair = Window.partitionBy("src_a", "src_b")
    val ranked = mem
      .withColumn("rn", row_number().over(wPair.orderBy("h")))
      .withColumn("n_all", count(lit(1)).over(wPair))
    val agg = ranked.where(col("rn") <= K)
      .groupBy("src_a", "src_b")
      .agg(max("h").as("theta"),
        count(lit(1)).as("n_sk"),
        max("n_all").as("n_all"),
        sum(col("in_a") * col("in_b")).as("rho"))
    val estU = when(col("n_all") <= K, col("n_all"))
      .otherwise(expr(s"(($K - 1) * $hashSpace) div theta"))
    agg.select(col("src_a"), col("src_b"), col("theta"), col("rho"),
        estU.as("est_union"),
        expr(s"rho * (CASE WHEN n_all <= $K THEN n_all " +
          s"ELSE (($K - 1) * $hashSpace) div theta END) div n_sk").as("est_inter"))
      .orderBy("src_a", "src_b")
  }

  def all: Seq[GraftQuery] = Seq(qKmvOverlap)
}
