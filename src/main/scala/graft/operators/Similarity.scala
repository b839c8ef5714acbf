package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (north-star ANN surface).
  *
  * Two tiers, as a real 100 TB pipeline would deploy them:
  *  1. Brute-force cosine top-k: broadcast the (small) query set
  *     against the full corpus — one narrow pass, no shuffle for the
  *     scoring; TakeOrdered per query for the top-k. Exact baseline.
  *  2. Random-hyperplane LSH (SimHash-for-vectors): 8 fixed
  *     hyperplanes → 8-bit bucket signature; near neighbors collide
  *     with high probability, and candidate generation becomes an
  *     equi-join on the signature — the IVF-style scale path where
  *     brute force would be quadratic.
  *
  * Hyperplane matrix is generated from a fixed seed (java.util.Random
  * LCG — stable across JVMs) with ±1 entries, embedded identically in
  * the Spark plan and the DuckDB oracle SQL.
  *
  * Dot products run left-to-right over the array in both engines;
  * scores are used only for ORDER BY / sign tests, never hashed raw,
  * so ulp-level fp differences cannot flip results except on exact
  * ties (broken by id).
  */
object Similarity {

  val dim = 64
  val numPlanes = 8

  /** ±1 hyperplanes for LSH table `t`, deterministic across runs/JVMs
    * (java.util.Random LCG). Table 0 is seed 42 — the original single
    * table every existing query/oracle embeds. */
  def tableHyperplanes(t: Int): Array[Array[Int]] = {
    val rnd = new java.util.Random(42L + 1000L * t)
    Array.fill(numPlanes, dim)(if (rnd.nextBoolean()) 1 else -1)
  }

  /** ±1 hyperplanes, deterministic across runs/JVMs (= table 0). */
  val hyperplanes: Array[Array[Int]] = tableHyperplanes(0)

  /** Cosine similarity between two ARRAY<FLOAT> columns: native fused
    * Catalyst expression (one loop, zero allocation — see
    * org.apache.spark.sql.graftshim.CosineSimilarity). Bit-for-bit equal to
    * [[cosineComposed]], which it replaced on the ANN hot path. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graftshim.CosineSimilarity(a, b)

  /** Built-in composition baseline (zip_with + aggregate): same
    * accumulation order as [[cosine]]; kept for benchmarking the
    * native expression against the compose-built-ins tier. */
  def cosineComposed(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / sqrt(dot(a, a)) / sqrt(dot(b, b))
  }

  /** Signed projection of an ARRAY<FLOAT> onto ±1 hyperplane `p`. */
  private def planeDot(v: Column, p: Array[Int]): Column =
    aggregate(
      zip_with(v, lit(p.map(_.toDouble)), (x, h) => x.cast("double") * h),
      lit(0.0), (acc, x) => acc + x)

  /** 8-char '0'/'1' LSH bucket signature: fused single-pass expression
    * (all 8 projections in one vector traversal, no per-plane
    * zip_with allocation — see graftshim.HyperplaneSignature;
    * bit-compatible with [[lshSignatureComposed]], which is kept as
    * the built-ins benchmark baseline). */
  def lshSignature(v: Column): Column =
    org.apache.spark.sql.graftshim.HyperplaneSignature(v, hyperplanes)

  /** Composed-builtins form: one zip_with+aggregate pass PER plane. */
  def lshSignatureComposed(v: Column): Column =
    concat(hyperplanes.toIndexedSeq.map(p =>
      when(planeDot(v, p) >= 0, "1").otherwise("0")): _*)

  /** Multi-probe bucket set: the signature plus its `numPlanes`
    * Hamming-distance-1 variants. A near neighbor that lands one
    * plane-flip away (the most likely miss — near-orthogonal
    * projections flip sign under small perturbations) is recovered by
    * probing the adjacent buckets, trading ~(numPlanes+1)x candidate
    * volume (still corpus/2^bits per bucket) for a large recall gain —
    * the standard multi-probe LSH refinement. */
  def multiProbeSignatures(sig: Column): Column =
    array((sig +: (0 until numPlanes).map { i =>
      concat(substring(sig, 1, i),
        when(substring(sig, i + 1, 1) === "1", "0").otherwise("1"),
        substring(sig, i + 2, numPlanes - i - 1))
    }): _*)

  /** Signature in table `t`'s hyperplane basis (fused expression). */
  def lshSignatureTable(v: Column, t: Int): Column =
    org.apache.spark.sql.graftshim.HyperplaneSignature(v, tableHyperplanes(t))

  /** All probe signatures within Hamming distance `radius` of `sig`
    * (radius 0 = just sig, 1 = 9 probes, 2 = 37 probes for 8 planes).
    * Generalizes [[multiProbeSignatures]]; probes are distinct by
    * construction so no candidate dedup is needed within one table. */
  def hammingProbes(sig: Column, radius: Int): Column = {
    require(radius >= 0 && radius <= 2,
      s"hammingProbes supports radius 0..2, got $radius")
    def flip(s: Column, i: Int): Column =
      concat(substring(s, 1, i),
        when(substring(s, i + 1, 1) === "1", "0").otherwise("1"),
        substring(s, i + 2, numPlanes - i - 1))
    val h0 = Seq(sig)
    val h1 = if (radius >= 1) (0 until numPlanes).map(flip(sig, _)) else Nil
    val h2 = if (radius >= 2)
      (for (i <- 0 until numPlanes; j <- i + 1 until numPlanes)
        yield flip(flip(sig, i), j))
    else Nil
    array((h0 ++ h1 ++ h2): _*)
  }

  /** Corpus-side multi-table index keys: one "t:signature" entry per
    * table — a vector lives in exactly one bucket PER table, so the
    * index is L× the corpus, still linear. */
  def multiTableKeys(v: Column, numTables: Int): Column =
    array((0 until numTables).map(t =>
      concat(lit(s"$t:"), lshSignatureTable(v, t))): _*)

  /** Query-side probe keys: per table, the signature plus its
    * Hamming<=radius variants, each tagged with the table id. */
  def multiTableProbeKeys(v: Column, numTables: Int, radius: Int): Column =
    concat((0 until numTables).map { t =>
      transform(hammingProbes(lshSignatureTable(v, t), radius),
        s => concat(lit(s"$t:"), s))
    }: _*)

  /** Multi-table LSH top-k: L independent hyperplane tables, each
    * probed at Hamming<=radius. Independence is what buys recall —
    * a true neighbor is missed only if it misses in EVERY table
    * (miss prob (1-p)^L for per-table recall p), while cost stays
    * additive: candidates/query ≈ L × probes × corpus / 2^planes.
    * The measured ≥0.9 operating point at 100k vectors is L=4,
    * radius=1 (see ScaleBench / RecallSweep; BENCH scale block
    * records the full recall/cost curve).
    *
    * A (query, neighbor) pair can collide in several tables, so
    * candidates are deduped BEFORE the bounded-heap top-k (identical
    * (q, n, cos) triples — the cosine is bit-identical across tables). */
  def multiTableTopK(emb: DataFrame, queryFilter: Column, k: Int,
      numTables: Int = 4, radius: Int = 1): DataFrame =
    multiTableCandidates(emb, queryFilter, numTables, radius)
      .groupBy("query_id")
      .agg(org.apache.spark.sql.graftshim.TopKByScore(
        col("cos"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("neighbor_id"))

  /** The multi-table candidate join itself — deduped, scored
    * (query_id, neighbor_id, cos) — shared by [[multiTableTopK]] and
    * the ScaleBench/RecallSweep cost metrics so the candidates being
    * COUNTED are by construction the candidates being RANKED. */
  def multiTableCandidates(emb: DataFrame, queryFilter: Column,
      numTables: Int, radius: Int): DataFrame = {
    val corpus = emb.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("n_emb"),
      explode(multiTableKeys(col("embedding"), numTables)).as("n_key"))
    val q = emb.where(queryFilter)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(multiTableProbeKeys(col("embedding"), numTables, radius)).as("probe"))
    corpus.join(broadcast(q),
        col("probe") === col("n_key") && col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("q_emb"), col("n_emb")).as("cos"))
      .distinct()
  }

  /** Recall-targeting surface: the number of tables needed to reach
    * `targetRecall` given the measured single-table recall (from the
    * scale artifact's recall/cost curve): L = ⌈ln(1-R)/ln(1-p)⌉.
    * Misses are independent across tables (independent hyperplanes),
    * so total recall = 1-(1-p)^L. */
  def tablesForRecall(targetRecall: Double, singleTableRecall: Double): Int = {
    require(targetRecall > 0 && targetRecall < 1 &&
      singleTableRecall > 0 && singleTableRecall < 1,
      "recalls must be in (0, 1)")
    math.ceil(math.log1p(-targetRecall) / math.log1p(-singleTableRecall)).toInt
  }

  /** Exact brute-force top-k cosine neighbors for a query set.
    * queryFilter selects the query rows; broadcast side is the query
    * set (small), stream side the corpus (arbitrarily large).
    *
    * Top-k selection uses the custom bounded-heap aggregate
    * (graftshim.TopKByScore): partial top-k per partition, so the
    * exchange carries k rows per (query, partition) instead of every
    * scored corpus row — same (score desc, id asc) selection as the
    * window form ([[bruteForceTopKWindow]]), different physics. */
  def bruteForceTopK(emb: DataFrame, queryFilter: Column, k: Int): DataFrame = {
    val scored = scorePairs(emb, queryFilter)
    scored.groupBy("query_id")
      .agg(org.apache.spark.sql.graftshim.TopKByScore(
        col("cos"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("neighbor_id"))
  }

  /** Window/row_number formulation — the built-ins-only baseline. */
  def bruteForceTopKWindow(emb: DataFrame, queryFilter: Column, k: Int): DataFrame = {
    val scored = scorePairs(emb, queryFilter)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  private def scorePairs(emb: DataFrame, queryFilter: Column): DataFrame = {
    val queries = emb.where(queryFilter)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val corpus = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"))
    corpus.join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("q_emb"), col("n_emb")))
  }

  /** Symmetric per-vector int8 quantization (q85's storage form, shared
    * with the quantized search path): scale = max|x|/127, codes =
    * floor(x/scale + 0.5) ∈ [-127, 127]. floor(+0.5) half-up rounding
    * is engine-identical (round() half-even ties are not). */
  def int8Scale(e: Column): Column =
    greatest(array_max(transform(e, x => abs(x))), lit(1e-30)) / 127

  def int8Codes(e: Column, scale: Column): Column =
    transform(e, x => floor(x / scale + 0.5).cast("long"))

  /** Integer dot product of two code arrays — EXACT in both engines
    * (|code| ≤ 127, so a 64-dim dot is ≤ ~1.03M, exact in long AND in
    * double). */
  def intDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** One-off batch job: persist the signed corpus BUCKETED BY the LSH
    * signature (sources.Bucketing). Every signature-keyed operation
    * after that — near-dup pair joins, bucket probes — reads bucket i
    * against bucket i straight off disk: no signature recompute, no
    * exchange. At 100 TB this converts each re-run's corpus shuffle
    * (the dominant cost of a daily dedup/ANN sweep) into a mapper-side
    * merge; re-signing only ever happens for new batches. */
  def writeSignatureIndex(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, table: String, numBuckets: Int = 8): Unit =
    graft.sources.Bucketing.writeBucketed(
      Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"),
        lshSignature(col("embedding")).as("bucket")),
      table, "bucket", numBuckets)

  /** The re-run path: embedding near-dup pairs (q48 semantics) from
    * the persisted signature index. Both join sides are the same
    * bucketed table, so the self-join is exchange-free (spec-audited
    * via Bucketing.isShuffleFree); the merge hint keeps Spark from
    * broadcasting away the bucket layout on small inputs. */
  def nearDupPairsFromIndex(spark: org.apache.spark.sql.SparkSession,
      table: String, minCos: Double): DataFrame = {
    val idx = spark.table(table)
    val a = idx.select(col("vec_id").as("vec_a"), col("embedding").as("e_a"),
      col("bucket"))
    val b = idx.select(col("vec_id").as("vec_b"), col("embedding").as("e_b"),
      col("bucket"))
    a.hint("merge").join(b, Seq("bucket"))
      .where(col("vec_a") < col("vec_b") &&
        cosine(col("e_a"), col("e_b")) >= minCos)
      .select("vec_a", "vec_b")
  }

  // ---- oracle-paired queries ----

  private def planeSqlList(p: Array[Int]): String =
    p.map(x => s"$x.0").mkString("[", ", ", "]")

  private def signatureSqlFor(planes: Array[Array[Int]]): String =
    planes.map(p =>
      s"(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), ${planeSqlList(p)}) >= 0 THEN '1' ELSE '0' END)")
      .mkString(" || ")

  private val signatureSql: String = signatureSqlFor(hyperplanes)

  /** Brute-force exact top-5 neighbors of the first 8 vectors.
    * Output is ids+rank only (scores ordered, not emitted — fp-safe). */
  val qSimTopK: GraftQuery = GraftQuery(
    "q30_sim_topk",
    """WITH queries AS (
      |  SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 8),
      |scored AS (
      |  SELECT q.query_id, e.vec_id AS neighbor_id,
      |    list_cosine_similarity(CAST(q.q_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS cos
      |  FROM queries q JOIN embeddings e ON e.vec_id <> q.query_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      |  FROM scored)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id
      |FROM ranked WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin,
    headline = true) { (s, d) =>
    bruteForceTopK(Tables.embeddings(s, d), col("vec_id") < 8, 5)
      .withColumn("rank", col("rank").cast("int"))
      .select("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  /** LSH bucket census: the scale path's partitioning of the corpus. */
  val qSimLshBuckets: GraftQuery = GraftQuery(
    "q31_sim_lsh_buckets",
    s"""SELECT $signatureSql AS bucket,
       |  COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec_id
       |FROM embeddings
       |GROUP BY 1
       |ORDER BY bucket""".stripMargin) { (s, d) =>
    Tables.embeddings(s, d)
      .groupBy(lshSignature(col("embedding")).as("bucket"))
      .agg(count(lit(1)).as("n_vectors"), min(col("vec_id")).as("min_vec_id"))
      .orderBy("bucket")
  }

  /** Bucketed ANN: top-3 neighbors per query restricted to the query's
    * LSH bucket — the join-pruned variant of q30 (approximate; the
    * candidate set is the bucket, not the corpus). */
  val qSimLshTopK: GraftQuery = GraftQuery(
    "q32_sim_lsh_topk",
    s"""WITH sigs AS (
       |  SELECT vec_id, embedding, $signatureSql AS bucket FROM embeddings),
       |scored AS (
       |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS cos
       |  FROM sigs q JOIN sigs e
       |    ON q.bucket = e.bucket AND e.vec_id <> q.vec_id
       |  WHERE q.vec_id < 32),
       |ranked AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored)
       |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id
       |FROM ranked WHERE rank <= 3
       |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
    val sigs = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"), lshSignature(col("embedding")).as("bucket"))
    val q = sigs.where(col("vec_id") < 32)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"), col("bucket"))
    val e = sigs.select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"),
      col("bucket").as("n_bucket"))
    val scored = e.join(broadcast(q),
        col("bucket") === col("n_bucket") && col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("q_emb"), col("n_emb")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= 3)
      .select("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucket-pruned
    * candidate generation (equi-join on the 8-bit signature — the
    * 100 TB path; all-pairs would be quadratic) + exact cosine
    * threshold. Ids-only output: the pair SET is threshold-stable
    * because scores sit far from the cut in this corpus, and ordering
    * never depends on engine-side fp. */
  val qEmbeddingNearDup: GraftQuery = GraftQuery(
    "q48_embedding_neardup",
    s"""WITH sigs AS (
       |  SELECT vec_id, embedding, $signatureSql AS bucket FROM embeddings)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
       |FROM sigs a JOIN sigs b
       |  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
       |                             CAST(b.embedding AS DOUBLE[])) >= 0.3
       |ORDER BY vec_a, vec_b""".stripMargin) { (s, d) =>
    val sigs = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"), lshSignature(col("embedding")).as("bucket"))
    val a = sigs.select(col("vec_id").as("vec_a"), col("embedding").as("e_a"), col("bucket"))
    val b = sigs.select(col("vec_id").as("vec_b"), col("embedding").as("e_b"),
      col("bucket").as("bucket_b"))
    a.join(b, col("bucket") === col("bucket_b") && col("vec_a") < col("vec_b"))
      .where(cosine(col("e_a"), col("e_b")) >= 0.3)
      .select("vec_a", "vec_b")
      .orderBy("vec_a", "vec_b")
  }

  /** Symmetric int8 quantization of the embedding column (the storage
    * form a 100 TB vector corpus actually keeps): per-vector scale =
    * max|x|/127, codes = floor(x/scale + 0.5) ∈ [-127, 127]. Only
    * integer code statistics and the (deterministic one-division)
    * scale are emitted; rounding is floor(+0.5) — identical half-up
    * semantics in both engines, unlike round()'s half-even ties. */
  val qQuantizeInt8: GraftQuery = GraftQuery(
    "q85_quantize_int8",
    """WITH v AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |s AS (
      |  SELECT vec_id, e,
      |    greatest(list_max(list_transform(e, x -> abs(x))), 1e-30) / 127 AS scale
      |  FROM v),
      |q AS (
      |  SELECT vec_id, scale,
      |    list_transform(e, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS codes
      |  FROM s)
      |SELECT vec_id, scale,
      |  codes[1] AS q1, codes[2] AS q2, codes[3] AS q3, codes[4] AS q4,
      |  CAST(len(list_filter(codes, c -> c > 0)) AS INTEGER) AS n_pos,
      |  CAST(len(list_filter(codes, c -> c < 0)) AS INTEGER) AS n_neg,
      |  CAST(list_sum(list_transform(codes, c -> abs(c))) AS BIGINT) AS sum_abs
      |FROM q
      |ORDER BY vec_id""".stripMargin) { (s, d) =>
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
      .withColumn("scale", int8Scale(col("e")))
      .withColumn("codes", int8Codes(col("e"), col("scale")))
      .select(
        col("vec_id"), col("scale"),
        element_at(col("codes"), 1).as("q1"),
        element_at(col("codes"), 2).as("q2"),
        element_at(col("codes"), 3).as("q3"),
        element_at(col("codes"), 4).as("q4"),
        size(filter(col("codes"), c => c > 0)).as("n_pos"),
        size(filter(col("codes"), c => c < 0)).as("n_neg"),
        aggregate(col("codes"), lit(0L), (acc, c) => acc + abs(c)).as("sum_abs"))
      .orderBy("vec_id")
  }

  /** Quantized ANN search END TO END (the form a 100 TB corpus actually
    * serves): score every (query, neighbor) with the int8 approximate
    * cosine — integer dot products over the 64-byte code arrays, exact
    * in both engines — keep the top-20 candidates per query via the
    * bounded-heap TopKByScore (partial-aggregatable: the exchange
    * carries ≤ 20 rows per query per partition), then RESCORE only
    * those candidates with exact float cosine and emit the top-5.
    * At scale the prefilter pass reads 4x fewer bytes than float32
    * scoring and the exact pass touches 20 vectors per query, not the
    * corpus. Approximate scores order candidates; ties break by id —
    * both engines rank identically because the int dots are exact. */
  val qInt8PrefilterTopK: GraftQuery = GraftQuery(
    "q93_int8_prefilter_topk",
    """WITH v AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |s AS (
      |  SELECT vec_id, e,
      |    greatest(list_max(list_transform(e, x -> abs(x))), 1e-30) / 127 AS scale
      |  FROM v),
      |codes AS (
      |  SELECT vec_id, e,
      |    list_transform(e, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS c
      |  FROM s),
      |norms AS (
      |  SELECT vec_id, e, CAST(c AS DOUBLE[]) AS cd,
      |    list_dot_product(CAST(c AS DOUBLE[]), CAST(c AS DOUBLE[])) AS self_dot
      |  FROM codes),
      |approx AS (
      |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
      |    q.e AS q_emb, n.e AS n_emb,
      |    list_dot_product(q.cd, n.cd) / sqrt(q.self_dot) / sqrt(n.self_dot) AS acos_,
      |    row_number() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_dot_product(q.cd, n.cd) / sqrt(q.self_dot) / sqrt(n.self_dot) DESC,
      |               n.vec_id) AS arank
      |  FROM norms q JOIN norms n ON n.vec_id <> q.vec_id
      |  WHERE q.vec_id < 8),
      |rescored AS (
      |  SELECT query_id, neighbor_id,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY list_cosine_similarity(q_emb, n_emb) DESC, neighbor_id) AS rank
      |  FROM approx WHERE arank <= 20)
      |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id
      |FROM rescored WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        col("embedding").cast("array<double>").as("e"))
      .withColumn("scale", int8Scale(col("e")))
      .withColumn("c", int8Codes(col("e"), col("scale")))
      .withColumn("self_dot", intDot(col("c"), col("c")))
    val queries = base.where(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("c").as("qc"), col("self_dot").as("q_sd"))
    val corpus = base.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("n_emb"), col("c").as("nc"), col("self_dot").as("n_sd"))
    val approx = corpus.join(broadcast(queries), col("query_id") =!= col("neighbor_id"))
      .withColumn("acos_",
        intDot(col("qc"), col("nc")).cast("double") /
          sqrt(col("q_sd").cast("double")) / sqrt(col("n_sd").cast("double")))
    // bounded-heap prefilter: top-20 ids by approximate score, ties by
    // id — then fetch the 20 float vectors per query by key for the
    // exact rescore (at scale: a point-lookup join, not a corpus scan)
    val cands = approx.groupBy("query_id")
      .agg(org.apache.spark.sql.graftshim.TopKByScore(
        col("acos_"), col("neighbor_id"), 20).as("top"))
      .select(col("query_id"), explode(col("top.id")).as("neighbor_id"))
    val embSrc = Tables.embeddings(s, d)
    val rescore = embSrc
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"))
      .join(broadcast(cands), "neighbor_id")
      .join(broadcast(embSrc
        .where(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))), "query_id")
    val w = Window.partitionBy("query_id")
      .orderBy(cosine(col("q_emb"), col("n_emb")).desc, col("neighbor_id"))
    rescore.withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= 5)
      .select("query_id", "rank", "neighbor_id")
      .orderBy("query_id", "rank")
  }

  /** The measured ≥0.9-recall LSH operating point (RecallSweep at
    * 100k vectors, 64 spread queries): 4 independent tables, each
    * probed at Hamming≤1. */
  val opTables = 4
  val opRadius = 1

  /** Multi-probe multi-table LSH top-k at the ≥0.9-recall operating
    * point: each query probes its bucket plus the 8 Hamming-1 buckets
    * in each of [[opTables]] independent hyperplane tables. A true
    * neighbor is missed only if it misses in EVERY table — measured
    * recall@3 at 100k vectors: single table H≤1 0.646, L=2 0.872,
    * L=4 0.995 (the sweep validates the 1-(1-p)^L independence
    * model), at ~15% of corpus scored per query vs a full scan. A
    * corpus vector lives in exactly one bucket per table, so a pair
    * can collide in up to L tables; candidates dedup (identical
    * (q, n, cos) triples) before the bounded-heap top-k. */
  val qSimMultiProbeTopK: GraftQuery = {
    def tableSigSql(t: Int) = signatureSqlFor(tableHyperplanes(t))
    val keysSql = (0 until opTables).map(t =>
      s"SELECT vec_id, embedding, '$t:' || ${tableSigSql(t)} AS key FROM embeddings")
      .mkString("\n  UNION ALL\n  ")
    val probesSql = (0 until opTables).map(t =>
      s"""SELECT q.vec_id AS query_id, q.embedding AS q_emb,
         |    '$t:' || (CASE WHEN r.p = 0 THEN q.sig
         |         ELSE substring(q.sig, 1, r.p - 1) ||
         |              (CASE substring(q.sig, r.p, 1) WHEN '1' THEN '0' ELSE '1' END) ||
         |              substring(q.sig, r.p + 1, 8 - r.p)
         |    END) AS probe
         |  FROM (SELECT vec_id, embedding, ${tableSigSql(t)} AS sig
         |        FROM embeddings WHERE vec_id < 16) q
         |  CROSS JOIN (SELECT CAST(unnest(range(0, 9)) AS INTEGER) AS p) r""".stripMargin)
      .mkString("\n  UNION ALL\n  ")
    GraftQuery(
      "q100_sim_multiprobe_topk",
      s"""WITH keys AS (
         |  $keysSql),
         |probes AS (
         |  $probesSql),
         |scored AS (
         |  SELECT DISTINCT p.query_id, e.vec_id AS neighbor_id,
         |    list_cosine_similarity(CAST(p.q_emb AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS cos
         |  FROM probes p JOIN keys e
         |    ON p.probe = e.key AND e.vec_id <> p.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id
         |FROM ranked WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
      multiTableTopK(Tables.embeddings(s, d), col("vec_id") < 16, 3,
        opTables, opRadius)
        .orderBy("query_id", "rank")
    }
  }

  /** Batch-vs-corpus incremental embedding near-dup — the daily-ingest
    * shape (the embedding analog of the dedup family's q94): the NEW
    * batch (every 10th vector here) is signed fresh and joined against
    * the existing corpus's signature index; cost is O(batch ×
    * collision rate), independent of corpus growth, where a corpus ∪
    * batch self-join would re-pay the whole corpus every day. In
    * production the corpus side IS the bucketed signature index
    * ([[writeSignatureIndex]]), making the join exchange-free on the
    * corpus side. */
  val qEmbeddingBatchVsCorpus: GraftQuery = GraftQuery(
    "q108_embedding_batch_vs_corpus",
    s"""WITH sigs AS (
       |  SELECT vec_id, embedding, $signatureSql AS bucket FROM embeddings),
       |batch AS (
       |  SELECT * FROM sigs WHERE vec_id % 10 = 0),
       |corpus AS (
       |  SELECT * FROM sigs WHERE vec_id % 10 <> 0)
       |SELECT b.vec_id AS vec_batch, c.vec_id AS vec_corpus
       |FROM batch b JOIN corpus c ON b.bucket = c.bucket
       |WHERE list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
       |                             CAST(c.embedding AS DOUBLE[])) >= 0.2
       |ORDER BY vec_batch, vec_corpus""".stripMargin) { (s, d) =>
    val sigs = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        lshSignature(col("embedding")).as("bucket"))
    val batch = sigs.where(pmod(col("vec_id"), lit(10)) === 0)
      .select(col("vec_id").as("vec_batch"), col("embedding").as("e_b"),
        col("bucket"))
    val corpus = sigs.where(pmod(col("vec_id"), lit(10)) =!= 0)
      .select(col("vec_id").as("vec_corpus"), col("embedding").as("e_c"),
        col("bucket").as("bucket_c"))
    corpus.join(broadcast(batch), col("bucket") === col("bucket_c"))
      .where(cosine(col("e_b"), col("e_c")) >= 0.2)
      .select("vec_batch", "vec_corpus")
      .orderBy("vec_batch", "vec_corpus")
  }

  /** EMBEDDING-SPACE DRIFT between two corpus snapshots (vec_id
    * parity plays the two snapshots, the q130 convention): cosine
    * between the SUM vectors of each half's int8-quantized
    * embeddings — q160 watches the token distribution, this watches
    * the representation distribution (the signal that the embedding
    * of arriving data is shifting away from the corpus the ANN
    * index/centroids were built on).
    *
    * Why int8 sums: float sums are order-dependent (a mean vector is
    * NOT reproducible under re-partitioning), but the q85 integer
    * codes sum exactly in any order. Per-dim sums stay < 127·n
    * (overflows BIGINT only past ~10^16 vectors); the dot/norm
    * products run in DECIMAL(38,0)/HUGEINT and the outputs are
    * cast back to BIGINT (exact up to ~10^9 vectors at 64 dims —
    * scaladoc'd contract, widen the output type past that).
    *
    * Plan: posexplode to (half, dim, code) — the exchange carries
    * 64·2 partial-sum rows per map partition, NOT 64·n rows
    * (map-side combine); the final join+dot runs on two 64-row
    * relations. drift_cos is the only double: one division by a
    * sqrt of an exact product.
    *
    * Reading the statistic: real encoder embeddings are anisotropic
    * (mean far from the origin), so same-distribution snapshots
    * score drift_cos ≈ 1 and drift pulls it down. The SYNTHETIC
    * testdata is zero-centered, so its half-sums are independent
    * random walks and the baseline sits near 0 — the oracle checks
    * the arithmetic, not an alert threshold. */
  val qEmbeddingDrift: GraftQuery = GraftQuery(
    "q182_embedding_drift",
    """WITH v AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |s AS (
      |  SELECT vec_id, e,
      |    greatest(list_max(list_transform(e, x -> abs(x))), 1e-30) / 127 AS scale
      |  FROM v),
      |q AS (
      |  SELECT vec_id % 2 AS half,
      |    list_transform(e, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS codes
      |  FROM s),
      |dims AS (
      |  SELECT half, CAST(t.i AS INTEGER) AS dim,
      |    codes[CAST(t.i AS INTEGER) + 1] AS c
      |  FROM q, range(64) t(i)),
      |sums AS (
      |  SELECT half, dim, CAST(SUM(c) AS BIGINT) AS sv
      |  FROM dims GROUP BY half, dim),
      |joined AS (
      |  SELECT a.dim, a.sv AS sa, b.sv AS sb
      |  FROM sums a JOIN sums b ON a.dim = b.dim
      |  WHERE a.half = 0 AND b.half = 1),
      |agg AS (
      |  SELECT
      |    CAST(SUM(CAST(sa AS HUGEINT) * CAST(sb AS HUGEINT)) AS BIGINT) AS dot,
      |    CAST(SUM(CAST(sa AS HUGEINT) * CAST(sa AS HUGEINT)) AS BIGINT) AS na2,
      |    CAST(SUM(CAST(sb AS HUGEINT) * CAST(sb AS HUGEINT)) AS BIGINT) AS nb2
      |  FROM joined),
      |counts AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      |  FROM embeddings)
      |SELECT c.n_a, c.n_b, a.dot, a.na2, a.nb2,
      |  CAST(a.dot AS DOUBLE) / sqrt(CAST(a.na2 AS DOUBLE) * CAST(a.nb2 AS DOUBLE))
      |    AS drift_cos
      |FROM agg a CROSS JOIN counts c""".stripMargin) { (s, d) =>
    val codes = Tables.embeddings(s, d)
      .select(pmod(col("vec_id"), lit(2L)).as("half"),
        col("embedding").cast("array<double>").as("e"))
      .withColumn("codes", int8Codes(col("e"), int8Scale(col("e"))))
    val sums = codes
      .select(col("half"), posexplode(col("codes")))
      .groupBy(col("half"), col("pos").as("dim"))
      .agg(sum("col").as("sv"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val agg = sums.where(col("half") === 0)
      .select(col("dim"), col("sv").as("sa"))
      .join(sums.where(col("half") === 1)
        .select(col("dim"), col("sv").as("sb")), "dim")
      .agg(
        sum(dec(col("sa")) * dec(col("sb"))).cast("long").as("dot"),
        sum(dec(col("sa")) * dec(col("sa"))).cast("long").as("na2"),
        sum(dec(col("sb")) * dec(col("sb"))).cast("long").as("nb2"))
    val counts = Tables.embeddings(s, d)
      .agg(sum(when(pmod(col("vec_id"), lit(2L)) === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(pmod(col("vec_id"), lit(2L)) === 1, 1L).otherwise(0L)).as("n_b"))
    agg.crossJoin(broadcast(counts))   // two 1-row aggregates
      .select(col("n_a"), col("n_b"), col("dot"), col("na2"), col("nb2"),
        (col("dot").cast("double") /
          sqrt(col("na2").cast("double") * col("nb2").cast("double")))
          .as("drift_cos"))
  }

  def all: Seq[GraftQuery] =
    Seq(qSimTopK, qSimLshBuckets, qSimLshTopK, qEmbeddingNearDup, qQuantizeInt8,
      qInt8PrefilterTopK, qSimMultiProbeTopK, qEmbeddingBatchVsCorpus,
      qEmbeddingDrift)
}
