package graft.operators

import graft.GraftQuery
import graft.functions.TextFunctions
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for the LLM-data-pipeline surface:
  * exact (hash-groupBy), MinHash+LSH banding, n-gram Jaccard
  * verification, SimHash. All shuffle-once designs:
  *
  *  - Exact dedup: one hash aggregate on md5(text) — partial-agg
  *    combines map-side, shuffle carries one row per (hash, partition).
  *  - MinHash LSH: signatures are per-row (narrow); the ONLY shuffle is
  *    the groupBy/self-join on band keys, whose cardinality is
  *    #docs × #bands regardless of document size. Candidate pairs per
  *    bucket are bounded by bucket size — the classic way pairwise
  *    O(n²) dedup becomes feasible at 100 TB.
  *  - Jaccard verification joins candidate PAIRS (tiny relative to the
  *    corpus) back to token sets — never all-pairs.
  *
  * MinHash here is min-over-md5-slices ([[MinHashScheme]]): each
  * shingle is digested ceil(numHashes/4) times and every minhash is a
  * minimum over a non-overlapping 8-hex-char window — engine-portable
  * (md5 is byte-identical everywhere) at ~one hash per shingle for the
  * default 4×2 scheme. (An xxhash64 variant was measured and removed:
  * with one hash per shingle, signature cost is dominated by shingle
  * construction, not hashing — md5 equals xxhash within noise while
  * staying oracle-portable.)
  */
/** LSH banding scheme: `numHashes` 32-bit minhashes split into `bands`
  * bands of r = numHashes/bands rows. Candidate probability for a pair
  * at jaccard j is the S-curve 1 - (1 - j^r)^b; tune (r, b) so the
  * curve's inflection (≈ (1/b)^(1/r)) sits at the target threshold —
  * a production corpus picks these per dedup policy, they are not
  * constants of the algorithm.
  *
  * 32-bit hash i is the i-th 8-hex-char slice of a concatenation of
  * ceil(numHashes/4) md5 digests per shingle; digest j > 0 salts the
  * shingle with chr(1)||j (engine-portable), digest 0 is the unsalted
  * md5 — so the default 4-hash scheme's signatures are byte-identical
  * to the fixed-constant form this generalizes. */
final case class MinHashScheme(numHashes: Int, bands: Int) {
  require(numHashes % bands == 0, s"bands=$bands must divide numHashes=$numHashes")
  val rowsPerBand: Int = numHashes / bands
  val numDigests: Int = (numHashes + 3) / 4

  /** P(some band collides | true jaccard j) under ideal minhashes. */
  def candidateProb(j: Double): Double =
    1.0 - math.pow(1.0 - math.pow(j, rowsPerBand.toDouble), bands.toDouble)

  /** Concatenated per-shingle digests, 8 hex chars per hash function. */
  private[operators] def digestsCol(w: Column): Column =
    if (numDigests == 1) md5(w)
    else concat((0 until numDigests).map(j =>
      if (j == 0) md5(w) else md5(concat(w, lit("\u0001" + j)))): _*)

  /** DuckDB spelling of [[digestsCol]] for a shingle expression `w`. */
  private[operators] def digestsSql(w: String): String =
    if (numDigests == 1) s"md5($w)"
    else (0 until numDigests).map(j =>
      if (j == 0) s"md5($w)" else s"md5($w || chr(1) || '$j')").mkString(" || ")
}

object MinHashScheme {
  /** Round-2-compatible default: 4 hashes × 2 bands (threshold ≈ 0.71). */
  val default: MinHashScheme = MinHashScheme(4, 2)
}

object Dedup {

  val shingleWidth = 3

  /** Distinct `shingleWidth`-word shingles of lowercased text. Shingles
    * (not unigrams) are what make MinHash discriminative: random texts
    * over a small vocabulary share most WORDS, but word *sequences* are
    * near-unique, so only genuine near-duplicates overlap. (Switching
    * from unigram token sets cut the sf0.1 candidate-pair count from
    * 876k noise pairs to the 25 true near-dup pairs.) */
  def shingles(text: Column): Column = shinglesFromToks(split(lower(text), " "))

  /** Shingles from a pre-bound token-array column — fused single-pass
    * expression (graftshim.ShingleSet). Callers that care about
    * throughput MUST bind the tokenization to a real column first
    * ([[tokenizedDocs]]): Spark does not eliminate common
    * subexpressions inside higher-order-function lambdas, so passing
    * the raw split() expression re-tokenizes the text once per
    * shingle slice. */
  def shinglesFromToks(toks: Column): Column =
    org.apache.spark.sql.graftshim.ShingleSet(toks, shingleWidth)

  /** Built-ins-composed shingling — the form the fused expression must
    * match element-for-element (spec-asserted). */
  def shinglesFromToksComposed(toks: Column): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(size(toks) - (shingleWidth - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(shingleWidth)))))

  /** (doc_id, __toks) projection — the bound-column tokenization.
    * NULL text coalesces to an EMPTY token array: the fused shingle /
    * banding expressions are null-in/null-out, while the composed
    * forms propagate a null array into a [""]-shingle — normalizing
    * here keeps both forms on the identical "null doc behaves as empty
    * doc" semantics. */
  private def tokenizedDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      coalesce(split(lower(col("text")), " "), expr("array()")).as("__toks"))

  /** Band b's minhashes: minima over non-overlapping 8-hex-char slices
    * of the per-shingle digest string — an md5 yields four independent
    * 32-bit hash functions, so a signature costs ceil(numHashes/4)
    * hashes per shingle (one, for the default scheme). */
  private def bandFromDigests(m: Column, b: Int, sch: MinHashScheme): Column =
    md5(concat_ws("|", (0 until sch.rowsPerBand).map { i =>
      val slice = b * sch.rowsPerBand + i
      array_min(transform(m, x => substring(x, 8 * slice + 1, 8)))
    }: _*))

  /** doc_id → (band_id, band_hash) rows, via the fused single-pass
    * banding expression (graftshim.MinHashBandHashes — no shingle /
    * digest / slice arrays materialized; byte-identical to
    * [[docBandsComposed]], which stays as the built-ins baseline). */
  def docBands(docs: DataFrame,
      sch: MinHashScheme = MinHashScheme.default): DataFrame =
    tokenizedDocs(docs)
      .select(col("doc_id"),
        posexplode(org.apache.spark.sql.graftshim.MinHashBandHashes(
          col("__toks"), sch.numHashes, sch.bands, shingleWidth)))
      .select(col("doc_id"), col("pos").cast("int").as("band_id"),
        col("col").as("band_hash"))

  /** Built-ins-composed banding (shingle array → digest array → sliced
    * minima → band md5) — the form the fused expression must match. */
  def docBandsComposed(docs: DataFrame,
      sch: MinHashScheme = MinHashScheme.default): DataFrame = {
    val withSh = tokenizedDocs(docs)
      .select(col("doc_id"), shinglesFromToks(col("__toks")).as("sh"))
    val digests = withSh.select(
      col("doc_id"), transform(col("sh"), w => sch.digestsCol(w)).as("m"))
    val bands = array((0 until sch.bands).map(b =>
      struct(lit(b).as("band_id"), bandFromDigests(col("m"), b, sch).as("band_hash"))): _*)
    digests.select(col("doc_id"), explode(bands).as("band"))
      .select(col("doc_id"), col("band.band_id"), col("band.band_hash"))
  }

  /** Candidate near-dup pairs (doc_a < doc_b) from shared LSH bands.
    * The bands relation is pre-repartitioned on the join key so both
    * self-join sides share an IDENTICAL exchange — Spark's exchange
    * reuse then computes the signature pipeline once, with no persist
    * (no session-lifetime cache to leak). */
  def candidatePairs(docs: DataFrame,
      sch: MinHashScheme = MinHashScheme.default): DataFrame =
    candidatePairsFromBands(docBands(docs, sch))

  /** Candidate pairs of a NEW BATCH against an existing corpus index —
    * the daily-ingest form of near-dup detection: the corpus side is
    * the persisted band index (built once, appended to), the batch side
    * is signed fresh, and the join is batch-bands × corpus-bands on the
    * band key. Cost is O(batch × collision rate), independent of how
    * the corpus grew — a self-join over corpus ∪ batch would re-pay the
    * whole corpus every day.
    *
    * Carries the oversize-bucket guard in the form the CROSS join
    * needs (r12): a boilerplate flood arriving against a corpus that
    * already holds the same boilerplate collapses both sides into one
    * band bucket and the join emits n_batch·n_corpus candidates — the
    * quadratic the ingest path would otherwise re-open. A bucket's
    * yield is a PRODUCT here, so the guard gates on the SMALLER
    * side's count: when min(n_batch, n_corpus) exceeds the cap, both
    * sides salt by id hash into ⌈min/cap⌉ groups and pairs generate
    * within a salt group only, bounding the yield to
    * ~cap·max(n_batch, n_corpus) — linear in bucket size. A
    * ONE-SIDED bucket (a big corpus cluster probed by a few batch
    * docs — min ≤ cap) is already linear and is deliberately NOT
    * salted: capping on the union size would silently drop a batch
    * doc's only true near-dup into another salt group (the round-12
    * review's finding). Pairs lost in the salted regime have a flood
    * on BOTH sides — internals exactly as in
    * [[candidatePairsFromBands]]'s note. Per-side counts come from
    * windows on the join's own (band_id, band_hash) partitioning (no
    * extra exchange, no eager job — the guard is IN-PLAN, so a
    * persisted corpus index pays nothing per probe). Under the cap
    * every salt is 0 and the join is IDENTICAL to the unguarded form
    * (the regime every oracle comparison exercises — q94/q364's
    * corpora sit ~100× under the cap); the capped regime is pinned by
    * DedupSpec, and [[crossOversizeBucketReport]] is the alerting
    * surface: it names every bucket the salt split touched and the
    * exact pair count forfeited there. */
  /** A band index persisted TOGETHER WITH its per-bucket occupancy
    * census — the jaccard tier's [[BandedHamming.StatedIndex]]
    * discipline (r12's persisted-guard-stats ask, extended here per
    * r12 verdict #4): the cross-corpus flood guard needs each
    * bucket's corpus-side count, and recounting the corpus index per
    * probe (the r12 in-plan window census) re-paid a corpus-wide
    * window sort on every ingest probe. `bucketCounts` is
    * (band_id, band_hash, n_corpus), computed ONCE at index
    * build/drain over exactly `rows`; probes recount only the batch
    * side. */
  final case class BandIndex(rows: DataFrame, bucketCounts: DataFrame)

  /** The per-bucket census a [[BandIndex]] bundles. */
  def bandBucketCounts(bands: DataFrame): DataFrame =
    bands.groupBy("band_id", "band_hash")
      .agg(count(lit(1)).as("n_corpus"))

  /** [[crossCorpusCandidates]] against a STATED corpus index: the
    * guard's corpus-side bucket counts come from the index's
    * persisted census, so the probe plan aggregates only the batch
    * side (one tiny groupBy) and never windows the corpus. The gate
    * relation — min side per bucket — is bounded by the BATCH's
    * bucket count and joins back to both sides; joining it into the
    * corpus side also PRUNES corpus rows to batch-touched buckets
    * before the pair shuffle (the window form carried every corpus
    * row through its sort). Left unhinted so AQE broadcasts the gate
    * at daily-ingest batch sizes and falls back to a shuffle join if
    * a corpus-scale "batch" arrives. Result is IDENTICAL to the
    * census form in every regime — same min-side numbers, same salt
    * rule — pinned by DedupSpec on both the flood and normal
    * fixtures. */
  def crossCorpusCandidates(batchBands: DataFrame, corpus: BandIndex,
      cap: Int): DataFrame = {
    val gate = batchBands
      .groupBy("band_id", "band_hash").agg(count(lit(1)).as("n_batch"))
      .join(corpus.bucketCounts, Seq("band_id", "band_hash"))
      .select(col("band_id"), col("band_hash"),
        least(col("n_batch"), col("n_corpus")).as("min_side"))
    def salted(side: DataFrame, as: String): DataFrame = side
      .join(gate, Seq("band_id", "band_hash"))
      .withColumn("salt", saltFor(col("min_side"), cap))
      .select(col("doc_id").as(as), col("band_id"), col("band_hash"),
        col("salt"))
    salted(batchBands, "doc_batch")
      .join(salted(corpus.rows, "doc_corpus"),
        Seq("band_id", "band_hash", "salt"))
      .select("doc_batch", "doc_corpus")
      .distinct()
  }

  def crossCorpusCandidates(batchBands: DataFrame, corpusBands: DataFrame,
      cap: Int = defaultBucketCap): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("band_id", "band_hash")
    val minSide = least(
      count(when(col("is_batch"), 1)).over(w),
      count(when(!col("is_batch"), 1)).over(w))
    val salted = batchBands
      .select(col("doc_id"), col("band_id"), col("band_hash"),
        lit(true).as("is_batch"))
      .unionByName(corpusBands
        .select(col("doc_id"), col("band_id"), col("band_hash"),
          lit(false).as("is_batch")))
      .repartition(col("band_id"), col("band_hash"))
      .withColumn("salt", saltFor(minSide, cap))
    salted.where(col("is_batch")).as("b")
      .join(salted.where(!col("is_batch")).as("c"),
        col("b.band_id") === col("c.band_id") &&
        col("b.band_hash") === col("c.band_hash") &&
        col("b.salt") === col("c.salt"))
      .select(col("b.doc_id").as("doc_batch"), col("c.doc_id").as("doc_corpus"))
      .distinct()
  }

  /** Observability for [[crossCorpusCandidates]]'s salted regime (the
    * r12 advice): the self-join guard surfaces floods through
    * [[oversizeBucketReport]], but the cross join traded recall away
    * silently. One row per bucket the cross guard actually salts
    * (min side > cap): both side counts and the exact pair count the
    * salt split forfeits in THAT bucket (n_batch·n_corpus − Σ_g
    * batch_g·corpus_g, computed under the operator's own salt rule so
    * the number is what production genuinely lost, not an estimate).
    * Per-bucket grain: a pair forfeited in one band may still be kept
    * by another band's bucket — this is the alerting surface, the
    * candidate relation is the truth. Empty on normal data. */
  def crossOversizeBucketReport(batchBands: DataFrame,
      corpusBands: DataFrame, cap: Int = defaultBucketCap): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("band_id", "band_hash")
    val minSide = least(
      count(when(col("is_batch"), 1)).over(w),
      count(when(!col("is_batch"), 1)).over(w))
    batchBands
      .select(col("doc_id"), col("band_id"), col("band_hash"),
        lit(true).as("is_batch"))
      .unionByName(corpusBands
        .select(col("doc_id"), col("band_id"), col("band_hash"),
          lit(false).as("is_batch")))
      .repartition(col("band_id"), col("band_hash"))
      .withColumn("salt", saltFor(minSide, cap))
      .groupBy("band_id", "band_hash", "salt")
      .agg(count(when(col("is_batch"), 1)).as("bg"),
        count(when(!col("is_batch"), 1)).as("cg"))
      .groupBy("band_id", "band_hash")
      .agg(sum("bg").as("n_batch"), sum("cg").as("n_corpus"),
        sum(col("bg") * col("cg")).as("pairs_kept"))
      .where(least(col("n_batch"), col("n_corpus")) > cap)
      .select(col("band_id"), col("band_hash"),
        col("n_batch"), col("n_corpus"),
        (col("n_batch") * col("n_corpus") - col("pairs_kept"))
          .as("pairs_forfeited"))
      .orderBy(col("pairs_forfeited").desc, col("band_id"))
  }

  /** The shared salt rule of both bucket guards: group 0 under the
    * cap (guard inert — spec-pinned identical to unguarded), else doc
    * hash into ⌈gateSize/cap⌉ groups. `gateSize` is the count whose
    * excess makes the bucket quadratic: total size for the self join,
    * the smaller side for the cross join. */
  private def saltFor(gateSize: Column, cap: Int): Column =
    when(gateSize <= cap, lit(0L))
      .otherwise(pmod(hash(col("doc_id")).cast("long"),
        ceil(gateSize.cast("double") / cap).cast("long")))

  /** Pairs-per-bucket safety cap. Synthetic/real corpora sit nowhere
    * near it (measured p99 bucket = 2, max = 13 at 101k docs), so the
    * guard is a no-op on normal data — it exists for the adversarial
    * shape: a flood of empty/boilerplate documents collapses to ONE
    * shingle set, one band bucket of size m, and m²/2 candidate pairs
    * (re-quadratic). */
  val defaultBucketCap = 1000

  /** Candidate pairs with the oversize-bucket guard: buckets larger
    * than `cap` are salt-split into ⌈size/cap⌉ groups by doc-id hash,
    * and pairs generate within a salt group only — bounding a bucket's
    * contribution to ~size·cap/2 (linear in size) instead of size²/2.
    * The lost cross-group pairs are boilerplate-flood internals: their
    * members still interlink within groups (enough for the clustering
    * path to flag them), and EXACT duplicates — which such floods are —
    * are already caught by the md5 hash-dedup path (q26). Buckets at
    * or under the cap take salt 0 everywhere, so on normal data the
    * result is IDENTICAL to the unguarded join (spec-pinned).
    *
    * Physics: bucket sizes come from a window count over the same
    * (band_id, band_hash) partitioning the join needs — no extra
    * exchange on the normal path; [[oversizeBucketReport]] is the
    * observability side (log/alert on capped buckets).
    *
    * Oracle note: the t2 DuckDB oracles rebuild the UNCAPPED band
    * join (the salt is a Spark murmur3 hash, not reproducible in
    * SQL), so above the cap the guarded operator INTENTIONALLY
    * diverges from them — that divergence is the guard. The driver
    * corpora sit ~100x under the cap (p99 bucket = 2 at 101k docs),
    * so every oracle comparison exercises the identical-result
    * regime; the capped regime is pinned by DedupSpec instead. */
  def candidatePairsFromBands(rawBands: DataFrame,
      cap: Int = defaultBucketCap): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("band_id", "band_hash")
    val salted = rawBands.repartition(col("band_id"), col("band_hash"))
      .withColumn("salt", saltFor(count(lit(1)).over(w), cap))
    val a = salted.as("a")
    val b = salted.as("b")
    a.join(b,
        col("a.band_id") === col("b.band_id") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.salt") === col("b.salt") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Buckets the guard would split at `cap` — the alerting surface a
    * production run logs (a non-empty report means someone is feeding
    * boilerplate floods into the dedup corpus). */
  def oversizeBucketReport(rawBands: DataFrame,
      cap: Int = defaultBucketCap): DataFrame =
    rawBands.groupBy("band_id", "band_hash")
      .agg(count(lit(1)).as("bsize"))
      .where(col("bsize") > cap)
      .orderBy(col("bsize").desc, col("band_id"))

  /** (doc_id, toks) shingle-set relation — compute once, reuse/persist
    * across both sides of pair joins. */
  def shingleSets(docs: DataFrame): DataFrame =
    tokenizedDocs(docs)
      .select(col("doc_id"), shinglesFromToks(col("__toks")).as("toks"))

  /** Exact Jaccard over distinct-shingle sets, for candidate verification. */
  def withJaccard(pairs: DataFrame, docs: DataFrame): DataFrame =
    withJaccardToks(pairs, shingleSets(docs))

  def withJaccardToks(pairs: DataFrame, toks: DataFrame): DataFrame = {
    pairs
      .join(toks.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("toks", "toks_a"), "doc_a")
      .join(toks.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("toks", "toks_b"), "doc_b")
      .withColumn("n_inter", size(array_intersect(col("toks_a"), col("toks_b"))))
      .withColumn("n_union", size(array_union(col("toks_a"), col("toks_b"))))
      .withColumn("jaccard", col("n_inter").cast("double") / col("n_union"))
      .select("doc_a", "doc_b", "n_inter", "n_union", "jaccard")
  }

  /** 64-bit SimHash over tokens — native single-pass Catalyst
    * expression (org.apache.spark.sql.graftshim.SimHash64). */
  def simhash64(toks: Column): Column =
    org.apache.spark.sql.graftshim.SimHash64(toks)

  /** Built-ins-composed SimHash baseline (60-bit; one array scan PER
    * BIT — kept to benchmark the native expression against). */
  def simhash64Composed(toks: Column): Column = {
    val tokHash = transform(toks, w => conv(substring(md5(w), 1, 15), 16, 10).cast("long"))
    val votes = (0 until 60).map { bit =>
      val cnt = size(filter(tokHash, h => h.bitwiseAND(lit(1L << bit)) =!= 0L))
      when(cnt * 2 > size(tokHash), lit(1L << bit)).otherwise(0L)
    }
    votes.reduce((a: Column, b: Column) => a.bitwiseOR(b))
  }

  // ---- oracle-paired queries ----

  /** Exact dedup via hash-groupBy: canonical survivor per content hash. */
  val qDedupExact: GraftQuery = GraftQuery(
    "q26_dedup_exact",
    """SELECT md5(lower(text)) AS content_fp,
      |  MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
      |FROM documents
      |GROUP BY md5(lower(text))
      |ORDER BY content_fp""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .groupBy(TextFunctions.contentFingerprint(col("text")).as("content_fp"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("content_fp")
  }

  /** DuckDB rendering of [[shingles]]: range() is EXCLUSIVE-upper where
    * Spark sequence() is inclusive — bounds chosen so both emit
    * i = 1 .. len-(width-1) (min 1). */
  private[operators] def shinglesSqlFor(c: String): String = {
    val w = shingleWidth
    s"list_distinct(list_transform(" +
      s"range(1, greatest(len(string_split(lower($c), ' ')) - ${w - 2}, 2)), " +
      s"i -> array_to_string(list_slice(string_split(lower($c), ' '), i, i + ${w - 1}), ' ')))"
  }

  private[operators] val shinglesSql: String = shinglesSqlFor("text")

  private def bandSqlFromDigests(b: Int, sch: MinHashScheme): String =
    "md5(concat_ws('|', " + (0 until sch.rowsPerBand).map { i =>
      val slice = b * sch.rowsPerBand + i
      s"list_aggregate(list_transform(m, x -> substring(x, ${8 * slice + 1}, 8)), 'min')"
    }.mkString(", ") + "))"

  /** DuckDB rendering of [[docBands]] for any scheme. */
  private[operators] def bandsCteFor(sch: MinHashScheme,
      where: String = ""): String = {
    val unions = (0 until sch.bands).map(b =>
      s"SELECT doc_id, $b AS band_id, ${bandSqlFromDigests(b, sch)} AS band_hash FROM sigs")
      .mkString("\n    UNION ALL\n    ")
    s"""sigs AS (
       |  SELECT doc_id, list_transform($shinglesSql, w -> ${sch.digestsSql("w")}) AS m
       |  FROM documents $where),
       |bands AS (
       |  SELECT doc_id, band_id, band_hash FROM (
       |    $unions))""".stripMargin
  }

  private[operators] val bandsCte: String = bandsCteFor(MinHashScheme.default)

  /** The signature relation is an INDEX: built once per (session,
    * corpus), reused by every census/pair query — the way a production
    * pipeline materializes LSH signatures to a table rather than
    * re-shingling the corpus per query. Bounded cache (one persisted
    * relation per corpus per session), not a per-invocation leak. */
  private val bandsIndex =
    new graft.spark.SessionMemo[(String, MinHashScheme), DataFrame](
      "dedup.bands")(_.unpersist(): Unit)

  def indexedBands(spark: org.apache.spark.sql.SparkSession, sfDir: String,
      sch: MinHashScheme = MinHashScheme.default): DataFrame =
    bandsIndex.getOrElseUpdate(spark, (sfDir, sch))(
      docBands(Tables.documents(spark, sfDir), sch).persist())

  /** Shingle-set relation as a second per-corpus index: the Jaccard
    * verification joins it TWICE (doc_a side, doc_b side) — without the
    * persist each side re-shingles and re-hashes the whole corpus. A
    * production pipeline materializes this next to the signature table. */
  private val toksIndex =
    new graft.spark.SessionMemo[String, DataFrame](
      "dedup.shingles")(_.unpersist(): Unit)

  def indexedShingleSets(spark: org.apache.spark.sql.SparkSession, sfDir: String): DataFrame =
    toksIndex.getOrElseUpdate(spark, sfDir)(
      shingleSets(Tables.documents(spark, sfDir)).persist())

  /** MinHash LSH bucket census: buckets holding >1 doc = candidates. */
  val qDedupMinhashBuckets: GraftQuery = GraftQuery(
    "q27_dedup_minhash_buckets",
    s"""WITH $bandsCte
       |SELECT band_id, band_hash, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc
       |FROM bands
       |GROUP BY band_id, band_hash
       |HAVING COUNT(*) > 1
       |ORDER BY band_id, band_hash""".stripMargin,
    headline = true) { (s, d) =>
    indexedBands(s, d)
      .groupBy("band_id", "band_hash")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
      .where(col("n_docs") > 1)
      .orderBy("band_id", "band_hash")
  }

  /** LSH candidate pairs, Jaccard-verified (the full near-dup pipeline):
    * band-join → distinct pairs → token-set Jaccard ≥ 0.9. */
  val qDedupMinhashPairs: GraftQuery = GraftQuery(
    "q28_dedup_minhash_pairs",
    s"""WITH $bandsCte,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       |   AND a.doc_id < b.doc_id),
       |toks AS (
       |  SELECT doc_id, $shinglesSql AS t FROM documents)
       |SELECT p.doc_a, p.doc_b,
       |  CAST(len(list_intersect(ta.t, tb.t)) AS INTEGER) AS n_inter,
       |  CAST(len(list_distinct(list_concat(ta.t, tb.t))) AS INTEGER) AS n_union,
       |  CAST(len(list_intersect(ta.t, tb.t)) AS DOUBLE) /
       |    len(list_distinct(list_concat(ta.t, tb.t))) AS jaccard
       |FROM pairs p
       |JOIN toks ta ON p.doc_a = ta.doc_id
       |JOIN toks tb ON p.doc_b = tb.doc_id
       |WHERE CAST(len(list_intersect(ta.t, tb.t)) AS DOUBLE) /
       |      len(list_distinct(list_concat(ta.t, tb.t))) >= 0.9
       |ORDER BY doc_a, doc_b""".stripMargin,
    headline = true) { (s, d) =>
    withJaccardToks(candidatePairsFromBands(indexedBands(s, d)), indexedShingleSets(s, d))
      .where(col("jaccard") >= 0.9)
      .orderBy("doc_a", "doc_b")
  }

  /** A second, sharper banding scheme oracle-checked end to end:
    * 8 hashes × 4 bands (r=2, threshold ≈ 0.71 with a much steeper
    * S-curve tail — higher recall at j≥0.9 at 2x signature cost).
    * Exercises the multi-digest path (2 salted md5s per shingle) that
    * the default single-digest scheme never touches. */
  private val sch8x4 = MinHashScheme(8, 4)

  val qDedupMinhash8x4: GraftQuery = GraftQuery(
    "q92_minhash_8x4_pairs",
    s"""WITH ${bandsCteFor(sch8x4)},
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       |   AND a.doc_id < b.doc_id),
       |toks AS (
       |  SELECT doc_id, $shinglesSql AS t FROM documents)
       |SELECT p.doc_a, p.doc_b,
       |  CAST(len(list_intersect(ta.t, tb.t)) AS DOUBLE) /
       |    len(list_distinct(list_concat(ta.t, tb.t))) AS jaccard
       |FROM pairs p
       |JOIN toks ta ON p.doc_a = ta.doc_id
       |JOIN toks tb ON p.doc_b = tb.doc_id
       |WHERE CAST(len(list_intersect(ta.t, tb.t)) AS DOUBLE) /
       |      len(list_distinct(list_concat(ta.t, tb.t))) >= 0.9
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    withJaccardToks(candidatePairsFromBands(indexedBands(s, d, sch8x4)),
        indexedShingleSets(s, d))
      .where(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** Incremental (batch-vs-corpus) near-dup detection, oracle-checked:
    * odd doc_ids play the arriving batch, even doc_ids the indexed
    * corpus. Each batch doc is flagged with its best corpus match at
    * jaccard ≥ 0.9 — the admission decision a curation pipeline makes
    * per ingest, costed against the index instead of the corpus. */
  val qDedupBatchVsCorpus: GraftQuery = GraftQuery(
    "q94_dedup_batch_vs_corpus",
    s"""WITH $bandsCte,
       |cand AS (
       |  SELECT DISTINCT b.doc_id AS doc_batch, c.doc_id AS doc_corpus
       |  FROM bands b JOIN bands c
       |    ON b.band_id = c.band_id AND b.band_hash = c.band_hash
       |  WHERE b.doc_id % 2 = 1 AND c.doc_id % 2 = 0),
       |toks AS (
       |  SELECT doc_id, $shinglesSql AS t FROM documents)
       |SELECT doc_batch, doc_corpus,
       |  CAST(len(list_intersect(tb.t, tc.t)) AS DOUBLE) /
       |    len(list_distinct(list_concat(tb.t, tc.t))) AS jaccard
       |FROM cand
       |JOIN toks tb ON doc_batch = tb.doc_id
       |JOIN toks tc ON doc_corpus = tc.doc_id
       |WHERE CAST(len(list_intersect(tb.t, tc.t)) AS DOUBLE) /
       |      len(list_distinct(list_concat(tb.t, tc.t))) >= 0.9
       |ORDER BY doc_batch, doc_corpus""".stripMargin) { (s, d) =>
    minhashBatchProbe(s, d, indexedCorpusBands(s, d))
  }

  /** The q94 corpus band index AS A STATED INDEX — rows are a filter
    * of the shared per-corpus signature index (already persisted), and
    * the per-bucket census is computed once and checkpointed with it,
    * so every probe pays zero corpus-side guard aggregates (the
    * jaccard-tier gstats discipline, r13). */
  private val corpusBandIndexMemo =
    new graft.spark.SessionMemo[String, BandIndex]("dedup.corpusBandIndex")(
      i => org.apache.spark.sql.graftshim.Checkpoints.release(i.bucketCounts))

  private[graft] def indexedCorpusBands(
      s: org.apache.spark.sql.SparkSession, d: String): BandIndex =
    corpusBandIndexMemo.getOrElseUpdate(s, d) {
      val rows = indexedBands(s, d).where(pmod(col("doc_id"), lit(2)) === 0)
      BandIndex(rows, bandBucketCounts(rows).localCheckpoint())
    }

  /** The q94 probe against a caller-supplied corpus BAND index —
    * factored so the STREAMING-maintained band index (q364) serves
    * the same probe plan as the batch-built one, with q94's oracle
    * proving both (the simhashBatchProbe discipline on the Jaccard
    * tier). The batch side signs fresh from the shared per-corpus
    * signature index; verification joins the shingle-set index, never
    * the corpus. The index's persisted bucket census feeds the flood
    * guard, so the probe never re-aggregates the corpus. */
  private[graft] def minhashBatchProbe(s: org.apache.spark.sql.SparkSession,
      d: String, corpus: BandIndex): DataFrame = {
    val pairs = crossCorpusCandidates(
      indexedBands(s, d).where(pmod(col("doc_id"), lit(2)) === 1),
      corpus, defaultBucketCap)
      .withColumnRenamed("doc_batch", "doc_a")
      .withColumnRenamed("doc_corpus", "doc_b")
    withJaccardToks(pairs, indexedShingleSets(s, d))
      .where(col("jaccard") >= 0.9)
      .select(col("doc_a").as("doc_batch"), col("doc_b").as("doc_corpus"),
        col("jaccard"))
      .orderBy("doc_batch", "doc_corpus")
  }

  /** Oracle SQL for the corpus half of the q94 split (the even-id band
    * index) — also the oracle of the STREAMING band-index maintenance
    * (q363), which must drain to this exact relation under any arrival
    * slicing. */
  private[graft] def minhashCorpusBandsSql: String =
    s"""WITH $bandsCte
       |SELECT doc_id, CAST(band_id AS INTEGER) AS band_id, band_hash
       |FROM bands WHERE doc_id % 2 = 0
       |ORDER BY doc_id, band_id""".stripMargin

  /** DuckDB rendering of the md5-60-bit SimHash (SimHashMd5): rebuild
    * each token's 60-bit value with exact BIGINT nibble arithmetic
    * (16^14 > 2^53, so float math would corrupt it), then 60 ±1-vote
    * aggregates and a bit-combine — generated, not handwritten. */
  private val simhashMd5Ctes: String = {
    val nibTerms = (0 until 15).map { i =>
      val mult = 1L << (4 * (14 - i)) // 16^(14-i), exact
      s"CAST(strpos('0123456789abcdef', substring(hx, ${i + 1}, 1)) - 1 AS BIGINT) * $mult"
    }.mkString(" + ")
    val votes = (0 until 60)
      .map(b => s"SUM(CASE WHEN (hv >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(", ")
    val combine = (0 until 60)
      .map(b => s"CASE WHEN s$b > 0 THEN CAST(${1L << b} AS BIGINT) ELSE 0 END")
      .mkString(" + ")
    s"""toks AS (
       |  SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS tok
       |  FROM documents),
       |hashed AS (SELECT doc_id, md5(tok) AS hx FROM toks),
       |vals AS (SELECT doc_id, $nibTerms AS hv FROM hashed),
       |votes AS (SELECT doc_id, $votes FROM vals GROUP BY doc_id),
       |sh AS (SELECT doc_id, $combine AS simhash FROM votes)""".stripMargin
  }

  private val simhashMd5Sql: String =
    s"""WITH $simhashMd5Ctes
       |SELECT doc_id, simhash FROM sh ORDER BY doc_id""".stripMargin

  /** SimHash fingerprints, oracle-checked end to end: the native
    * single-pass SimHashMd5 expression against DuckDB's from-scratch
    * rebuild of the same 60-bit bit-vote definition. (The murmur3
    * SimHash64 variant stays as the bench-fast form, covered by
    * ScalaTest equivalence against [[simhash64Composed]].) */
  val qDedupSimhash: GraftQuery = GraftQuery(
    "q29_dedup_simhash", simhashMd5Sql) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      org.apache.spark.sql.graftshim.SimHashMd5(
        TextFunctions.distinctTokens(lower(col("text")))).as("simhash"))
      .orderBy("doc_id")
  }

  /** Hamming tolerance of the q337 simhash near-miss tier: with the
    * 60-bit hash cut into four disjoint 15-bit sub-bands, pigeonhole
    * keeps banding lossless at h ≤ 3. */
  val simhashHammingMax = 3

  /** TEXT NEAR-MISS AT THE VALUE GRAIN — q334's census pattern
    * applied to q29's simhash tier, because big text corpora have
    * heavy simhash collisions exactly like the perceptual fixtures
    * (here one 60-bit value covers tens of docs): pairs of DISTINCT
    * simhash VALUES within hamming 1–[[simhashHammingMax]], each
    * carrying its census count, through the ONE parameterized
    * [[BandedHamming]] operator (shared with q331/q334/q335/q336).
    * The near-miss tier is what the bit-vote hash is FOR — a
    * one-token edit flips only the bits whose votes that token
    * decided — and the value grain keeps the output bounded by hash
    * entropy while collision clusters never cross-product.
    *
    * Banding: four disjoint 15-bit sub-bands of the 60-bit hash —
    * pigeonhole-lossless at h ≤ 3. The ORACLE is the plain all-pairs
    * value join over DuckDB's from-scratch bit-vote rebuild, so the
    * hash match proves BOTH the banded candidate generation's
    * completeness AND the underlying hash parity end to end.
    *
    * 100 TB: the value relation is one hash aggregate over the
    * fingerprints the dedup pass already computes; the band exchange
    * carries (band, 8-byte value, count) rows — entropy-bounded. */
  /** The ONE oracle statement of the q337/q343 value-pair semantics
    * (appended after [[simhashMd5Ctes]]): the simhash value census,
    * then ALL-PAIRS near-miss value pairs at hamming
    * 1..[[simhashHammingMax]], each side carrying its census count —
    * q337 selects it directly; q343 closes it transitively. One
    * string, so the pair definition cannot silently diverge between
    * the two oracles. */
  private def simhashValuePairsCtes: String =
    s"""svals AS (
       |  SELECT simhash, CAST(COUNT(*) AS BIGINT) AS n_docs
       |  FROM sh GROUP BY simhash),
       |vpairs AS (
       |  SELECT a.simhash AS fp_a, b.simhash AS fp_b,
       |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming,
       |    a.n_docs AS n_docs_a, b.n_docs AS n_docs_b
       |  FROM svals a JOIN svals b ON a.simhash < b.simhash
       |  WHERE bit_count(xor(a.simhash, b.simhash))
       |    BETWEEN 1 AND $simhashHammingMax)""".stripMargin

  /** The ONE simhash banding layout (four disjoint 15-bit sub-bands of
    * the 60-bit hash) shared by q337's pairs, q343's cluster edges,
    * the q345/q351 probes, and every index build's guard statistics —
    * the band geometry cannot silently diverge between them. */
  private[graft] val simhashScheme = BandedHamming.BandScheme(
    idCols = Seq("simhash"), fpCols = Seq("simhash"),
    bandExprs = BandedHamming.fixedBands(col("simhash"), 4, 15),
    hMax = simhashHammingMax)

  /** The q337/q343 simhash value census, hashed once per (session,
    * corpus) — the value relation IS the index (bundled with its
    * build-time guard statistics so re-invocations schedule no guard
    * aggregates), and it is localCheckpoint-backed (a plan barrier
    * with no CacheManager plan-identity entry), so eviction must go
    * through [[org.apache.spark.sql.graftshim.Checkpoints.release]]:
    * plain unpersist on a checkpointed frame is a silent no-op and
    * repeated invocations in one session would otherwise accumulate
    * unreleasable checkpoint blocks. */
  private val simhashValsIndex =
    new graft.spark.SessionMemo[String, BandedHamming.StatedIndex](
      "dedup.simhashValueCensus")(i =>
      org.apache.spark.sql.graftshim.Checkpoints.release(i.rows))

  /** The q337 value census + banded near-miss pairs, factored for the
    * q343 clustering composer. */
  private def simhashValueCensus(s: org.apache.spark.sql.SparkSession,
      d: String): BandedHamming.StatedIndex =
    simhashValsIndex.getOrElseUpdate(s, d)(
      simhashScheme.indexed(
        Tables.documents(s, d).select(
          org.apache.spark.sql.graftshim.SimHashMd5(
            TextFunctions.distinctTokens(lower(col("text")))).as("simhash"))
          .groupBy("simhash").agg(count(lit(1)).as("n_docs"))
          .localCheckpoint()))

  private def simhashValuePairs(vals: BandedHamming.StatedIndex): DataFrame =
    simhashScheme.pairsIndexed(vals, carry = Seq("n_docs"))

  val qSimhashNearDup: GraftQuery = GraftQuery(
    "q337_simhash_neardup_values",
    s"""WITH $simhashMd5Ctes,
       |$simhashValuePairsCtes
       |SELECT fp_a, fp_b, hamming, n_docs_a, n_docs_b
       |FROM vpairs
       |ORDER BY fp_a, fp_b""".stripMargin,
    // headline since r12 (verdict ask): the 10-query headline covered
    // no value-grain query, so round-over-round tracking skipped the
    // tier the project ships; q337 is the canonical banded value probe
    headline = true) { (s, d) =>
    simhashValuePairs(simhashValueCensus(s, d))
      .select(col("simhash_a").as("fp_a"), col("simhash_b").as("fp_b"),
        col("hamming"), col("n_docs_a"), col("n_docs_b"))
      .orderBy("fp_a", "fp_b")
  }

  /** Oracle SQL for the corpus half of the q345 split — also the
    * oracle of the STREAMING census maintenance (q350), which must
    * drain to this exact relation under any arrival slicing. */
  private[graft] def simhashCorpusCensusSql: String =
    s"""WITH $simhashMd5Ctes
       |SELECT simhash, CAST(COUNT(*) AS BIGINT) AS n_docs
       |FROM sh WHERE doc_id % 5 <> 4
       |GROUP BY simhash
       |ORDER BY simhash""".stripMargin

  /** Per-split simhash value census (the q337 census restricted to a
    * document predicate) — the batch/corpus halves of q345. */
  private def simhashValueCensusWhere(s: org.apache.spark.sql.SparkSession,
      d: String, cond: Column): DataFrame =
    Tables.documents(s, d).where(cond).select(
      org.apache.spark.sql.graftshim.SimHashMd5(
        TextFunctions.distinctTokens(lower(col("text")))).as("simhash"))
      .groupBy("simhash").agg(count(lit(1)).as("n_docs"))

  /** The CORPUS simhash value index, persisted once per (session,
    * corpus) with its build-time guard statistics — what a production
    * tier keeps next to the corpus so arriving batches never re-hash
    * OR re-aggregate it (the q94 posture). */
  private val simhashCorpusIndex =
    new graft.spark.SessionMemo[String, BandedHamming.StatedIndex](
      "dedup.simhashCorpusVals")(_.rows.unpersist(): Unit)

  /** The arriving batch's checkpointed value census (see q345's
    * builder note) with ITS build-time stats too — so a repeated probe
    * schedules no guard aggregates on either side; released through
    * Checkpoints (unpersist is a no-op on checkpointed frames). */
  private val simhashBatchIndex =
    new graft.spark.SessionMemo[String, BandedHamming.StatedIndex](
      "dedup.simhashBatchVals")(i =>
      org.apache.spark.sql.graftshim.Checkpoints.release(i.rows))

  /** INCREMENTAL SIMHASH NEAR-MISS — the q94 batch-vs-corpus shape on
    * the value grain: an arriving batch's distinct simhash values are
    * probed against the PERSISTED corpus value index through the same
    * [[BandedHamming]] banding (its cross-corpus form: batch `_a`
    * side, corpus `_b` side, no lexicographic dedup — the sides are
    * distinct universes). hMin = 0: an exact value hit against the
    * index is the strongest admission signal, and the tolerant tier
    * (1–3 flipped bits) catches the re-worded copies exact hashing
    * misses. The cost is O(batch values × bucket occupancy) — the
    * corpus is never re-paired against itself, which is the entire
    * point of incremental dedup. Oracle: the plain all-pairs
    * batch×corpus value join, so the hash match proves the banded
    * cross-corpus candidates are complete. */
  val qSimhashNearDupBatch: GraftQuery = GraftQuery(
    "q345_simhash_neardup_batch",
    s"""WITH $simhashMd5Ctes,
       |bvals AS (
       |  SELECT simhash, CAST(COUNT(*) AS BIGINT) AS n_docs
       |  FROM sh WHERE doc_id % 5 = 4 GROUP BY simhash),
       |cvals AS (
       |  SELECT simhash, CAST(COUNT(*) AS BIGINT) AS n_docs
       |  FROM sh WHERE doc_id % 5 <> 4 GROUP BY simhash)
       |SELECT b.simhash AS fp_batch, c.simhash AS fp_corpus,
       |  CAST(bit_count(xor(b.simhash, c.simhash)) AS INTEGER) AS hamming,
       |  b.n_docs AS n_docs_batch, c.n_docs AS n_docs_corpus
       |FROM bvals b JOIN cvals c
       |  ON bit_count(xor(b.simhash, c.simhash)) <= $simhashHammingMax
       |ORDER BY fp_batch, fp_corpus""".stripMargin) { (s, d) =>
    val corpusVals = simhashCorpusIndex.getOrElseUpdate(s, d)(
      simhashScheme.indexed(
        simhashValueCensusWhere(s, d, pmod(col("doc_id"), lit(5)) =!= 4)
          .persist()))
    simhashBatchProbe(s, d, corpusVals)
  }

  /** The q345 probe against a caller-supplied corpus value index —
    * factored so the STREAMING-maintained census (q351) serves the
    * same probe plan as the batch-built index, with q345's oracle
    * proving both. The batch census memoizes per corpus (the
    * fixture's "arriving batch" is deterministic per corpus — a
    * production caller keys by batch id and evicts per batch);
    * checkpoint blocks are released on eviction, not leaked. */
  private[graft] def simhashBatchProbe(s: org.apache.spark.sql.SparkSession,
      d: String, corpusVals: BandedHamming.StatedIndex): DataFrame = {
    val batchVals = simhashBatchIndex.getOrElseUpdate(s, d)(
      simhashScheme.indexed(
        simhashValueCensusWhere(s, d, pmod(col("doc_id"), lit(5)) === 4)
          .localCheckpoint()))
    simhashScheme.pairsIndexed(batchVals, carry = Seq("n_docs"),
      hMin = 0, rowsB = Some(corpusVals))
      .select(col("simhash_a").as("fp_batch"),
        col("simhash_b").as("fp_corpus"), col("hamming"),
        col("n_docs_a").as("n_docs_batch"),
        col("n_docs_b").as("n_docs_corpus"))
      .orderBy("fp_batch", "fp_corpus")
  }

  /** Value-node component labels for q343, built once per (session,
    * corpus); the persisted label relation is released on eviction. */
  private val simhashClusterIndex =
    new graft.spark.SessionMemo[String, DataFrame](
      "dedup.simhashValueCC")(_.unpersist(): Unit)

  /** NEAR-MISS CLUSTERS AT THE VALUE GRAIN — the q77 composition on
    * q337's output: near-miss is transitive in effect (A≈B and B≈C
    * put all three variants of one document family in play even when
    * hamming(A,C) > the pair bound), so curation acts on CLUSTERS.
    * Nodes are distinct simhash VALUES, edges the q337 banded pairs,
    * labels from the same iterative min-label propagation as q77 —
    * but over a value graph bounded by hash entropy, never corpus
    * size. Each value carries its census, so the output reads as the
    * DOC MASS per perceptual cluster (n_values variants, cluster_docs
    * total documents) — the number a dedup pass actually budgets
    * against. Singleton values (no near-miss edge) are their own
    * clusters, so the census re-sums to the corpus.
    *
    * Oracle: DuckDB recursive-CTE transitive closure over the
    * all-pairs value edges (the q77 discipline) — the hash match
    * proves banded pairs + distributed label propagation compose to
    * the same partition as brute-force reachability.
    *
    * 100 TB: the CC loop runs over |near-miss values| nodes — the
    * tiny tail of the value census — while the doc mass rides along
    * as an integer sum; no doc-grain row ever enters the loop. */
  val qSimhashNearDupClusters: GraftQuery = GraftQuery(
    "q343_simhash_neardup_clusters",
    s"""WITH RECURSIVE $simhashMd5Ctes,
       |$simhashValuePairsCtes,
       |vedges AS (
       |  SELECT fp_a AS a, fp_b AS b FROM vpairs
       |  UNION ALL SELECT fp_b, fp_a FROM vpairs),
       |vreach(n, m) AS (
       |  SELECT a, b FROM vedges
       |  UNION
       |  SELECT r.n, e.b FROM vreach r JOIN vedges e ON r.m = e.a),
       |vlbl AS (
       |  SELECT n AS simhash, least(n, MIN(m)) AS cluster_id
       |  FROM vreach GROUP BY n),
       |full_lbl AS (
       |  SELECT v.simhash, COALESCE(l.cluster_id, v.simhash) AS cluster_id,
       |    v.n_docs
       |  FROM svals v LEFT JOIN vlbl l ON l.simhash = v.simhash)
       |SELECT simhash, cluster_id,
       |  CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS INTEGER) AS n_values,
       |  CAST(SUM(n_docs) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_docs
       |FROM full_lbl
       |ORDER BY simhash""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val vals = simhashValueCensus(s, d)
    // the pair relation is checkpointed so the CC loop's lineage roots
    // HERE: the loop's generation-release (Checkpoints.release) frees
    // every LogicalRDD leaf under the label lineage, and without the
    // barrier that includes the census checkpoint the final join
    // still needs (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND otherwise)
    val labels = simhashClusterIndex.getOrElseUpdate(s, d) {
      val edges = simhashValuePairs(vals)
        .select(col("simhash_a").as("doc_a"), col("simhash_b").as("doc_b"))
        .localCheckpoint()
      val l = connectedComponents(edges)
      // the boundary barrier has served its purpose once the labels
      // are persisted and materialized (inside connectedComponents) —
      // release its blocks instead of leaking them per invocation
      org.apache.spark.sql.graftshim.Checkpoints.release(edges)
      l
    }
    val w = Window.partitionBy("cluster_id")
    vals.rows
      .join(labels.withColumnRenamed("node", "simhash"), Seq("simhash"), "left")
      .select(col("simhash"),
        coalesce(col("label"), col("simhash")).as("cluster_id"),
        col("n_docs"))
      .withColumn("n_values", count(lit(1)).over(w).cast("int"))
      .withColumn("cluster_docs", sum(col("n_docs")).over(w).cast("long"))
      .select("simhash", "cluster_id", "n_values", "cluster_docs")
      .orderBy("simhash")
  }

  /** Connected components over an undirected edge list by iterative
    * min-label propagation: each node adopts the smallest label among
    * itself and its neighbors until fixpoint. The driver loop only
    * controls ITERATION COUNT (bounded by component diameter); the data
    * never leaves the cluster — the standard Spark shape for iterative
    * graph algorithms. Edges here are the Jaccard-verified near-dup
    * pairs, which are tiny relative to the corpus by construction. */
  /** NOTE: the returned label relation is persisted (its lineage is
    * the whole iterative chain); the caller owns releasing it with
    * `.unpersist()` — q77 memoizes one per (session, corpus). */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    // the fixpoint loop runs many tiny jobs over the (small) pair set:
    // size its shuffle parallelism to the data, not the CPU count —
    // per-iteration scheduling overhead dominates otherwise. Restored
    // after the loop; batch queries keep their tuning. NOTE: the conf
    // is session-global, so a query running CONCURRENTLY on the same
    // SparkSession would be re-tuned mid-flight — safe under the
    // single-threaded driver harness; a multi-tenant driver should run
    // this on spark.newSession() (session-scoped conf, shared catalog).
    val partKey = "spark.sql.shuffle.partitions"
    val prevPartitions = spark.conf.get(partKey)
    spark.conf.set(partKey, "8")
    // the edge list is read 2x per iteration — persist it for the
    // duration of the fixpoint loop (released before returning; every
    // iteration's label relation is materialized by its convergence
    // check, so the final labels survive the unpersist)
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    // each generation is localCheckpoint-ed (not persist-ed): the next
    // label plan references the previous one ~2.5x (union + join + the
    // convergence check), so an un-truncated lineage grows
    // EXPONENTIALLY in iterations — by ~18 rounds the logical tree
    // alone renders to gigabytes and Catalyst analysis dwarfs
    // execution. Caching bounds the RUNTIME; only checkpointing
    // bounds the PLAN (same pattern as Bpe and StarComponents).
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    var converged = false
    var i = 0
    try while (!converged && i < maxIters) {
      // each node pulls the min label over {self} ∪ neighbors
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("node", "dst2"), col("dst") === col("dst2"))
        .select(col("src").as("node"), col("label"))
      val next = labels.select(col("node"), col("label"))
        .union(viaNeighbors)
        .groupBy("node").agg(min(col("label")).as("label"))
        .localCheckpoint()
      val changed = next.join(labels.withColumnRenamed("label", "old"), "node")
        .where(col("label") =!= col("old")).limit(1).count()
      // Checkpoints.release, not unpersist: a checkpointed frame's
      // unpersist() is a CacheManager no-op, its blocks would wait on GC
      org.apache.spark.sql.graftshim.Checkpoints.release(labels)
      labels = next
      converged = changed == 0
      i += 1
    } finally spark.conf.set(partKey, prevPartitions)
    // min-label propagation needs O(component diameter) rounds: a
    // silent partial result would surface only as wrong cluster ids,
    // so a non-converged exit is an error, never a return value —
    // with its cached relations released first (nobody owns them
    // after a throw)
    if (!converged) {
      edges.unpersist()
      org.apache.spark.sql.graftshim.Checkpoints.release(labels)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIters iterations " +
          "(component diameter exceeds maxIters)")
    }
    // the final generation is checkpoint-backed, so the caller's
    // contractual unpersist() wouldn't free it — re-expose it as a
    // CacheManager-persisted relation (built once from the checkpoint
    // blocks, which are then dropped).
    // Cluster-mode tradeoff: localCheckpoint truncated the lineage, so
    // once the underlying blocks are released the persisted labels
    // relation is UNRECOMPUTABLE — an executor loss after this point
    // fails the job instead of recomputing. Acceptable in local mode
    // (no executor churn); a multi-executor deployment should either
    // keep the checkpoint blocks (skip releaseUnderlying) or use
    // reliable checkpoint() to HDFS so recompute reads storage.
    // Same pattern/tradeoff in StarComponents.connectedComponentsStar.
    labels.persist()
    labels.count()
    org.apache.spark.sql.graftshim.Checkpoints.releaseUnderlying(labels)
    edges.unpersist()
    labels
  }

  /** Component labels per (session, corpus) — bounded like the other
    * indexes, so repeated q77 runs don't accumulate persisted loops. */
  private val componentIndex =
    new graft.spark.SessionMemo[String, DataFrame](
      "dedup.components")(_.unpersist(): Unit)

  /** Near-dup CLUSTERS: transitive closure of the verified pair set.
    * The drop-doc_b rule (q72) keeps per-pair minima; this yields the
    * canonical cluster id (= min doc_id in the component) and size —
    * the "keep one representative per cluster" contract a curation
    * pipeline actually wants. Oracle: DuckDB recursive CTE reachability. */
  /** The q77 label-derivation CTE chain (band join → jaccard verify →
    * recursive reachability → min-label), shared verbatim by q77 and
    * the representative-selection query (q161). */
  /** Jaccard-verified pair CTE chain (bands → candidates → verify) —
    * the SQL twin of [[verifiedPairs]], shared by the component and
    * PageRank oracles. */
  private[operators] val pairsCte: String =
    s"""$bandsCte,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       |   AND a.doc_id < b.doc_id),
       |toks AS (SELECT doc_id, $shinglesSql AS t FROM documents),
       |pairs AS (
       |  SELECT p.doc_a, p.doc_b
       |  FROM cand p
       |  JOIN toks ta ON p.doc_a = ta.doc_id
       |  JOIN toks tb ON p.doc_b = tb.doc_id
       |  WHERE CAST(len(list_intersect(ta.t, tb.t)) AS DOUBLE) /
       |        len(list_distinct(list_concat(ta.t, tb.t))) >= 0.9)""".stripMargin

  /** The Jaccard-verified near-dup pair relation (doc_a < doc_b),
    * from the shared band/shingle indexes. */
  private[operators] def verifiedPairs(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    withJaccardToks(candidatePairsFromBands(indexedBands(s, d)),
        indexedShingleSets(s, d))
      .where(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b")

  private val componentLblCte: String =
    s"""$pairsCte,
       |edges AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(n, m) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a),
       |lbl AS (
       |  SELECT n AS doc_id, least(n, MIN(m)) AS cluster_id
       |  FROM reach GROUP BY n)""".stripMargin

  /** The component-label CTE chain, shared with composers outside
    * this object (q326's dedup-aware mixture). */
  private[operators] def componentLblCteShared: String = componentLblCte

  /** Verified-pair connected-component labels (node, label), built
    * once per (session, corpus). */
  private[graft] def indexedComponents(
      s: org.apache.spark.sql.SparkSession, d: String): DataFrame =
    componentIndex.getOrElseUpdate(s, d)({
      val pairs = withJaccardToks(
          candidatePairsFromBands(indexedBands(s, d)), indexedShingleSets(s, d))
        .where(col("jaccard") >= 0.9)
        .select("doc_a", "doc_b")
      connectedComponents(pairs)
    })

  val qDedupComponents: GraftQuery = GraftQuery(
    "q77_dedup_components",
    s"""WITH RECURSIVE $componentLblCte
       |SELECT doc_id, cluster_id,
       |  CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS INTEGER) AS cluster_size
       |FROM lbl
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    indexedComponents(s, d).select(col("node").as("doc_id"), col("label").as("cluster_id"))
      .withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("cluster_id")).cast("int"))
      .orderBy("doc_id")
  }

  /** CROSS-SOURCE OVERLAP MATRIX: the provenance view of near-dup
    * pressure — which source pairs copy from each other, and how
    * hard. Verified ≥0.9-Jaccard pairs (the q28 relation, reused from
    * the session's persisted band/shingle indexes) are labeled with
    * each side's source and folded into an unordered (src_x ≤ src_y)
    * matrix cell; the diagonal is within-source duplication. This is
    * the report a curation team reads before deciding source
    * priorities and which side of a cross-source dup to keep (the
    * q07/q130 keep-rules act per-doc; this aggregates the phenomenon).
    *
    * 100 TB: the pair relation is LSH-bounded (band equi-join, never
    * doc × doc — the measured ~linear candidate growth in
    * docs/SCALE.md); attaching sources is two key-equi joins against
    * the compact (doc_id, source) projection, and the output is
    * bounded by |sources|² regardless of corpus size. min/max over
    * jaccard are order-independent (exact double compares), so the
    * matrix is deterministic under any parallelism. */
  val qSourceOverlap: GraftQuery = GraftQuery(
    "q154_source_overlap",
    s"""WITH $bandsCte,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       |   AND a.doc_id < b.doc_id),
       |toks AS (SELECT doc_id, $shinglesSql AS t FROM documents),
       |pairs AS (
       |  SELECT p.doc_a, p.doc_b,
       |    CAST(len(list_intersect(ta.t, tb.t)) AS DOUBLE) /
       |      len(list_distinct(list_concat(ta.t, tb.t))) AS jaccard
       |  FROM cand p
       |  JOIN toks ta ON p.doc_a = ta.doc_id
       |  JOIN toks tb ON p.doc_b = tb.doc_id
       |  WHERE CAST(len(list_intersect(ta.t, tb.t)) AS DOUBLE) /
       |        len(list_distinct(list_concat(ta.t, tb.t))) >= 0.9),
       |lab AS (
       |  SELECT least(da.source, db.source) AS src_x,
       |    greatest(da.source, db.source) AS src_y, p.jaccard
       |  FROM pairs p
       |  JOIN documents da ON p.doc_a = da.doc_id
       |  JOIN documents db ON p.doc_b = db.doc_id)
       |SELECT src_x, src_y, CAST(count(*) AS BIGINT) AS n_pairs,
       |  min(jaccard) AS min_j, max(jaccard) AS max_j
       |FROM lab GROUP BY src_x, src_y
       |ORDER BY src_x, src_y""".stripMargin) { (s, d) =>
    val pairs = withJaccardToks(
        candidatePairsFromBands(indexedBands(s, d)), indexedShingleSets(s, d))
      .where(col("jaccard") >= 0.9)
      .select("doc_a", "doc_b", "jaccard")
    val src = Tables.documents(s, d).select("doc_id", "source")
    pairs
      .join(src.toDF("doc_a", "src_a"), "doc_a")
      .join(src.toDF("doc_b", "src_b"), "doc_b")
      .select(least(col("src_a"), col("src_b")).as("src_x"),
        greatest(col("src_a"), col("src_b")).as("src_y"), col("jaccard"))
      .groupBy("src_x", "src_y")
      .agg(count(lit(1)).as("n_pairs"),
        min("jaccard").as("min_j"), max("jaccard").as("max_j"))
      .orderBy("src_x", "src_y")
  }

  /** BEST-OF-CLUSTER REPRESENTATIVE SELECTION: for every near-dup
    * cluster (q77's labels), keep the member with the highest learned
    * quality logit (q129's exact fixed-weight score; ties → lowest
    * doc_id) instead of the positional keep-first/keep-newest rules
    * (q07/q72) — when near-identical copies differ in boilerplate or
    * truncation, the curation pipeline should retain the cleanest one,
    * not the arbitrary first. Composes two independently-verified
    * fragments (component labels + bit-stable logits), so the whole
    * selection is oracle-hash-checked.
    *
    * 100 TB: labels come from the persisted component index (built
    * once — the q77 loop); logits are a scan-fused expression over
    * ONLY the clustered docs (key-equi semi-join first, corpus never
    * rescanned); the argmax is the TypedImperative TopKByScore k=1 —
    * ObjectHashAggregate with map-side partials, one tiny row per
    * cluster through the exchange (the declarative max_by-over-struct
    * alternative falls back to SortAggregate). */
  val qClusterRepresentatives: GraftQuery = GraftQuery(
    "q161_cluster_representatives",
    s"""WITH RECURSIVE $componentLblCte,
       |grams AS (
       |  ${TextVector.gramsSql}),
       |vecs AS (
       |  ${TextVector.vecSql}),
       |scored AS (
       |  SELECT doc_id, ${QualityGate.dotSql} AS logit FROM vecs),
       |mem AS (
       |  SELECT l.doc_id, l.cluster_id, s.logit
       |  FROM lbl l JOIN scored s USING (doc_id)),
       |ranked AS (
       |  SELECT cluster_id, doc_id, logit,
       |    row_number() OVER (PARTITION BY cluster_id
       |      ORDER BY logit DESC, doc_id) AS rn,
       |    COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
       |  FROM mem)
       |SELECT cluster_id, doc_id AS kept_doc,
       |  CAST(n_members AS INTEGER) AS n_members, logit AS kept_logit
       |FROM ranked WHERE rn = 1
       |ORDER BY cluster_id""".stripMargin) { (s, d) =>
    val labels = indexedComponents(s, d)
      .select(col("node").as("doc_id"), col("label").as("cluster_id"))
    // logits only for clustered docs: semi-restrict BEFORE the
    // 256-dim feature expression runs
    val scored = Tables.documents(s, d)
      .join(labels, "doc_id")
      .select(col("doc_id"), col("cluster_id"),
        QualityGate.logitOf(org.apache.spark.sql.graftshim.CharGramVector(
          col("text"), TextVector.dim)).as("logit"))
    scored.groupBy("cluster_id")
      .agg(org.apache.spark.sql.graftshim.TopKByScore(
          col("logit"), col("doc_id"), 1).as("top"),
        count(lit(1)).cast("int").as("n_members"))
      .select(col("cluster_id"),
        element_at(col("top"), 1).getField("id").as("kept_doc"),
        col("n_members"),
        element_at(col("top"), 1).getField("score").as("kept_logit"))
      .orderBy("cluster_id")
  }

  /** Hard cap on the banded-DP width: distances above this are never
    * materialized (Spark's 3-arg levenshtein returns -1 past the
    * threshold after an O(n·cap) banded pass instead of the full
    * O(n²) table). */
  val editDistCap = 64

  /** Relative edit-distance gate: a pair is a near-dup when
    * lev ≤ min(⌊0.2·max(len_a,len_b)⌋, [[editDistCap]]). */
  val editDistRel = 0.2

  /** Edit-distance-VERIFIED near-dup pairs — the other classical
    * verifier next to token-set Jaccard (q28): LSH candidates are
    * confirmed by character-level Levenshtein distance, the metric
    * that catches small in-place edits (typo floods, template fills)
    * which token-set Jaccard over-forgives when the edited tokens are
    * a tiny fraction of the set.
    *
    * 100 TB physics, in gate order:
    *  1. candidates come from the banded signature join (never
    *     all-pairs — the q27/q28 machinery, shared index);
    *  2. the LENGTH gate runs first: |len_a − len_b| ≤ bound is a
    *     necessary condition for lev ≤ bound and costs two ints —
    *     most non-dup candidates die before any DP;
    *  3. the DP itself is BANDED: Spark's threshold form costs
    *     O(n·min(bound, cap)) per surviving pair, not O(n²), and the
    *     cap bounds worst-case per-pair work no matter how long the
    *     documents grow. DuckDB has no banded form, so the oracle
    *     computes the full distance and applies the same bound —
    *     identical keep set, the -1 sentinel never escapes (pairs
    *     with lev > bound are dropped on both sides).
    *
    * Normalized distance is lev/max(len): one double division over
    * exact integers, correctly rounded identically in both engines. */
  val qEditDistPairs: GraftQuery = GraftQuery(
    "q168_editdist_pairs",
    s"""WITH $bandsCte,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       |   AND a.doc_id < b.doc_id),
       |sized AS (
       |  SELECT p.doc_a, p.doc_b,
       |    CAST(length(da.text) AS INTEGER) AS len_a,
       |    CAST(length(db.text) AS INTEGER) AS len_b,
       |    da.text AS ta, db.text AS tb,
       |    CAST(LEAST(FLOOR($editDistRel * GREATEST(length(da.text), length(db.text))),
       |               $editDistCap) AS INTEGER) AS bound
       |  FROM pairs p
       |  JOIN documents da ON p.doc_a = da.doc_id
       |  JOIN documents db ON p.doc_b = db.doc_id),
       |gated AS (
       |  SELECT doc_a, doc_b, len_a, len_b, bound,
       |    CAST(levenshtein(ta, tb) AS INTEGER) AS lev
       |  FROM sized
       |  WHERE abs(len_a - len_b) <= bound)
       |SELECT doc_a, doc_b, len_a, len_b, lev,
       |  CAST(lev AS DOUBLE) / GREATEST(len_a, len_b) AS nlev
       |FROM gated
       |WHERE lev <= bound
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("text"), length(col("text")).as("len"))
    val sized = candidatePairsFromBands(indexedBands(s, d))
      .join(docs.select(col("doc_id").as("doc_a"), col("text").as("ta"),
        col("len").as("len_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("text").as("tb"),
        col("len").as("len_b")), "doc_b")
      .withColumn("bound",
        least(floor(greatest(col("len_a"), col("len_b")) * editDistRel),
          lit(editDistCap.toLong)).cast("int"))
      .where(abs(col("len_a") - col("len_b")) <= col("bound"))
    sized
      .withColumn("lev", levenshtein(col("ta"), col("tb"), editDistCap))
      // -1 means "> cap": since bound ≤ cap, lev in [0, bound] is the
      // exact keep condition and never sees the sentinel
      .where(col("lev") >= 0 && col("lev") <= col("bound"))
      .select(col("doc_a"), col("doc_b"), col("len_a"), col("len_b"),
        col("lev"),
        (col("lev").cast("double") / greatest(col("len_a"), col("len_b"))).as("nlev"))
      .orderBy("doc_a", "doc_b")
  }

  /** Integer-exponent power as an EXPLICIT square-and-multiply chain,
    * mirrored structurally in [[powSql]]: both engines then execute
    * the identical sequence of correctly-rounded multiplications, so
    * the result is bit-identical — unlike pow(), whose libm varies. */
  private def powChain(x: Column, n: Int): Column =
    if (n == 1) x
    else if (n % 2 == 0) { val h = powChain(x, n / 2); h * h }
    else powChain(x, n - 1) * x

  private def powSql(x: String, n: Int): String =
    if (n == 1) x
    else if (n % 2 == 0) { val h = powSql(x, n / 2); s"($h * $h)" }
    else s"(${powSql(x, n - 1)} * $x)"

  /** Design candidates the planner tabulates: the two schemes the
    * catalog actually runs (4×2, 8×4) plus two sharper r=4 designs. */
  val plannerSchemes: Seq[MinHashScheme] =
    Seq(MinHashScheme(4, 2), MinHashScheme(8, 4),
      MinHashScheme(16, 4), MinHashScheme(32, 8))

  /** LSH S-CURVE PLANNER — the design table behind every banding
    * choice in this file: P(candidate | jaccard j) = 1 − (1 − j^r)^b
    * tabulated on a j-grid for each candidate scheme, with the
    * curve's inflection (1/b)^(1/r). Choosing (r, b) IS the dedup
    * policy decision (where the S-curve puts its cliff = which
    * similarity level gets recalled vs filtered), and at 100 TB you
    * make it from this table, not by re-running the corpus.
    *
    * Exactness discipline: j = k/20 (one correctly-rounded division),
    * powers are explicit square-and-multiply chains (identical op
    * sequence in both engines — pow()'s libm is NOT bit-specified),
    * and the inflection uses nested IEEE sqrt for r ∈ {2, 4}. No
    * table scan at all — the relation is the design grid itself. */
  val qLshPlanner: GraftQuery = GraftQuery(
    "q178_lsh_planner", {
      val grid = (1 to 19).map(k => s"($k)").mkString(", ")
      val selects = plannerSchemes.map { sch =>
        val j = "(CAST(k AS DOUBLE) / 20)"
        val jr = powSql(j, sch.rowsPerBand)
        val miss = s"(CAST(1 AS DOUBLE) - $jr)"
        val p = s"(CAST(1 AS DOUBLE) - ${powSql(miss, sch.bands)})"
        val inflect = sch.rowsPerBand match {
          case 2 => s"sqrt(CAST(1 AS DOUBLE) / ${sch.bands})"
          case 4 => s"sqrt(sqrt(CAST(1 AS DOUBLE) / ${sch.bands}))"
        }
        s"""SELECT ${sch.numHashes} AS num_hashes, ${sch.bands} AS bands,
           |  ${sch.rowsPerBand} AS rows_per_band,
           |  $j AS jaccard, $p AS p_candidate, $inflect AS inflection
           |FROM grid""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH grid AS (SELECT * FROM (VALUES $grid) AS g(k))
         |$selects
         |ORDER BY num_hashes, bands, jaccard""".stripMargin
    }) { (s, d) =>
    import s.implicits._
    plannerSchemes.map { sch =>
      val grid = (1 to 19).toDF("k")
      val j = col("k").cast("double") / 20
      val jr = powChain(j, sch.rowsPerBand)
      val p = lit(1.0) - powChain(lit(1.0) - jr, sch.bands)
      val inflect = sch.rowsPerBand match {
        case 2 => sqrt(lit(1.0) / sch.bands)
        case 4 => sqrt(sqrt(lit(1.0) / sch.bands))
      }
      grid.select(
        lit(sch.numHashes).as("num_hashes"), lit(sch.bands).as("bands"),
        lit(sch.rowsPerBand).as("rows_per_band"),
        j.as("jaccard"), p.as("p_candidate"), inflect.as("inflection"))
    }.reduce(_ unionByName _)
      .orderBy("num_hashes", "bands", "jaccard")
  }

  /** NEAR-DUP PAIR EXPLANATION — the review surface behind the
    * dedup decisions: for every Jaccard-verified pair, where the two
    * texts actually differ, as exact character geometry — common
    * prefix (lcp), common suffix capped so it cannot overlap the
    * prefix, and each side's edited middle span. A curator auditing
    * "why were these merged" reads this, not raw text diffs.
    *
    * Mechanics (both engines, pure integer/array ops): char-split,
    * null-safe pairwise equality over the zipped arrays (length
    * mismatch pads with NULL → false), lcp = first-false position
    * (identical strings have none → lcp = full length), lcs = same on
    * the reversed strings, then lcs is clamped to min(len)−lcp so
    * prefix and suffix never double-count a shared region.
    *
    * 100 TB: runs on the verified PAIR relation (tiny relative to the
    * corpus — the q28 physics), two text joins, per-row array work
    * bounded by document length. */
  val qDupExplain: GraftQuery = GraftQuery(
    "q189_dup_explain",
    s"""WITH $pairsCte,
       |texts AS (
       |  SELECT p.doc_a, p.doc_b, da.text AS ta, db.text AS tb
       |  FROM pairs p
       |  JOIN documents da ON p.doc_a = da.doc_id
       |  JOIN documents db ON p.doc_b = db.doc_id),
       |pos AS (
       |  SELECT doc_a, doc_b,
       |    CAST(length(ta) AS BIGINT) AS len_a,
       |    CAST(length(tb) AS BIGINT) AS len_b,
       |    list_position(list_transform(
       |      list_zip(string_split(ta, ''), string_split(tb, '')),
       |      z -> COALESCE(z[1] = z[2], false)), false) AS p_lcp,
       |    list_position(list_transform(
       |      list_zip(string_split(reverse(ta), ''), string_split(reverse(tb), '')),
       |      z -> COALESCE(z[1] = z[2], false)), false) AS p_lcs
       |  FROM texts),
       |geom AS (
       |  -- not-found renders as 0 OR NULL depending on DuckDB version:
       |  -- either way the strings are identical -> lcp = full length
       |  SELECT doc_a, doc_b, len_a, len_b,
       |    CASE WHEN COALESCE(p_lcp, 0) = 0 THEN len_a ELSE p_lcp - 1 END AS lcp,
       |    CASE WHEN COALESCE(p_lcs, 0) = 0 THEN len_a ELSE p_lcs - 1 END AS lcs_raw
       |  FROM pos)
       |SELECT doc_a, doc_b, len_a, len_b,
       |  CAST(lcp AS BIGINT) AS lcp,
       |  CAST(LEAST(lcs_raw, LEAST(len_a, len_b) - lcp) AS BIGINT) AS lcs,
       |  CAST(len_a - lcp - LEAST(lcs_raw, LEAST(len_a, len_b) - lcp) AS BIGINT) AS mid_a,
       |  CAST(len_b - lcp - LEAST(lcs_raw, LEAST(len_a, len_b) - lcp) AS BIGINT) AS mid_b
       |FROM geom
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    def firstDiff(a: Column, b: Column, fullLen: Column): Column = {
      val eq = zip_with(split(a, ""), split(b, ""), (x, y) => x <=> y)
      val pos = array_position(eq, false)
      when(pos === 0, fullLen).otherwise(pos - 1)
    }
    verifiedPairs(s, d)
      .join(docs.select(col("doc_id").as("doc_a"), col("text").as("ta")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("text").as("tb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        length(col("ta")).cast("long").as("len_a"),
        length(col("tb")).cast("long").as("len_b"),
        firstDiff(col("ta"), col("tb"), length(col("ta")).cast("long")).as("lcp"),
        firstDiff(reverse(col("ta")), reverse(col("tb")),
          length(col("ta")).cast("long")).as("lcs_raw"))
      .withColumn("lcs",
        least(col("lcs_raw"), least(col("len_a"), col("len_b")) - col("lcp")))
      .select(col("doc_a"), col("doc_b"), col("len_a"), col("len_b"),
        col("lcp"), col("lcs"),
        (col("len_a") - col("lcp") - col("lcs")).as("mid_a"),
        (col("len_b") - col("lcp") - col("lcs")).as("mid_b"))
      .orderBy("doc_a", "doc_b")
  }

  /** Containment scoring of a candidate pair relation: the ASYMMETRIC
    * near-dup measure `|A∩B| / |A|` per side. Symmetric Jaccard (q28)
    * misses the short-inside-long shape — a paragraph fully quoted
    * inside a 10× longer page scores jaccard ≈ 0.1 but containment
    * 1.0 on the short side; that shape is exactly what quote-farms and
    * wrapper pages produce. Shared by q201 and the planted spec. */
  def containmentScored(pairs: DataFrame, toks: DataFrame): DataFrame =
    pairs
      .join(toks.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("toks", "toks_a"), "doc_a")
      .join(toks.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("toks", "toks_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("toks_a"), col("toks_b"))).as("n_inter"),
        size(col("toks_a")).as("n_a"),
        size(col("toks_b")).as("n_b"))

  /** CONTAINMENT pairs: band candidates whose SMALLER shingle set is
    * ≥ 90% covered by the other side — `10·|A∩B| >= 9·min(|A|,|B|)`,
    * exact integers (the emitted per-side ratios are single IEEE
    * divisions). Candidate generation reuses the session's persisted
    * band index, so the marginal cost over q28 is one projection per
    * verified pair.
    *
    * Recall caveat, stated honestly: MinHash band collision probability
    * tracks SYMMETRIC Jaccard, so a 10×-length-skewed containment pair
    * (jaccard ≈ 0.1) rarely collides — this query catches the
    * moderately-skewed shapes the band index already surfaces. The
    * extreme-skew fix is BUILT as [[qContainmentSkew]] (q305): the
    * shorter side's whole-doc signature banded against per-chunk
    * signatures, feeding this same verify stage. */
  val qContainmentPairs: GraftQuery = GraftQuery(
    "q201_containment_pairs",
    s"""WITH $bandsCte,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       |   AND a.doc_id < b.doc_id),
       |toks AS (
       |  SELECT doc_id, $shinglesSql AS t FROM documents),
       |scored AS (
       |  SELECT c.doc_a, c.doc_b,
       |    CAST(len(list_intersect(ta.t, tb.t)) AS INTEGER) AS n_inter,
       |    CAST(len(ta.t) AS INTEGER) AS n_a,
       |    CAST(len(tb.t) AS INTEGER) AS n_b
       |  FROM cand c
       |  JOIN toks ta ON c.doc_a = ta.doc_id
       |  JOIN toks tb ON c.doc_b = tb.doc_id)
       |SELECT doc_a, doc_b, n_inter, n_a, n_b,
       |  CAST(n_inter AS DOUBLE) / n_a AS cont_a,
       |  CAST(n_inter AS DOUBLE) / n_b AS cont_b
       |FROM scored
       |WHERE 10 * n_inter >= 9 * least(n_a, n_b)
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    containmentScored(
        candidatePairsFromBands(indexedBands(s, d)), indexedShingleSets(s, d))
      .where(col("n_inter") * 10 >= least(col("n_a"), col("n_b")) * 9)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_a"), col("n_b"),
        (col("n_inter").cast("double") / col("n_a")).as("cont_a"),
        (col("n_inter").cast("double") / col("n_b")).as("cont_b"))
      .orderBy("doc_a", "doc_b")
  }

  /** Chunk-grain LSH bands: every q122 chunk (200-cp window, stride
    * 150) of every doc signed as if it were a document — the substrate
    * that makes SHORT-INSIDE-LONG containment findable. A long doc's
    * whole-doc minhashes are dominated by its unshared mass, so a
    * 20:1-skewed contained pair (jaccard ≈ 0.05) essentially never
    * collides in q201's doc×doc bands; but a chunk interior to the
    * quoted span shares (nearly) its whole shingle set with the short
    * doc, so short-doc bands × chunk bands collide at the chunk's own
    * jaccard, independent of the long doc's total length. */
  def chunkBandsOf(docs: DataFrame,
      sch: MinHashScheme = MinHashScheme.default): DataFrame =
    docBands(TrainingPipeline.chunkRelationOf(docs)
      .select(col("doc_id"), col("chunk").as("text")), sch)

  private val chunkBandsIndex =
    new graft.spark.SessionMemo[String, DataFrame](
      "dedup.chunkbands")(_.unpersist(): Unit)

  def indexedChunkBands(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): DataFrame =
    chunkBandsIndex.getOrElseUpdate(spark, sfDir)(
      chunkBandsOf(Tables.documents(spark, sfDir)).persist())

  /** Length-skew containment candidates: whole-doc bands (the shorter
    * side's natural signature) joined against chunk bands on the band
    * key — directional hits normalized to (doc_a < doc_b) pairs. One
    * equi-join on the band hash, exactly q28's physics; the chunk side
    * is ~len/150 rows per doc. */
  def skewCandidatePairs(wholeBands: DataFrame, chunkBands: DataFrame): DataFrame =
    wholeBands.as("a").join(chunkBands.as("c"),
        col("a.band_id") === col("c.band_id") &&
        col("a.band_hash") === col("c.band_hash") &&
        col("a.doc_id") =!= col("c.doc_id"))
      .select(least(col("a.doc_id"), col("c.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("c.doc_id")).as("doc_b"))
      .distinct()

  /** q201's exact asymmetric verification gate, shared with q305. */
  private def containmentGate(scored: DataFrame): DataFrame =
    scored
      .where(col("n_inter") * 10 >= least(col("n_a"), col("n_b")) * 9)
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_a"), col("n_b"),
        (col("n_inter").cast("double") / col("n_a")).as("cont_a"),
        (col("n_inter").cast("double") / col("n_b")).as("cont_b"))
      .orderBy("doc_a", "doc_b")

  private def chunkBandsCteSql(sch: MinHashScheme): String = {
    val unions = (0 until sch.bands).map(b =>
      s"SELECT doc_id, $b AS band_id, ${bandSqlFromDigests(b, sch)} AS band_hash FROM chunk_sigs")
      .mkString("\n    UNION ALL\n    ")
    s"""chunk_sigs AS (
       |  SELECT doc_id, list_transform(${shinglesSqlFor("chunk")}, w -> ${sch.digestsSql("w")}) AS m
       |  FROM chunks),
       |chunk_bands AS (
       |  SELECT doc_id, band_id, band_hash FROM (
       |    $unions))""".stripMargin
  }

  /** CONTAINMENT UNDER EXTREME LENGTH SKEW — the recall fix q201's
    * scaladoc prescribes, built: band the shorter side's WHOLE-doc
    * signature against per-CHUNK signatures (q122's 200-cp windows)
    * of every doc, then run the identical exact verification gate.
    * A spec plants a ~20:1 contained pair that q201's doc×doc bands
    * provably miss and this query catches with cont = 1.0 on the
    * short side.
    *
    * 100 TB: the chunk side multiplies band rows by ~len/150 — still
    * one equi-join on the band hash (q28's physics), no all-pairs
    * anywhere; verification reuses the session's persisted shingle
    * index, one projection per surviving candidate. The oracle
    * rebuilds chunking, chunk banding, and the exact containment
    * arithmetic from scratch in SQL. */
  val qContainmentSkew: GraftQuery = GraftQuery(
    "q305_containment_skew",
    s"""WITH $bandsCte,
       |${TrainingPipeline.chunksCteSql},
       |${chunkBandsCteSql(MinHashScheme.default)},
       |cand AS (
       |  SELECT DISTINCT least(a.doc_id, c.doc_id) AS doc_a,
       |    greatest(a.doc_id, c.doc_id) AS doc_b
       |  FROM bands a JOIN chunk_bands c
       |    ON a.band_id = c.band_id AND a.band_hash = c.band_hash
       |   AND a.doc_id <> c.doc_id),
       |toks AS (
       |  SELECT doc_id, $shinglesSql AS t FROM documents),
       |scored AS (
       |  SELECT c.doc_a, c.doc_b,
       |    CAST(len(list_intersect(ta.t, tb.t)) AS INTEGER) AS n_inter,
       |    CAST(len(ta.t) AS INTEGER) AS n_a,
       |    CAST(len(tb.t) AS INTEGER) AS n_b
       |  FROM cand c
       |  JOIN toks ta ON c.doc_a = ta.doc_id
       |  JOIN toks tb ON c.doc_b = tb.doc_id)
       |SELECT doc_a, doc_b, n_inter, n_a, n_b,
       |  CAST(n_inter AS DOUBLE) / n_a AS cont_a,
       |  CAST(n_inter AS DOUBLE) / n_b AS cont_b
       |FROM scored
       |WHERE 10 * n_inter >= 9 * least(n_a, n_b)
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    containmentGate(containmentScored(
      skewCandidatePairs(indexedBands(s, d), indexedChunkBands(s, d)),
      indexedShingleSets(s, d)))
  }

  /** EFFECTIVE DATASET SIZE under soft dedup — the data-vendor
    * scorecard: instead of DROPPING near-dups, weight every document
    * by 1/|its near-dup cluster| (the soft-dedup / repetition-
    * reweighting ablation from the SemDeDup line of work) and report
    * per-source totals: raw docs, clustered docs, and the effective
    * ppm-weighted size. A source whose effective size is far below
    * its raw size is selling copies. Weights are exact integer ppm
    * (1000000 div cluster_size — clusters have ≥ 2 members, singletons
    * weigh 1000000), so the report is bit-deterministic.
    *
    * 100 TB: cluster labels come from the persisted component index
    * (built once — the q77 loop over the LSH-bounded pair relation);
    * sizes are a census over that pair-bounded relation; both
    * broadcast back onto one narrow corpus projection. */
  val qEffectiveSize: GraftQuery = GraftQuery(
    "q321_effective_dataset_size",
    s"""WITH RECURSIVE $componentLblCte,
       |sizes AS (
       |  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS csize
       |  FROM lbl GROUP BY cluster_id),
       |docw AS (
       |  SELECT d.doc_id, d.source,
       |    l.doc_id IS NOT NULL AS clustered,
       |    COALESCE(1000000 // s.csize, 1000000) AS w_ppm
       |  FROM documents d
       |  LEFT JOIN lbl l ON d.doc_id = l.doc_id
       |  LEFT JOIN sizes s ON l.cluster_id = s.cluster_id)
       |SELECT source,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN clustered THEN 1 ELSE 0 END) AS BIGINT) AS n_clustered,
       |  CAST(SUM(w_ppm) AS BIGINT) AS effective_ppm
       |FROM docw GROUP BY source
       |ORDER BY source""".stripMargin) { (s, d) =>
    val labels = indexedComponents(s, d)
      .select(col("node").as("doc_id"), col("label").as("cluster_id"))
    val sizes = labels.groupBy("cluster_id").agg(count(lit(1)).as("csize"))
    Tables.documents(s, d).select("doc_id", "source")
      .join(broadcast(labels.withColumn("clustered", lit(true))), Seq("doc_id"), "left")
      .join(broadcast(sizes), Seq("cluster_id"), "left")
      .select(col("source"),
        coalesce(col("clustered"), lit(false)).as("clustered"),
        coalesce(expr("1000000 div csize"), lit(1000000L)).as("w_ppm"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("clustered"), 1L).otherwise(0L)).as("n_clustered"),
        sum("w_ppm").as("effective_ppm"))
      .orderBy("source")
  }

  /** Tombstone rule for q212: every 97th doc is deleted. */
  val deleteModulus = 97L

  /** DELETE PROPAGATION THROUGH THE PERSISTED INDEX — the
    * right-to-be-forgotten operation for a dedup pipeline: when docs
    * are purged from the corpus, every derived index (here the LSH
    * band signature table, the q27/q28/q94 substrate) must forget
    * them too, WITHOUT re-shingling the surviving 100 TB. The engine
    * side answers the q27 bucket census from the PERSISTED band index
    * with the tombstone set anti-joined away; the oracle REBUILDS the
    * bands from the purged corpus from scratch. A hash match is the
    * proof that filter-the-index ≡ rebuild-from-purged-corpus — valid
    * because band signatures are per-document (no cross-doc state),
    * which is exactly the index-design property that makes deletes
    * cheap, and exactly what this query certifies every round.
    *
    * 100 TB: the tombstone relation is deletion-request-sized —
    * broadcast anti-join against the index scan; no shingling, no
    * signature recompute, no corpus read at all. The census rollup is
    * the same map-side-combinable aggregate as q27. */
  val qDeletePropagation: GraftQuery = GraftQuery(
    "q212_delete_propagation",
    s"""WITH ${bandsCteFor(MinHashScheme.default,
        s"WHERE doc_id % $deleteModulus <> 0")}
       |SELECT band_id, band_hash, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc
       |FROM bands
       |GROUP BY band_id, band_hash
       |HAVING COUNT(*) > 1
       |ORDER BY band_id, band_hash""".stripMargin) { (s, d) =>
    val tombstones = Tables.documents(s, d)
      .where(pmod(col("doc_id"), lit(deleteModulus)) === 0)
      .select("doc_id")
    indexedBands(s, d)
      .join(broadcast(tombstones), Seq("doc_id"), "left_anti")
      .groupBy("band_id", "band_hash")
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
      .where(col("n_docs") > 1)
      .orderBy("band_id", "band_hash")
  }

  def all: Seq[GraftQuery] = Seq(
    qDedupExact, qDedupMinhashBuckets, qDedupMinhashPairs, qDedupSimhash,
    qSimhashNearDup, qSimhashNearDupClusters, qSimhashNearDupBatch,
    qDedupComponents, qDedupMinhash8x4, qDedupBatchVsCorpus, qSourceOverlap,
    qClusterRepresentatives, qEditDistPairs, qLshPlanner, qDupExplain,
    qContainmentPairs, qContainmentSkew, qEffectiveSize, qDeletePropagation)
}
