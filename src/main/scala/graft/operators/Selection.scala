package graft.operators

import graft.GraftQuery
import graft.functions.TextFunctions.tokenCount
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-selection operators for an LLM training-data pipeline: the
  * steps that decide WHICH documents (and how much of each domain) a
  * training run consumes, beyond the per-document quality/dedup gates
  * (Dedup, CurationFunnel, QualityGate). No counterpart exists in the
  * reference (Data-ETL-with-DBT stops at the modeled table,
  * core_texi.sql:31-101); these extend the north-star corpus-assembly
  * surface (SURVEY §0) with three published selection families:
  *
  *  - q150: DSIR-style importance resampling (Xie et al., "Data
  *    Selection for Language Models via Importance Resampling",
  *    NeurIPS 2023): hashed-unigram bag-of-words distributions for a
  *    target domain vs the raw proposal corpus, per-document
  *    importance weights, hash-gated sampling proportional to weight.
  *  - q151: count-min sketch frequency estimation (Cormode &
  *    Muthukrishnan 2005): the bounded-memory substitute for exact
  *    token counts that a 100 TB vocabulary pass needs.
  *  - q152: cluster-balanced token budgeting: the q137 exact budget
  *    gate keyed by embedding-space IVF cell instead of language —
  *    semantic domain balancing in the MiniPile/cluster-mixing vein.
  *
  * Determinism discipline (the q137/q63 conventions): every sampling
  * decision is a pure function of md5(doc_id); every score is exact
  * integer arithmetic (DECIMAL(38,0) ↔ HUGEINT cross-multiplies, and
  * floor-divided rational likelihood ratios instead of log-space
  * weights — ln() is not bit-specified across libm implementations,
  * while the scaled rational ratio is engine-stable and order-free).
  * Production would keep log-space weights; the selection ORDER the
  * two scores induce is the same because x ↦ scale·x is monotone and
  * the per-token sum approximates the log-sum's ranking closely at
  * this bucket width — the tradeoff is documented here once.
  *
  * 100 TB scale notes:
  *  - q150 is two bounded aggregates (256-bucket LM tables, broadcast
  *    back) plus one partial-aggregatable per-doc sum: the token
  *    explosion is scanned once, nothing corpus-sized shuffles except
  *    the (doc_id, partial-sum) rows.
  *  - q151's sketch is ≤ depth×width rows REGARDLESS of corpus size —
  *    map-side partial aggregation collapses each scan partition's
  *    tokens into ≤2048 counter rows before the exchange. The exact
  *    top-20 relation exists only to oracle-check the estimator;
  *    production serves point queries from the sketch alone.
  *  - q152 reuses the [[IvfAnn.assign]] scan-fused centroid
  *    assignment (no N×C join) and the q137 zero-division budget
  *    gate; the only corpus-sized exchange is the doc↔embedding key
  *    join, co-partitioned on the shared id.
  */
object Selection {

  private val B = 256 // hashed-unigram buckets (DSIR's feature space)
  private val Scale = 1000000L // likelihood-ratio fixed-point scale

  private def dec(c: Column): Column = c.cast("decimal(38,0)")

  /** 32-bit md5 gate (q137's convention — first 8 md5 hex chars). */
  private def gate32(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")

  /** Per-document DSIR importance scores against a target predicate.
    *
    * Both unigram LMs come out of ONE aggregate over the exploded
    * tokens (conditional count for the target side — the target is a
    * subset of the proposal, so c_t ≤ c_p and the Laplace-smoothed
    * ratio is bounded by (T_p+B)/(T_t+B)). The per-bucket importance
    * ratio is floor(Scale·(c_t+1)(T_p+B) / ((c_p+1)(T_t+B))) in
    * DECIMAL(38,0) — exact at any corpus size. A document's score is
    * the plain integer sum of its tokens' bucket ratios; avg_r
    * divides by token count (floor) so long documents aren't favored.
    */
  private[graft] def dsirScores(docs: DataFrame, isTarget: Column): DataFrame = {
    val toks = docs
      .select(col("doc_id"), isTarget.as("is_t"),
        explode(split(lower(col("text")), " ")).as("term"))
      .withColumn("b", conv(substring(md5(col("term")), 1, 2), 16, 10).cast("int"))
    val buckets = toks.groupBy("b").agg(
      count(lit(1)).as("c_p"),
      count(when(col("is_t"), 1)).as("c_t"))
    val totals = buckets.agg(sum("c_p").as("t_p"), sum("c_t").as("t_t"))
    val ratio = buckets.crossJoin(broadcast(totals))
      .withColumn("r", expr(
        s"""CAST((CAST(c_t + 1 AS DECIMAL(38,0)) * CAST(t_p + $B AS DECIMAL(38,0))
           |  * $Scale)
           |  DIV (CAST(c_p + 1 AS DECIMAL(38,0)) * CAST(t_t + $B AS DECIMAL(38,0)))
           |  AS BIGINT)""".stripMargin))
      .select("b", "r")
    toks.join(broadcast(ratio), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"), sum("r").as("score"))
      .withColumn("avg_r", expr("score DIV n_tok"))
  }

  /** DSIR importance resampling: target = sources src0/src1 (the
    * "trusted domain" stand-in), proposal = the whole corpus. A doc
    * is kept with probability avg_r / max(avg_r), decided by the
    * exact cross-multiplied hash gate h·max < 2³²·avg_r — sampling
    * proportional to importance weight with zero coordination (the
    * max is a 1-row broadcast; the gate is then scan-fused). */
  val qDsirSelect: GraftQuery = GraftQuery(
    "q150_dsir_select",
    s"""WITH toks AS (
       |  SELECT doc_id, source IN ('src0', 'src1') AS is_t,
       |    unnest(string_split(lower(text), ' ')) AS term
       |  FROM documents),
       |tb AS (
       |  SELECT CAST('0x' || substring(md5(term), 1, 2) AS INTEGER) AS b,
       |    doc_id, is_t
       |  FROM toks),
       |buckets AS (
       |  SELECT b, CAST(count(*) AS BIGINT) AS c_p,
       |    CAST(count(*) FILTER (is_t) AS BIGINT) AS c_t
       |  FROM tb GROUP BY b),
       |totals AS (
       |  SELECT CAST(sum(c_p) AS BIGINT) AS t_p,
       |    CAST(sum(c_t) AS BIGINT) AS t_t FROM buckets),
       |ratio AS (
       |  SELECT b,
       |    CAST(CAST(c_t + 1 AS HUGEINT) * CAST(t_p + $B AS HUGEINT) * $Scale
       |      // (CAST(c_p + 1 AS HUGEINT) * CAST(t_t + $B AS HUGEINT))
       |      AS BIGINT) AS r
       |  FROM buckets CROSS JOIN totals),
       |scored AS (
       |  SELECT tb.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
       |    CAST(sum(r) AS BIGINT) AS score
       |  FROM tb JOIN ratio USING (b)
       |  GROUP BY tb.doc_id),
       |sc AS (SELECT doc_id, n_tok, score, score // n_tok AS avg_r FROM scored),
       |mx AS (SELECT max(avg_r) AS max_avg FROM sc)
       |SELECT doc_id, n_tok, score, avg_r
       |FROM sc CROSS JOIN mx
       |WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
       |    * CAST(max_avg AS HUGEINT) < CAST(4294967296 AS HUGEINT) * avg_r
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    // repartition the COMPACT doc relation before the token explosion
    // (the q63 pattern): full parallelism even off one big row group
    val docs = Tables.documents(s, d).repartition(32)
    val sc = dsirScores(docs, col("source").isin("src0", "src1"))
    val mx = sc.agg(max("avg_r").as("max_avg"))
    sc.crossJoin(broadcast(mx))
      .where(dec(gate32(col("doc_id"))) * dec(col("max_avg"))
        < dec(lit(4294967296L)) * dec(col("avg_r")))
      .select("doc_id", "n_tok", "score", "avg_r")
      .orderBy("doc_id")
  }

  private val Depth = 4 // count-min rows (independent hash functions)
  private val Width = 512 // counters per row; 4096 % 512 == 0 → uniform

  /** Count-min bucket for hash row j: 3 md5 hex chars (0..4095) of
    * "j:term", folded mod 512 — exactly uniform since 512 | 4096. */
  private def cmBucket(j: Column, term: Column): Column =
    pmod(conv(substring(md5(concat_ws(":", j.cast("string"), term)), 1, 3),
      16, 10).cast("int"), lit(Width))

  /** Lowercased whitespace tokens of a documents relation (the q63
    * convention — shared by the batch and streaming sketch paths). */
  private[graft] def docTokens(docs: DataFrame): DataFrame =
    docs.select(explode(split(lower(col("text")), " ")).as("term"))

  /** Partial count-min sketch of a token relation: ≤ Depth×Width
    * (j, bucket, cnt) rows. Counter addition is the sketch's merge
    * operator, so partials from any corpus split (scan partitions,
    * micro-batches) sum to the exact whole-corpus sketch — the
    * property the streaming variant (q153) leans on. */
  private[graft] def cmPartialSketch(toks: DataFrame): DataFrame =
    toks.select(col("term"), explode(sequence(lit(0), lit(Depth - 1))).as("j"))
      .withColumn("bucket", cmBucket(col("j"), col("term")))
      .groupBy("j", "bucket").agg(count(lit(1)).as("cnt"))

  /** Merge partial sketches (counter addition) into one sketch. */
  private[graft] def cmMerge(partials: DataFrame): DataFrame =
    partials.groupBy("j", "bucket").agg(sum("cnt").as("cnt"))

  /** Point-query a sketch at a (term, exact_cnt) relation: est_cnt =
    * min over the Depth hash rows. */
  private[graft] def cmPointQuery(sketch: DataFrame, top: DataFrame): DataFrame =
    top.select(col("term"), col("exact_cnt"),
        explode(sequence(lit(0), lit(Depth - 1))).as("j"))
      .withColumn("bucket", cmBucket(col("j"), col("term")))
      .join(broadcast(sketch), Seq("j", "bucket"))
      .groupBy("term", "exact_cnt").agg(min("cnt").as("est_cnt"))
      .select("term", "exact_cnt", "est_cnt")
      .orderBy("term")

  /** Exact top-20 tokens (ties → lexicographic): the oracle-pairing
    * side of the estimator; production keeps only the sketch. */
  private[graft] def exactTop20(toks: DataFrame): DataFrame =
    toks.groupBy("term").agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("term")).limit(20)

  /** Count-min sketch over corpus tokens, point-queried at the exact
    * top-20 tokens. est_cnt = min over the Depth rows of the hashed
    * counter — ≥ the true count by construction (counters only ever
    * overestimate), within ε·N with probability 1−δ for
    * ε = e/Width, δ = e^−Depth. The exact side exists to let the
    * driver hash-check the estimator; a production vocabulary pass
    * keeps ONLY the 2048-counter sketch. */
  val qCountMinTokens: GraftQuery = GraftQuery(
    "q151_countmin_tokens",
    s"""WITH toks AS (
       |  SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents),
       |hashed AS (
       |  SELECT j, term,
       |    CAST('0x' || substring(md5(CAST(j AS VARCHAR) || ':' || term), 1, 3)
       |      AS INTEGER) % $Width AS bucket
       |  FROM toks CROSS JOIN (SELECT unnest(range(0, $Depth)) AS j)),
       |sketch AS (
       |  SELECT j, bucket, CAST(count(*) AS BIGINT) AS cnt
       |  FROM hashed GROUP BY j, bucket),
       |exact AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS exact_cnt
       |  FROM toks GROUP BY term),
       |top AS (
       |  SELECT term, exact_cnt FROM exact
       |  ORDER BY exact_cnt DESC, term LIMIT 20),
       |est AS (
       |  SELECT t.term, t.exact_cnt, min(s.cnt) AS est_cnt
       |  FROM top t CROSS JOIN (SELECT unnest(range(0, $Depth)) AS j) js
       |  JOIN sketch s ON s.j = js.j AND s.bucket =
       |    CAST('0x' || substring(md5(CAST(js.j AS VARCHAR) || ':' || t.term), 1, 3)
       |      AS INTEGER) % $Width
       |  GROUP BY t.term, t.exact_cnt)
       |SELECT term, exact_cnt, est_cnt FROM est
       |ORDER BY term""".stripMargin) { (s, d) =>
    val toks = docTokens(Tables.documents(s, d).repartition(32))
    // the sketch: ≤ Depth×Width rows after map-side partials
    cmPointQuery(cmPartialSketch(toks), exactTop20(toks))
  }

  /** Cluster-balanced token budget: assign every document's embedding
    * to its fixed-stride IVF cell ([[IvfAnn.assign]]'s scan-fused
    * expression), then give each semantic cluster an EQUAL share of a
    * half-corpus token budget — the q137 gate with cell count C in
    * place of the per-mille weight: keep iff h·T_cell·C < 2³²·budget.
    * Exact DECIMAL(38,0)/HUGEINT cross-multiply, no division. This is
    * the cluster-mixing recipe (MiniPile-style): head domains are
    * downsampled hard, tail domains survive whole. */
  val qClusterBudgetMix: GraftQuery = GraftQuery(
    "q152_cluster_budget_mix",
    s"""WITH centroids AS (
       |  SELECT vec_id AS cell, embedding AS c_emb FROM embeddings
       |  WHERE vec_id % ${IvfAnn.fixedStride} = 0),
       |assigned AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${IvfAnn.cosSql.format("e.embedding", "c.c_emb")} DESC,
       |          c.cell) AS rn
       |    FROM embeddings e CROSS JOIN centroids c)
       |  WHERE rn = 1),
       |toks AS (
       |  SELECT d.doc_id, a.cell,
       |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
       |    CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)
       |      AS BIGINT) AS h
       |  FROM documents d JOIN assigned a ON a.vec_id = d.doc_id),
       |tot AS (
       |  SELECT cell, CAST(sum(n_tok) AS BIGINT) AS t_cell
       |  FROM toks GROUP BY cell),
       |g AS (
       |  SELECT CAST(sum(t_cell) AS BIGINT) // 2 AS budget,
       |    CAST(count(*) AS BIGINT) AS n_cells FROM tot),
       |kept AS (
       |  SELECT t.doc_id, t.cell, t.n_tok, tot.t_cell
       |  FROM toks t JOIN tot USING (cell) CROSS JOIN g
       |  WHERE CAST(t.h AS HUGEINT) * CAST(tot.t_cell AS HUGEINT)
       |      * CAST(g.n_cells AS HUGEINT)
       |      < CAST(4294967296 AS HUGEINT) * CAST(g.budget AS HUGEINT))
       |SELECT cell, CAST(count(*) AS BIGINT) AS kept_docs,
       |  CAST(sum(n_tok) AS BIGINT) AS kept_tokens,
       |  max(t_cell) AS cell_tokens
       |FROM kept GROUP BY cell
       |ORDER BY cell""".stripMargin) { (s, d) =>
    val emb = Tables.embeddings(s, d)
    val centroids = IvfAnn.fixedCentroids(emb, IvfAnn.fixedStride)
    val assigned = IvfAnn.assign(emb, centroids).select("vec_id", "cell")
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), tokenCount(col("text")).cast("long").as("n_tok"),
        gate32(col("doc_id")).as("h"))
      .join(assigned, col("doc_id") === col("vec_id"))
    val tot = toks.groupBy("cell").agg(sum("n_tok").as("t_cell"))
    val g = tot.agg(sum("t_cell").cast("long").as("t_all"),
        count(lit(1)).as("n_cells"))
      .select(expr("t_all DIV 2").as("budget"), col("n_cells"))
    toks.join(broadcast(tot), "cell")
      .crossJoin(broadcast(g))
      .where(dec(col("h")) * dec(col("t_cell")) * dec(col("n_cells"))
        < dec(lit(4294967296L)) * dec(col("budget")))
      .groupBy("cell")
      .agg(count(lit(1)).as("kept_docs"), sum("n_tok").as("kept_tokens"),
        max("t_cell").as("cell_tokens"))
      .orderBy("cell")
  }

  /** SKETCH-BASED DISTRIBUTION DRIFT: compare the token distributions
    * of two corpus snapshots (doc_id parity plays yesterday/today) on
    * the j=0 count-min row — the 512-counter artifact a production
    * pipeline persists per ingest day (q151/q153 infrastructure).
    * Per-bucket rates are floor-divided integer parts-per-million
    * (n_b·10⁶ DIV T, computed through DECIMAL/HUGEINT so the
    * intermediate never overflows at any corpus size; the rate itself
    * is always ≤ 10⁶); the drift is the L1 gap |r_a − r_b| — exact
    * integers end to end, so the monitor is bit-deterministic under
    * any partitioning and its alert threshold can't flap on engine
    * arithmetic. Reported: the 10 most-drifted buckets plus the total
    * L1 drift (≈ 2·10⁶ × total-variation distance).
    *
    * 100 TB: each snapshot reduces to a 512-row sketch (map-side
    * partials); the comparison is O(width), corpus-size-independent —
    * the point of monitoring on sketches instead of vocabularies. */
  val qSketchDrift: GraftQuery = GraftQuery(
    "q160_sketch_drift",
    s"""WITH toks AS (
       |  SELECT doc_id % 2 AS snap,
       |    unnest(string_split(lower(text), ' ')) AS term
       |  FROM documents),
       |hashed AS (
       |  SELECT snap,
       |    CAST('0x' || substring(md5('0:' || term), 1, 3) AS INTEGER)
       |      % $Width AS bucket
       |  FROM toks),
       |sk AS (
       |  SELECT bucket,
       |    CAST(count(*) FILTER (snap = 0) AS BIGINT) AS n_a,
       |    CAST(count(*) FILTER (snap = 1) AS BIGINT) AS n_b
       |  FROM hashed GROUP BY bucket),
       |tot AS (
       |  SELECT CAST(sum(n_a) AS BIGINT) AS t_a,
       |    CAST(sum(n_b) AS BIGINT) AS t_b FROM sk),
       |rates AS (
       |  SELECT bucket, n_a, n_b,
       |    abs(CAST(CAST(n_a AS HUGEINT) * 1000000 // CAST(t_a AS HUGEINT)
       |          AS BIGINT)
       |      - CAST(CAST(n_b AS HUGEINT) * 1000000 // CAST(t_b AS HUGEINT)
       |          AS BIGINT)) AS drift_ppm
       |  FROM sk CROSS JOIN tot),
       |total AS (SELECT CAST(sum(drift_ppm) AS BIGINT) AS total_drift_ppm
       |  FROM rates)
       |SELECT bucket, n_a, n_b, drift_ppm, total_drift_ppm
       |FROM (SELECT * FROM rates ORDER BY drift_ppm DESC, bucket LIMIT 10)
       |CROSS JOIN total
       |ORDER BY drift_ppm DESC, bucket""".stripMargin) { (s, d) =>
    driftReport(driftPartial(Tables.documents(s, d).repartition(32)))
  }

  /** Partial per-(snapshot, bucket) counters for a documents slice —
    * the bounded (≤ 2·width rows) thing each micro-batch appends;
    * counter addition merges partials exactly (the q151/q153
    * property). */
  private[graft] def driftPartial(docs: DataFrame): DataFrame =
    docs.select((col("doc_id") % 2).as("snap"),
        explode(split(lower(col("text")), " ")).as("term"))
      .withColumn("bucket", cmBucket(lit(0), col("term")))
      .groupBy("bucket")
      .agg(count(when(col("snap") === 0, 1)).as("n_a"),
        count(when(col("snap") === 1, 1)).as("n_b"))

  /** Merge drift partials (counter addition per bucket). */
  private[graft] def driftMerge(partials: DataFrame): DataFrame =
    partials.groupBy("bucket")
      .agg(sum("n_a").as("n_a"), sum("n_b").as("n_b"))

  /** The q160 report off a merged (bucket, n_a, n_b) counter table. */
  private[graft] def driftReport(sk: DataFrame): DataFrame = {
    val tot = sk.agg(sum("n_a").as("t_a"), sum("n_b").as("t_b"))
    val rates = sk.crossJoin(broadcast(tot))
      .withColumn("drift_ppm", abs(
        expr("CAST(CAST(n_a AS DECIMAL(38,0)) * 1000000 DIV CAST(t_a AS DECIMAL(38,0)) AS BIGINT)")
          - expr("CAST(CAST(n_b AS DECIMAL(38,0)) * 1000000 DIV CAST(t_b AS DECIMAL(38,0)) AS BIGINT)")))
    val total = rates.agg(sum("drift_ppm").as("total_drift_ppm"))
    rates.orderBy(col("drift_ppm").desc, col("bucket")).limit(10)
      .crossJoin(broadcast(total))
      .select(col("bucket"), col("n_a").cast("long").as("n_a"),
        col("n_b").cast("long").as("n_b"), col("drift_ppm"),
        col("total_drift_ppm"))
      .orderBy(col("drift_ppm").desc, col("bucket"))
  }

  /** Bootstrap replicate count for q191. */
  val bootReplicates = 16

  /** HASH-BOOTSTRAP UNCERTAINTY for a corpus metric (mean tokens per
    * document): every corpus-card number should ship with an error
    * bar, and the bootstrap is how you get one without distributional
    * assumptions — but naive resampling is random and
    * irreproducible. Here replicate b reweights each document by
    * w = #{i < 4 : dibit_i(md5(doc_id ':' b)) = 0} ~ Binomial(4, ¼)
    * (mean 1 — the standard Poisson(1) bootstrap surrogate), so every
    * replicate is a pure function of (doc_id, b): deterministic,
    * partitioning-independent, oracle-checkable, and append-stable.
    *
    * All counts and weighted sums are integers; each replicate's mean
    * is one double division. The spread across the 16 rows IS the
    * uncertainty estimate (read min/max or the empirical std from the
    * output).
    *
    * Plan: one narrow pass over documents exploded ×16 (no joins),
    * map-side-combined groupBy to 16 rows. */
  val qBootstrapMetric: GraftQuery = GraftQuery(
    "q191_bootstrap_metric",
    s"""WITH reps AS (
       |  SELECT * FROM (VALUES ${(0 until bootReplicates).map(b => s"($b)").mkString(", ")}) AS r(b)),
       |weighted AS (
       |  SELECT r.b,
       |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
       |    ((h & 3) = 0)::BIGINT + (((h >> 2) & 3) = 0)::BIGINT +
       |    (((h >> 4) & 3) = 0)::BIGINT + (((h >> 6) & 3) = 0)::BIGINT AS w
       |  FROM documents d CROSS JOIN reps r,
       |    LATERAL (SELECT CAST('0x' || substring(md5(
       |      CAST(d.doc_id AS VARCHAR) || ':' || CAST(r.b AS VARCHAR)), 1, 8)
       |      AS BIGINT) AS h) t)
       |SELECT b,
       |  CAST(SUM(w) AS BIGINT) AS n_eff,
       |  CAST(SUM(w * n_tok) AS BIGINT) AS tok_sum,
       |  CAST(SUM(w * n_tok) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS mean_tokens
       |FROM weighted
       |GROUP BY b
       |ORDER BY b""".stripMargin) { (s, d) =>
    val h = conv(substring(md5(concat_ws(":",
      col("doc_id").cast("string"), col("b").cast("string"))), 1, 8), 16, 10)
      .cast("long")
    Tables.documents(s, d)
      .select(col("doc_id"), tokenCount(col("text")).cast("long").as("n_tok"))
      .withColumn("b", explode(sequence(lit(0), lit(bootReplicates - 1))))
      .withColumn("h", h)
      .withColumn("w",
        (col("h").bitwiseAND(3) === 0).cast("long") +
          (shiftright(col("h"), 2).bitwiseAND(3) === 0).cast("long") +
          (shiftright(col("h"), 4).bitwiseAND(3) === 0).cast("long") +
          (shiftright(col("h"), 6).bitwiseAND(3) === 0).cast("long"))
      .groupBy("b")
      .agg(sum("w").as("n_eff"),
        sum(col("w") * col("n_tok")).as("tok_sum"))
      .select(col("b"), col("n_eff"), col("tok_sum"),
        (col("tok_sum").cast("double") / col("n_eff").cast("double"))
          .as("mean_tokens"))
      .orderBy("b")
  }

  /** Robust outlier gate factor: drop a doc when dev > [[madK]]·MAD. */
  val madK = 3L

  /** MEDIAN/MAD outlier gate per source — the robust "trim length
    * outliers" curation step (C4 drops too-short pages, Gopher bounds
    * doc length; a per-SOURCE robust band adapts those global bounds
    * to each domain's own length distribution, which is what you want
    * when one source is tweets and another is books). Median and MAD
    * are DISCRETE order statistics (the q98 cume_dist selection — an
    * actual data value, engine-identical on ties), deviations are
    * BIGINT, and the gate `dev > k·MAD` is pure integer arithmetic:
    * no float anywhere, so both engines agree bit for bit. The
    * classical 1.4826 consistency constant is folded into k (k=3 on
    * raw MAD ≈ 2σ on normal data) — scaling by a float would buy
    * nothing and cost exactness.
    *
    * 100 TB: two per-source windows over the 3-column (doc_id,
    * source, n_chars) compact relation — payload text never moves —
    * plus two |sources|-row broadcasts back onto the scan. A
    * high-cardinality partition key (per-DOMAIN over 10⁶ domains is
    * still fine: each window partition is one domain's docs) would
    * hit the same single-task-per-giant-source limit as q184, and
    * the fix is the same q181 two-level decomposition. */
  val qMadGate: GraftQuery = GraftQuery(
    "q204_mad_gate",
    s"""WITH base AS (
       |  SELECT doc_id, source, n_chars FROM documents),
       |cd1 AS (
       |  SELECT source, n_chars,
       |    cume_dist() OVER (PARTITION BY source ORDER BY n_chars) AS cd
       |  FROM base),
       |med AS (
       |  SELECT source, MIN(CASE WHEN cd >= 0.5 THEN n_chars END) AS med
       |  FROM cd1 GROUP BY source),
       |dev AS (
       |  SELECT b.doc_id, b.source, b.n_chars, m.med,
       |    abs(b.n_chars - m.med) AS dev
       |  FROM base b JOIN med m USING (source)),
       |cd2 AS (
       |  SELECT source, dev,
       |    cume_dist() OVER (PARTITION BY source ORDER BY dev) AS cd
       |  FROM dev),
       |mad AS (
       |  SELECT source, MIN(CASE WHEN cd >= 0.5 THEN dev END) AS mad
       |  FROM cd2 GROUP BY source)
       |SELECT d.source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  MAX(d.med) AS med_chars,
       |  MAX(m.mad) AS mad_chars,
       |  CAST(count(*) FILTER (d.dev > $madK * m.mad) AS BIGINT) AS n_outliers,
       |  CAST(sum(CASE WHEN d.dev <= $madK * m.mad THEN d.n_chars ELSE 0 END)
       |    AS BIGINT) AS kept_chars
       |FROM dev d JOIN mad m USING (source)
       |GROUP BY d.source
       |ORDER BY d.source""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("n_chars"))
    val w1 = Window.partitionBy("source").orderBy("n_chars")
    val med = base
      .select(col("source"), col("n_chars"), cume_dist().over(w1).as("cd"))
      .groupBy("source")
      .agg(min(when(col("cd") >= 0.5, col("n_chars"))).as("med"))
    val dev = base.join(broadcast(med), "source")
      .withColumn("dev", abs(col("n_chars") - col("med")))
    val w2 = Window.partitionBy("source").orderBy("dev")
    val mad = dev
      .select(col("source"), col("dev"), cume_dist().over(w2).as("cd"))
      .groupBy("source")
      .agg(min(when(col("cd") >= 0.5, col("dev"))).as("mad"))
    dev.join(broadcast(mad), "source")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        max("med").as("med_chars"),
        max("mad").as("mad_chars"),
        count(when(col("dev") > col("mad") * madK, 1)).as("n_outliers"),
        sum(when(col("dev") <= col("mad") * madK, col("n_chars"))
          .otherwise(0L)).as("kept_chars"))
      .orderBy("source")
  }

  /** Budget fraction (per mille of each source's token mass) the
    * nucleus selection keeps. */
  val nucleusPermille = 600L

  /** NUCLEUS (top-p) SELECTION per source: rank each source's docs by
    * the q129 learned quality logit and keep the BEST docs until they
    * carry [[nucleusPermille]]‰ of that source's token mass — the
    * deterministic best-first counterpart to q157's hash-downsampling
    * (quota caps pick a random subset; nucleus picks the top of the
    * quality distribution, the phi-1/"textbook quality" selection
    * posture). A doc is kept iff the mass BEFORE it is inside the
    * budget (`cum_prev·1000 < p·total`, exact BIGINT cross-multiply),
    * so every source keeps ≥1 doc and the boundary doc that straddles
    * the budget line is included — the same closed-boundary rule as
    * q137.
    *
    * Exactness: the logit is the q129 2⁻²⁰-quantized dot product
    * (bit-equal across engines), ordering ties break on doc_id, and
    * every budget decision is integer arithmetic.
    *
    * 100 TB: one window sort per source over the compact (doc_id,
    * n_tok, logit) relation — the honest cost of exact best-first
    * selection. Production at 10⁶-doc sources would replace the
    * per-source sort with a two-pass quantile threshold (find the
    * logit cutoff from a histogram — q177's binning — then scan-gate),
    * trading exact boundary docs for a shuffle-free second pass; the
    * window form here is the oracle for that approximation. */
  val qNucleusSelect: GraftQuery = GraftQuery(
    "q207_nucleus_select",
    s"""WITH grams AS (
       |  ${TextVector.gramsSql}),
       |vecs AS (
       |  ${TextVector.vecSql}),
       |scored AS (
       |  SELECT d.doc_id, d.source,
       |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
       |    ${QualityGate.dotSql} AS logit
       |  FROM documents d JOIN vecs USING (doc_id)),
       |cum AS (
       |  SELECT doc_id, source, n_tok, logit,
       |    CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY source
       |      ORDER BY logit DESC, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |      AS cum_prev,
       |    CAST(SUM(n_tok) OVER (PARTITION BY source) AS BIGINT) AS t_src
       |  FROM scored),
       |gated AS (
       |  SELECT *, cum_prev * 1000 < t_src * $nucleusPermille AS keep
       |  FROM cum)
       |SELECT source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(*) FILTER (keep) AS BIGINT) AS kept_docs,
       |  CAST(sum(CASE WHEN keep THEN n_tok ELSE 0 END) AS BIGINT)
       |    AS kept_tokens,
       |  MAX(t_src) AS src_tokens,
       |  MIN(CASE WHEN keep THEN logit END) AS cut_logit
       |FROM gated
       |GROUP BY source
       |ORDER BY source""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graftshim.CharGramVector
    val scored = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        tokenCount(col("text")).cast("long").as("n_tok"),
        CharGramVector(col("text"), TextVector.dim).as("v"))
      .select(col("doc_id"), col("source"), col("n_tok"),
        QualityGate.logitOf(col("v")).as("logit"))
    val wCum = Window.partitionBy("source")
      .orderBy(col("logit").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy("source")
    val gated = scored
      .withColumn("cum_prev", coalesce(sum("n_tok").over(wCum), lit(0L)))
      .withColumn("t_src", sum("n_tok").over(wTot))
      .withColumn("keep",
        col("cum_prev") * 1000L < col("t_src") * nucleusPermille)
    gated.groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("keep"), 1)).as("kept_docs"),
        sum(when(col("keep"), col("n_tok")).otherwise(0L)).as("kept_tokens"),
        max("t_src").as("src_tokens"),
        min(when(col("keep"), col("logit"))).as("cut_logit"))
      .orderBy("source")
  }

  val all: Seq[GraftQuery] =
    Seq(qDsirSelect, qCountMinTokens, qClusterBudgetMix, qSketchDrift,
      qBootstrapMetric, qMadGate, qNucleusSelect)
}
