package graft.operators

import graft.GraftQuery
import graft.functions.TextFunctions.tokenCount
import graft.sources.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for an LLM training-data pipeline: the
  * steps that turn a curated document pool into trainable shards —
  * mixture sampling, held-out splitting, sequence packing, and the
  * dataset report card. These extend the north-star surface (SURVEY
  * §0 driver mandate) beyond curation (Dedup/TextQueries) into the
  * assembly stage; no counterpart exists in the reference
  * (Data-ETL-with-DBT stops at the modeled table + RF features).
  *
  * All of these are deterministic by construction — sampling and
  * splitting decisions are pure functions of md5(doc_id), packing
  * offsets are window sums over a total order — so every one is
  * DuckDB-oracle-checkable AND reproducible run-to-run at any
  * parallelism (re-partitioning cannot change a single decision; the
  * same property that makes the q07/q08 dedup tie-breaks safe).
  *
  * 100 TB scale notes:
  *  - q109/q110 are stateless per-row filters/projections over a hash
  *    of the key — no shuffle at all in production (the ORDER BY here
  *    exists only for oracle determinism). This is why hash-gate
  *    sampling beats `TABLESAMPLE`/`rand()`: it is reproducible,
  *    join-stable (the same doc_id samples identically in every
  *    derived table), and needs no coordination.
  *  - q111 packs per (lang, shard) where shard is itself a hash
  *    digit: the window sort is bounded by a shard, not a language,
  *    so a 90%-English corpus does not serialize into one partition
  *    — the standard two-level pack (shard independently, each shard
  *    emits contiguous sequence ids namespaced by shard).
  *  - q112 is a rollup aggregate: partial aggregation map-side, one
  *    shuffle on the grouping sets.
  */
object TrainingPipeline {

  /** Per-language mixture weights as 4-hex-digit gate thresholds over
    * the first 16 bits of md5(doc_id): keep iff hex prefix < gate.
    * en 0.9=0xe666, es/de 0.5=0x8000, fr 0.25=0x4000, zh 0.125=0x2000.
    * Lowercase-hex string comparison == numeric comparison (md5 output
    * is lowercase fixed-width in both Spark and DuckDB). */
  private val mixGates: Seq[(String, String)] =
    Seq("en" -> "e666", "es" -> "8000", "de" -> "8000", "fr" -> "4000", "zh" -> "2000")

  private def sampleKey: Column = substring(md5(col("doc_id").cast("string")), 1, 4)

  private def gateFor(lang: Column): Column =
    mixGates.foldLeft(lit("0000")) { case (acc, (l, g)) =>
      when(lang === l, lit(g)).otherwise(acc)
    }

  private val mixGateSql: String =
    mixGates.map { case (l, g) => s"WHEN '$l' THEN '$g'" }
      .mkString("CASE lang ", " ", " ELSE '0000' END")

  /** Deterministic stratified mixture sampling: down-weight each
    * language to a target fraction with a pure hash gate. */
  val qStratifiedMix: GraftQuery = GraftQuery(
    "q109_stratified_mix",
    s"""SELECT doc_id, lang, source, n_chars,
       |  substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS sample_key
       |FROM documents
       |WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < $mixGateSql
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .withColumn("sample_key", sampleKey)
      .where(col("sample_key") < gateFor(col("lang")))
      .select("doc_id", "lang", "source", "n_chars", "sample_key")
      .orderBy("doc_id")
  }

  /** Split-gate thresholds over the first md5 byte (256 buckets):
    * test < 0x0d (~5%), val < 0x27 (~10%), else train. ONE definition
    * — q110 and every consumer that re-derives split membership
    * (q124's example assembly) share these, because the whole point of
    * a hash split is that two tables can never disagree about a doc's
    * split; duplicated literals would reintroduce that leak. */
  private[operators] val splitTestGate = "0d"
  private[operators] val splitValGate = "27"

  private[operators] def splitColumn(id: Column): Column = {
    val bucket = substring(md5(id.cast("string")), 1, 2)
    when(bucket < splitTestGate, "test")
      .when(bucket < splitValGate, "val")
      .otherwise("train")
  }

  private[operators] def splitSqlCase(idExpr: String): String =
    s"""CASE WHEN substring(md5(CAST($idExpr AS VARCHAR)), 1, 2) < '$splitTestGate' THEN 'test'
       |       WHEN substring(md5(CAST($idExpr AS VARCHAR)), 1, 2) < '$splitValGate' THEN 'val'
       |       ELSE 'train' END""".stripMargin

  /** Deterministic train/val/test split — hash-split (vs random)
    * keeps membership stable across reruns and derived tables: a doc
    * can never leak between splits. */
  val qTrainSplit: GraftQuery = GraftQuery(
    "q110_train_split",
    s"""SELECT doc_id, lang,
       |  ${splitSqlCase("doc_id")} AS split
       |FROM documents
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        splitColumn(col("doc_id")).as("split"))
      .orderBy("doc_id")
  }

  /** CLUSTER-SAFE SPLIT — the leakage-proof form of q110: split
    * membership is hashed from the near-dup CLUSTER id (q77's
    * component canonical; singletons hash their own doc_id), so a
    * whole near-duplicate cluster lands on ONE side by construction.
    * q110's per-document hash can put two 0.9-jaccard copies of the
    * same text in train AND val — exactly the eval contamination q149
    * measures after the fact; this split makes that measurement zero
    * for the verified-pair tier, by derivation rather than audit (the
    * Lee et al. dedup-before-split lesson). `moved` marks the docs
    * whose split CHANGED versus q110 — the contamination q110 would
    * have shipped.
    *
    * 100 TB: the component labels are the memoized q77 index (built
    * once per corpus); the split itself is the same stateless md5
    * gate as q110 — any derived table re-computes membership from
    * cluster_id and can never disagree. */
  val qClusterSafeSplit: GraftQuery = GraftQuery(
    "q333_cluster_safe_split",
    s"""WITH RECURSIVE ${Dedup.componentLblCteShared},
       |assigned AS (
       |  SELECT d.doc_id, d.lang,
       |    COALESCE(l.cluster_id, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN lbl l ON l.doc_id = d.doc_id)
       |SELECT doc_id, lang, cluster_id,
       |  ${splitSqlCase("cluster_id")} AS split,
       |  (${splitSqlCase("cluster_id")}) <> (${splitSqlCase("doc_id")}) AS moved
       |FROM assigned
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val comp = Dedup.indexedComponents(s, d)
      .select(col("node").as("doc_id"), col("label").as("cluster_id"))
    Tables.documents(s, d).select(col("doc_id"), col("lang"))
      .join(broadcast(comp), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
      .select(col("doc_id"), col("lang"), col("cluster_id"),
        splitColumn(col("cluster_id")).as("split"),
        (splitColumn(col("cluster_id")) =!=
          splitColumn(col("doc_id"))).as("moved"))
      .orderBy("doc_id")
  }

  /** Concat-and-chunk sequence packing (budget 2048 tokens): within
    * each (lang, shard) stream, documents are concatenated in doc_id
    * order and chunked into fixed-budget sequences; each doc reports
    * its start offset and the [first_seq, last_seq] span it lands in.
    * The shard level (a hash digit) is what makes this distributable:
    * each shard packs independently under its own window sort. */
  val qPackSequences: GraftQuery = GraftQuery(
    "q111_pack_sequences",
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents),
      |packed AS (
      |  SELECT doc_id, lang, shard, n_tok,
      |    CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
      |  FROM toks)
      |SELECT doc_id, lang, shard, n_tok, start_tok,
      |  start_tok // 2048 AS first_seq,
      |  (start_tok + n_tok - 1) // 2048 AS last_seq,
      |  (start_tok + n_tok - 1) // 2048 - start_tok // 2048 + 1 AS n_seqs
      |FROM packed
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .select(
        col("doc_id"), col("lang"),
        substring(md5(col("doc_id").cast("string")), 1, 1).as("shard"),
        tokenCount(col("text")).cast("long").as("n_tok"))
      .withColumn("start_tok", coalesce(sum("n_tok").over(w), lit(0L)))
      .withColumn("first_seq", expr("start_tok DIV 2048"))
      .withColumn("last_seq", expr("(start_tok + n_tok - 1) DIV 2048"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + lit(1L))
      .orderBy("doc_id")
  }

  /** Dataset report card: per-(lang, source) rollup of document count,
    * token volume, exact-dup distinct content count, and mean length —
    * the summary a data-mixture decision reads. */
  val qCorpusCard: GraftQuery = GraftQuery(
    "q112_corpus_card",
    """SELECT lang, source,
      |  count(*) AS n_docs,
      |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
      |  count(DISTINCT md5(lower(text))) AS n_unique,
      |  CAST(sum(n_chars) AS DOUBLE) / count(*) AS mean_chars
      |FROM documents
      |GROUP BY ROLLUP(lang, source)
      |ORDER BY lang ASC NULLS FIRST, source ASC NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .rollup("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount(col("text"))).as("n_tokens"),
        countDistinct(md5(lower(col("text")))).as("n_unique"),
        (sum("n_chars").cast("double") / count(lit(1))).as("mean_chars"))
      .orderBy(col("lang").asc_nulls_first, col("source").asc_nulls_first)
  }

  /** Overlapping-window document chunking (RAG / context-window prep):
    * 200-code-point windows at stride 150, each chunk carried as
    * (start, length, md5) — the md5 makes the oracle prove every chunk
    * BYTE, not just the offsets. Chunk count is
    * 1 + ceil(max(len-200, 0)/150): a chunk is emitted only while the
    * PREVIOUS window has not already reached end-of-text (the naive
    * "while 1+150k <= len" rule emits a final chunk that is a strict
    * sub-span of its predecessor whenever len mod 150 ∈ [1,50] —
    * e.g. a 200-char doc would get chunk 151-200 inside chunk 1-200 —
    * a duplicate retrieval candidate, never new text). Consecutive
    * chunks overlap by 50; the tail chunk covers through the end.
    * Pure per-row explode — no shuffle at all in production (the
    * ORDER BY is oracle determinism only); at 100 TB this fuses into
    * whatever scans the corpus next, exactly like the q109/q110 hash
    * gates. */
  /** The q122 chunk CTE (200-cp windows, stride 150) — shared with the
    * chunk-grain retrieval query (q166). */
  private[operators] val chunksCteSql: String =
    """chunks AS (
      |  SELECT doc_id, CAST(k AS INTEGER) AS chunk_idx,
      |    CAST(1 + 150 * k AS INTEGER) AS chunk_start,
      |    substring(text, CAST(1 + 150 * k AS INTEGER), 200) AS chunk
      |  FROM (SELECT doc_id, text,
      |          unnest(range(0, 1 + (greatest(length(text) - 200, 0) + 149) // 150)) AS k
      |        FROM documents
      |        WHERE length(text) >= 1))""".stripMargin

  /** (doc_id, chunk_idx, chunk_start, chunk) — the Spark mirror. */
  private[operators] def chunkRelation(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    chunkRelationOf(Tables.documents(s, d))

  /** [[chunkRelation]] over an arbitrary (doc_id, text) relation —
    * shared with the length-skew containment candidates (q305). */
  private[graft] def chunkRelationOf(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .where(length(col("text")) >= 1)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0),
          // DIV, not `/`: Spark's / is double division even on longs
          expr("CAST(greatest(length(text) - 200, 0) + 149 AS BIGINT) DIV 150")))
          .as("k"))
      .select(col("doc_id"), col("k").cast("int").as("chunk_idx"),
        (lit(1) + lit(150) * col("k")).cast("int").as("chunk_start"),
        col("text").substr((lit(1) + lit(150) * col("k")).cast("int"), lit(200))
          .as("chunk"))

  /** FILL-IN-MIDDLE (FIM) example assembly — the span-reordering
    * transform code-model pipelines apply to a fraction of training
    * docs (Bavarian et al.): split each doc into prefix/middle/suffix
    * thirds (exact integer code-point arithmetic — l1 = len div 3,
    * l2 = 2·len div 3 − l1) and emit the PSM rendering
    * `<PRE>prefix<SUF>suffix<MID>middle`, so the model learns to
    * infill. The md5 of the assembled example makes the oracle prove
    * every BYTE of the surgery, not just the lengths; which docs get
    * FIM'd is the q109 hash-gate discipline (doc_id md5 < 0x8000 —
    * a reproducible 50% coin, join-stable across derived tables).
    *
    * 100 TB: a pure per-row projection fused into the scan — zero
    * exchanges; the ORDER BY exists only for oracle determinism. */
  val qFimExamples: GraftQuery = GraftQuery(
    "q320_fim_examples",
    """WITH cuts AS (
      |  SELECT doc_id, text, length(text) AS n,
      |    length(text) // 3 AS l1,
      |    (2 * length(text)) // 3 - length(text) // 3 AS l2,
      |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000' AS fim
      |  FROM documents WHERE length(text) >= 3)
      |SELECT doc_id, CAST(n AS INTEGER) AS n_chars, fim,
      |  CAST(l1 AS INTEGER) AS l_prefix,
      |  CAST(l2 AS INTEGER) AS l_middle,
      |  CAST(n - l1 - l2 AS INTEGER) AS l_suffix,
      |  CASE WHEN fim THEN md5('<PRE>' || substring(text, 1, CAST(l1 AS INTEGER))
      |    || '<SUF>' || substring(text, CAST(l1 + l2 + 1 AS INTEGER), CAST(n - l1 - l2 AS INTEGER))
      |    || '<MID>' || substring(text, CAST(l1 + 1 AS INTEGER), CAST(l2 AS INTEGER)))
      |  ELSE md5(text) END AS example_md5
      |FROM cuts
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val n = length(col("text"))
    val l1 = expr("length(text) div 3")
    val l2 = expr("(2 * length(text)) div 3 - length(text) div 3")
    Tables.documents(s, d)
      .where(length(col("text")) >= 3)
      .select(col("doc_id"), col("text"), n.as("n"), l1.as("l1"), l2.as("l2"),
        (substring(md5(col("doc_id").cast("string")), 1, 4) < "8000").as("fim"))
      .select(col("doc_id"), col("n").cast("int").as("n_chars"), col("fim"),
        col("l1").cast("int").as("l_prefix"),
        col("l2").cast("int").as("l_middle"),
        (col("n") - col("l1") - col("l2")).cast("int").as("l_suffix"),
        when(col("fim"), md5(concat(
          lit("<PRE>"), col("text").substr(lit(1), col("l1").cast("int")),
          lit("<SUF>"), col("text").substr((col("l1") + col("l2") + 1).cast("int"),
            (col("n") - col("l1") - col("l2")).cast("int")),
          lit("<MID>"), col("text").substr((col("l1") + 1).cast("int"),
            col("l2").cast("int")))))
          .otherwise(md5(col("text"))).as("example_md5"))
      .orderBy("doc_id")
  }

  /** DEDUP-AWARE TOKEN-BUDGET MIXTURE — q137's budget gate with the
    * per-language token totals replaced by EFFECTIVE totals (each
    * doc's tokens weighted 1/|near-dup cluster| in integer ppm, the
    * q321 soft-dedup weighting): a language whose mass is copies no
    * longer crowds the budget it hasn't earned. The gate stays the
    * exact cross-multiplied integer comparison
    * h · T_eff_l · 1000 < 2³² · B_eff · w_l in DECIMAL(38,0) ↔
    * HUGEINT (T_eff carries a 10⁶ ppm factor on both sides of the
    * inequality, so it cancels — no division, no doubles, kept set
    * bit-deterministic). Emitted token totals divide the ppm factor
    * back out, so the BIGINT output contract holds at any corpus
    * scale.
    *
    * 100 TB: q137's physics (one aggregate pass, |langs| rows
    * broadcast back, scan-fused gate) plus two broadcast joins
    * against the pair-bounded cluster index — the corpus never
    * shuffles. */
  val qDedupAwareMix: GraftQuery = GraftQuery(
    "q326_dedup_aware_mix",
    s"""WITH RECURSIVE ${Dedup.componentLblCteShared},
       |sizes AS (
       |  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS csize
       |  FROM lbl GROUP BY cluster_id),
       |wtoks AS (
       |  SELECT d.doc_id, d.lang,
       |    CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
       |    CAST('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h,
       |    COALESCE(1000000 // s.csize, 1000000) AS w_ppm
       |  FROM documents d
       |  LEFT JOIN lbl l ON d.doc_id = l.doc_id
       |  LEFT JOIN sizes s ON l.cluster_id = s.cluster_id),
       |tot AS (
       |  SELECT lang, CAST(sum(CAST(n_tok AS HUGEINT) * w_ppm) AS HUGEINT) AS t_eff
       |  FROM wtoks GROUP BY lang),
       |g AS (SELECT CAST(sum(t_eff) AS HUGEINT) // 2 AS budget FROM tot),
       |kept AS (
       |  SELECT t.doc_id, t.lang, t.n_tok, t.w_ppm, tot.t_eff
       |  FROM wtoks t JOIN tot USING (lang) CROSS JOIN g
       |  WHERE CAST(t.h AS HUGEINT) * tot.t_eff * 1000
       |      < CAST(4294967296 AS HUGEINT) * g.budget
       |        * (CASE WHEN t.lang = 'en' THEN 400 ELSE 150 END))
       |SELECT lang,
       |  CAST(CASE WHEN lang = 'en' THEN 400 ELSE 150 END AS BIGINT)
       |    AS target_permille,
       |  CAST(count(*) AS BIGINT) AS kept_docs,
       |  CAST(sum(CAST(n_tok AS HUGEINT) * w_ppm) // 1000000 AS BIGINT)
       |    AS kept_eff_tokens,
       |  CAST(max(t_eff) // 1000000 AS BIGINT) AS total_eff_tokens
       |FROM kept GROUP BY lang
       |ORDER BY lang NULLS FIRST""".stripMargin) { (s, d) =>
    val labels = Dedup.indexedComponents(s, d)
      .select(col("node").as("doc_id"), col("label").as("cluster_id"))
    val sizes = labels.groupBy("cluster_id").agg(count(lit(1)).as("csize"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val wtoks = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        tokenCount(col("text")).cast("long").as("n_tok"),
        gate32(col("doc_id")).as("h"))
      .join(broadcast(labels), Seq("doc_id"), "left")
      .join(broadcast(sizes), Seq("cluster_id"), "left")
      .withColumn("w_ppm", coalesce(expr("1000000 div csize"), lit(1000000L)))
    val tot = wtoks.groupBy("lang")
      .agg(sum(dec(col("n_tok")) * dec(col("w_ppm"))).cast("decimal(38,0)")
        .as("t_eff"))
    // floor-divide the decimal total by 2 exactly (Spark `div` returns
    // BIGINT — the q300 lesson)
    val g = tot.agg(sum("t_eff").cast("decimal(38,0)").as("t_all"))
      .select(expr("cast((t_all - pmod(t_all, 2)) / 2 as decimal(38,0))")
        .as("budget"))
    wtoks.join(broadcast(tot), "lang")
      .crossJoin(broadcast(g))
      .where(budgetKeep(col("h"), col("t_eff"), col("budget"), mixWeight))
      .groupBy("lang")
      .agg(count(lit(1)).as("kept_docs"),
        sum(dec(col("n_tok")) * dec(col("w_ppm"))).cast("decimal(38,0)")
          .as("kept_eff_ppm"),
        max(col("t_eff")).as("t_eff_max"))
      .select(col("lang"), mixWeight.as("target_permille"), col("kept_docs"),
        expr("cast((kept_eff_ppm - pmod(kept_eff_ppm, 1000000)) / 1000000 as bigint)")
          .as("kept_eff_tokens"),
        expr("cast((t_eff_max - pmod(t_eff_max, 1000000)) / 1000000 as bigint)")
          .as("total_eff_tokens"))
      .orderBy("lang")
  }

  val qChunkDocuments: GraftQuery = GraftQuery(
    "q122_chunk_documents",
    s"""WITH $chunksCteSql
      |SELECT doc_id, chunk_idx, chunk_start,
      |  CAST(length(chunk) AS INTEGER) AS chunk_len,
      |  md5(chunk) AS chunk_md5
      |FROM chunks
      |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
    chunkRelation(s, d)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_start"),
        length(col("chunk")).as("chunk_len"), md5(col("chunk")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Token-BUDGET mixture: q109 samples to fixed per-language RATES;
    * real mixture specs (Pile/Dolma-style) are stated as "language l
    * gets weight w_l of a B-token budget", so the per-language keep
    * rate must be DERIVED from the corpus's own token counts:
    *   rate_l = B * w_l / T_l   (capped at 1 by the hash gate itself)
    * with B = half the corpus tokens and w in per-mille (en 400,
    * others 150). A doc is kept iff its 32-bit md5 gate value clears
    * the rate, spelled as the EXACT cross-multiplied integer
    * comparison  h * T_l * 1000 < 2^32 * B * w_l  — no division, no
    * doubles, so the kept set is bit-deterministic and identical
    * under any partitioning. Spark computes in DECIMAL(38,0), DuckDB
    * in HUGEINT (both 128-bit-exact; the products reach ~1e25 at
    * 100 TB, far past BIGINT but far under 1e38).
    *
    * 100 TB: one aggregate pass builds the per-language token totals
    * (|langs| rows, broadcast back); the gate is then a scan-fused
    * per-row predicate — the same zero-shuffle sampling physics as
    * q109/q110, but budget-aware. */
  /** 32-bit md5 gate value for budget-rate comparisons (the first 8
    * md5 hex chars as an integer in [0, 2^32)). */
  private[operators] def gate32(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long")

  /** Per-mille mixture weight per language (en-heavy default mix). */
  private[operators] val mixWeight: Column =
    when(col("lang") === "en", 400L).otherwise(150L)

  /** The exact cross-multiplied budget gate:
    *   h * T_l * 1000 < 2^32 * B * w_l
    * in DECIMAL(38,0) — no division, no doubles; mirrored by the
    * oracle in HUGEINT. Shared by q137 and the q138 capstone. */
  private[operators] def budgetKeep(h: Column, tLang: Column,
      budget: Column, w: Column): Column = {
    val dec = (c: Column) => c.cast("decimal(38,0)")
    dec(h) * dec(tLang) * dec(lit(1000L)) <
      dec(lit(4294967296L)) * dec(budget) * dec(w)
  }

  val qTokenBudgetMix: GraftQuery = GraftQuery(
    "q137_token_budget_mix",
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |    CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
      |  FROM documents),
      |tot AS (
      |  SELECT lang, CAST(sum(n_tok) AS BIGINT) AS t_lang
      |  FROM toks GROUP BY lang),
      |g AS (SELECT CAST(sum(t_lang) AS BIGINT) // 2 AS budget FROM tot),
      |kept AS (
      |  SELECT t.doc_id, t.lang, t.n_tok, tot.t_lang
      |  FROM toks t JOIN tot USING (lang) CROSS JOIN g
      |  WHERE CAST(t.h AS HUGEINT) * CAST(tot.t_lang AS HUGEINT) * 1000
      |      < CAST(4294967296 AS HUGEINT) * CAST(g.budget AS HUGEINT)
      |        * (CASE WHEN t.lang = 'en' THEN 400 ELSE 150 END))
      |SELECT lang,
      |  CAST(CASE WHEN lang = 'en' THEN 400 ELSE 150 END AS BIGINT)
      |    AS target_permille,
      |  CAST(count(*) AS BIGINT) AS kept_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS kept_tokens,
      |  max(t_lang) AS total_tokens
      |FROM kept
      |GROUP BY lang
      |ORDER BY lang NULLS FIRST""".stripMargin) { (s, d) =>
    val toks = Tables.documents(s, d).select(
      col("doc_id"), col("lang"),
      tokenCount(col("text")).cast("long").as("n_tok"),
      gate32(col("doc_id")).as("h"))
    val tot = toks.groupBy("lang").agg(sum("n_tok").as("t_lang"))
    val g = tot.agg((sum("t_lang").cast("long")).as("t_all"))
      .select(expr("t_all DIV 2").as("budget"))
    val w = mixWeight
    toks.join(broadcast(tot), "lang")
      .crossJoin(broadcast(g))
      .where(budgetKeep(col("h"), col("t_lang"), col("budget"), w))
      .groupBy("lang")
      .agg(count(lit(1)).as("kept_docs"),
        sum("n_tok").as("kept_tokens"),
        max("t_lang").as("total_tokens"))
      .select(col("lang"), w.as("target_permille"), col("kept_docs"),
        col("kept_tokens"), col("total_tokens"))
      .orderBy("lang")
  }

  /** Deterministic EPOCH SHUFFLE: the training-order randomization
    * step between corpus assembly and the trainer. Each epoch seed
    * defines a pseudorandom total order — ord = md5(seed ':' doc_id)
    * — realized as a two-level layout: 16 hash shards (ord's first
    * hex digit), a per-shard position, and the exact global position
    * via per-shard offsets. Different seeds give independent orders
    * (TrainingPipelineSpec), the same seed reproduces bit-for-bit at
    * any parallelism — `orderBy(rand())` can do neither.
    *
    * 100 TB: there is NO global sort. Each shard sorts independently
    * under its own window (the q111 two-level pattern; in production
    * the sort is the write order of that shard's files), and the
    * offset relation that turns shard positions into the global order
    * is |shards| rows, broadcast back. Epoch N+1 is the same job with
    * a new seed, not a data movement of epoch N's output. */
  private def epochShuffle(s: org.apache.spark.sql.SparkSession, d: String,
      seed: String): org.apache.spark.sql.DataFrame = {
    val ord = md5(concat(lit(seed + ":"), col("doc_id").cast("string")))
    val w = Window.partitionBy("shard").orderBy("ord", "doc_id")
    val sharded = Tables.documents(s, d)
      .select(col("doc_id"), ord.as("ord"))
      .withColumn("shard", substring(col("ord"), 1, 1))
    val pos = sharded
      .select(col("doc_id"), col("shard"), col("ord"),
        row_number().over(w).cast("long").as("pos"))
    // offsets: |shards| rows — the single-partition window is over 16
    // rows, then broadcast back to the sharded relation
    val offW = Window.orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sharded.groupBy("shard")
      .agg(count(lit(1)).as("n"))
      .select(col("shard"),
        coalesce(sum("n").over(offW), lit(0L)).cast("long").as("base"))
    pos.join(broadcast(offsets), "shard")
      .select(col("doc_id"), col("shard"), col("pos"),
        (col("pos") + col("base")).as("global_pos"))
      .orderBy("doc_id")
  }

  private def epochShuffleSql(seed: String): String =
    s"""WITH h AS (
       |  SELECT doc_id, md5('$seed:' || CAST(doc_id AS VARCHAR)) AS ord
       |  FROM documents),
       |s AS (SELECT doc_id, ord, substring(ord, 1, 1) AS shard FROM h),
       |p AS (
       |  SELECT doc_id, shard, pos FROM (
       |    SELECT doc_id, shard,
       |      CAST(row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id)
       |        AS BIGINT) AS pos
       |    FROM s)),
       |sz AS (SELECT shard, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY shard),
       |os AS (
       |  SELECT shard, CAST(COALESCE(SUM(n) OVER (ORDER BY shard
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS base
       |  FROM sz)
       |SELECT p.doc_id, p.shard, p.pos, p.pos + o.base AS global_pos
       |FROM p JOIN os o USING (shard)
       |ORDER BY doc_id""".stripMargin

  val qEpochShuffle: GraftQuery = GraftQuery(
    "q148_epoch_shuffle", epochShuffleSql("ep1")) { (s, d) =>
    epochShuffle(s, d, "ep1")
  }

  /** Epoch shuffle under a different seed — spec-only entry point for
    * the independence assertion. */
  private[graft] def epochShuffleFor(s: org.apache.spark.sql.SparkSession,
      d: String, seed: String): org.apache.spark.sql.DataFrame =
    epochShuffle(s, d, seed)

  /** SPLIT-LEAKAGE AUDIT: q110's hash split guarantees a DOCUMENT
    * never changes split, but content can still leak across splits
    * through near-identical documents — exactly what an eval set must
    * not share with train. This measures it at the q117 5-gram grain:
    * for every val/test document, the fraction of its 5-gram
    * positions whose gram also occurs anywhere in the train split.
    * High leak_frac docs are eval contamination; the decontamination
    * gate (q65/q123) removes them from TRAIN against an external
    * benchmark, while this audits the pipeline's OWN split boundary.
    *
    * 100 TB: gram positions join the distinct-train-gram relation on
    * a fixed-width md5 fingerprint (never the raw gram string); the
    * join is gram-key equi-partitioned — the q117 physics, corpus ×
    * compact-gram-set, never doc × doc. A production run would put
    * the q123 bloom prune in front so only candidate positions reach
    * the exchange. */
  val qSplitLeakage: GraftQuery = GraftQuery(
    "q149_split_leakage",
    s"""WITH base AS (
       |  SELECT doc_id,
       |    ${splitSqlCase("doc_id")} AS split,
       |    string_split(lower(text), ' ') AS t
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, split,
       |    md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
       |      || ' ' || t[i+4]) AS fp
       |  FROM (SELECT doc_id, split, t, unnest(range(1, len(t) - 3)) AS i
       |        FROM base)),
       |train_g AS (SELECT DISTINCT fp FROM grams WHERE split = 'train'),
       |ev AS (
       |  SELECT g.doc_id, g.split, (t.fp IS NOT NULL) AS leaked
       |  FROM grams g LEFT JOIN train_g t ON g.fp = t.fp
       |  WHERE g.split <> 'train')
       |SELECT doc_id, split,
       |  CAST(count(*) AS BIGINT) AS n_grams,
       |  CAST(count(*) FILTER (leaked) AS BIGINT) AS n_leaked,
       |  CAST(count(*) FILTER (leaked) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |    AS leak_frac
       |FROM ev GROUP BY doc_id, split
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val base = Tables.documents(s, d)
      .select(col("doc_id"), splitColumn(col("doc_id")).as("split"),
        split(lower(col("text")), " ").as("t"))
    val grams = base.where(size(col("t")) >= 5)
      .select(col("doc_id"), col("split"),
        explode(sequence(lit(1), size(col("t")) - 4)).as("i"), col("t"))
      .select(col("doc_id"), col("split"),
        md5(concat_ws(" ", slice(col("t"), col("i"), lit(5)))).as("fp"))
    val trainG = grams.where(col("split") === "train")
      .select("fp").distinct()
      .withColumn("leaked", lit(true))
    grams.where(col("split") =!= "train")
      .join(trainG, Seq("fp"), "left")
      .groupBy("doc_id", "split")
      .agg(count(lit(1)).as("n_grams"),
        count(when(col("leaked"), 1)).as("n_leaked"),
        (count(when(col("leaked"), 1)).cast("double")
          / count(lit(1)).cast("double")).as("leak_frac"))
      .orderBy("doc_id")
  }

  /** QUALITY-CURRICULUM ORDERING: a deterministic easy-to-hard (here:
    * high-quality-first) training order over the corpus, WITHOUT a
    * global sort. Each document is scored by the learned gate's exact
    * logit (q129's fixed 2^-20-quantized weights — bit-stable in both
    * engines), sharded by a hash digit, and decile-binned WITHIN its
    * shard by integer rank arithmetic; hash uniformity makes
    * within-shard deciles statistically equal to global deciles. The
    * final global_pos walks (bin, shard, rank) lexicographically:
    * ascending order visits the best decile of every shard first,
    * interleaving shards — a stochastic curriculum that any trainer
    * can consume via ORDER BY global_pos.
    *
    * 100 TB: the expensive relation only ever sorts WITHIN a shard
    * (16 here, 2^k in production — each a bounded independent sort,
    * the q111/q148 two-level physics); the bin offsets come from a
    * |shards|×10-row aggregate windowed on the driver-scale relation
    * and broadcast back. No stage touches a single-partition global
    * window. */
  val qCurriculumOrder: GraftQuery = GraftQuery(
    "q155_curriculum_order",
    s"""WITH grams AS (
       |  ${TextVector.gramsSql}),
       |vecs AS (
       |  ${TextVector.vecSql}),
       |sc AS (
       |  SELECT doc_id, ${QualityGate.dotSql} AS logit,
       |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard
       |  FROM vecs),
       |r AS (
       |  SELECT doc_id, shard, logit,
       |    CAST(row_number() OVER (PARTITION BY shard
       |      ORDER BY logit DESC, doc_id) AS BIGINT) AS rn,
       |    CAST(count(*) OVER (PARTITION BY shard) AS BIGINT) AS n
       |  FROM sc),
       |b AS (
       |  SELECT doc_id, shard, rn,
       |    CAST(((rn - 1) * 10) // n AS INTEGER) AS bin
       |  FROM r),
       |rb AS (
       |  SELECT doc_id, shard, bin,
       |    CAST(row_number() OVER (PARTITION BY shard, bin ORDER BY rn)
       |      AS BIGINT) AS pos
       |  FROM b),
       |sz AS (
       |  SELECT shard, bin, CAST(count(*) AS BIGINT) AS cnt
       |  FROM b GROUP BY shard, bin),
       |os AS (
       |  SELECT shard, bin, CAST(COALESCE(SUM(cnt) OVER (ORDER BY bin, shard
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    AS base
       |  FROM sz)
       |SELECT rb.doc_id, rb.shard, rb.bin, rb.pos + os.base AS global_pos
       |FROM rb JOIN os USING (shard, bin)
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val sc = Tables.documents(s, d)
      .select(col("doc_id"),
        org.apache.spark.sql.graftshim.CharGramVector(col("text"), TextVector.dim).as("v"),
        substring(md5(col("doc_id").cast("string")), 1, 1).as("shard"))
      .select(col("doc_id"), col("shard"),
        QualityGate.logitOf(col("v")).as("logit"))
    val wShard = Window.partitionBy("shard")
    val r = sc
      .withColumn("rn", row_number().over(
        wShard.orderBy(col("logit").desc, col("doc_id"))).cast("long"))
      .withColumn("n", count(lit(1)).over(wShard).cast("long"))
    val b = r.withColumn("bin", expr("((rn - 1) * 10) DIV n").cast("int"))
    val rb = b.withColumn("pos", row_number().over(
      Window.partitionBy("shard", "bin").orderBy("rn")).cast("long"))
    val sz = b.groupBy("shard", "bin").agg(count(lit(1)).as("cnt"))
    val os = sz.withColumn("base",
      coalesce(sum("cnt").over(Window.orderBy("bin", "shard")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("shard", "bin", "base")
    rb.join(broadcast(os), Seq("shard", "bin"))
      .select(col("doc_id"), col("shard"), col("bin"),
        (col("pos") + col("base")).as("global_pos"))
      .orderBy("doc_id")
  }

  /** SOURCE QUOTA CAP: no single source may exceed CapPermille of the
    * corpus token mass (the RefinedWeb/CommonCrawl-curation rule that
    * stops one mega-domain from dominating the mixture). Each doc is
    * kept with probability min(1, cap/T_src) via the exact q137
    * cross-multiplied gate — h·T_src·1000 < 2³²·T·CapPermille — so a
    * source under its quota survives whole and an over-quota source
    * downsamples to the cap, with zero coordination beyond the
    * |sources|-row totals broadcast.
    *
    * 100 TB: one aggregate pass for per-source token totals, then a
    * scan-fused per-row predicate — the q109/q137 sampling physics. */
  private val CapPermille = 30L

  val qSourceQuotaCap: GraftQuery = GraftQuery(
    "q157_source_quota_cap",
    s"""WITH toks AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
       |    CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
       |  FROM documents),
       |tot AS (
       |  SELECT source, CAST(sum(n_tok) AS BIGINT) AS t_src
       |  FROM toks GROUP BY source),
       |g AS (SELECT CAST(sum(t_src) AS BIGINT) AS t_all FROM tot),
       |kept AS (
       |  SELECT t.doc_id, t.source, t.n_tok, tot.t_src
       |  FROM toks t JOIN tot USING (source) CROSS JOIN g
       |  WHERE CAST(t.h AS HUGEINT) * CAST(tot.t_src AS HUGEINT) * 1000
       |      < CAST(4294967296 AS HUGEINT) * CAST(g.t_all AS HUGEINT)
       |        * $CapPermille)
       |SELECT source,
       |  max(t_src) AS src_tokens,
       |  CAST(count(*) AS BIGINT) AS kept_docs,
       |  CAST(sum(n_tok) AS BIGINT) AS kept_tokens
       |FROM kept
       |GROUP BY source
       |ORDER BY source""".stripMargin) { (s, d) =>
    val toks = Tables.documents(s, d).select(
      col("doc_id"), col("source"),
      tokenCount(col("text")).cast("long").as("n_tok"),
      gate32(col("doc_id")).as("h"))
    val tot = toks.groupBy("source").agg(sum("n_tok").as("t_src"))
    val g = tot.agg(sum("t_src").cast("long").as("t_all"))
    toks.join(broadcast(tot), "source")
      .crossJoin(broadcast(g))
      .where(budgetKeep(col("h"), col("t_src"), col("t_all"), lit(CapPermille)))
      .groupBy("source")
      .agg(max("t_src").as("src_tokens"),
        count(lit(1)).as("kept_docs"),
        sum("n_tok").as("kept_tokens"))
      .orderBy("source")
  }

  /** PACKING EFFICIENCY AUDIT: the metric sheet for q111's
    * concat-and-chunk streams — per (lang, shard): documents, token
    * mass, emitted sequences (= ⌈T/2048⌉), TAIL WASTE (the unfilled
    * remainder of each stream's final sequence — concat-and-chunk's
    * only waste; padded-per-doc packing wastes per SEQUENCE, which is
    * why pretraining pipelines concat), and the straddler count (docs
    * crossing a sequence boundary — the attention-masking cost of
    * zero waste). All integer arithmetic off q111's own window sums.
    *
    * 100 TB: the same bounded per-(lang, shard) window as q111, then
    * a |langs×shards|-row aggregate — nothing new shuffles. */
  val qPackingAudit: GraftQuery = GraftQuery(
    "q162_packing_audit",
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents),
      |packed AS (
      |  SELECT doc_id, lang, shard, n_tok,
      |    CAST(COALESCE(SUM(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
      |  FROM toks),
      |spans AS (
      |  SELECT doc_id, lang, shard, n_tok,
      |    (start_tok + n_tok - 1) // 2048 - start_tok // 2048 AS crossings
      |  FROM packed)
      |SELECT lang, shard,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS total_tok,
      |  (CAST(sum(n_tok) AS BIGINT) + 2047) // 2048 AS n_seqs,
      |  ((CAST(sum(n_tok) AS BIGINT) + 2047) // 2048) * 2048
      |    - CAST(sum(n_tok) AS BIGINT) AS tail_waste,
      |  CAST(count(*) FILTER (crossings > 0) AS BIGINT) AS n_straddlers
      |FROM spans
      |GROUP BY lang, shard
      |ORDER BY lang NULLS FIRST, shard""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("lang", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .select(
        col("doc_id"), col("lang"),
        substring(md5(col("doc_id").cast("string")), 1, 1).as("shard"),
        tokenCount(col("text")).cast("long").as("n_tok"))
      .withColumn("start_tok", coalesce(sum("n_tok").over(w), lit(0L)))
      .withColumn("crossings",
        expr("(start_tok + n_tok - 1) DIV 2048 - start_tok DIV 2048"))
      .groupBy("lang", "shard")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("total_tok"),
        count(when(col("crossings") > 0, 1)).as("n_straddlers"))
      .withColumn("n_seqs", expr("(total_tok + 2047) DIV 2048"))
      .withColumn("tail_waste", col("n_seqs") * 2048 - col("total_tok"))
      .select("lang", "shard", "n_docs", "total_tok", "n_seqs",
        "tail_waste", "n_straddlers")
      .orderBy(asc_nulls_first("lang"), col("shard"))
  }

  /** TEMPERATURE mixture (α = 0.5): q137 takes the per-language
    * weights as GIVEN; the UniMax/mC4 lineage instead derives them
    * from the corpus itself, w_l ∝ T_l^α — α < 1 flattens the natural
    * distribution so low-resource languages keep a super-proportional
    * share. α = 1/2 is the canonical setting AND the one that stays
    * on the engine's exactness discipline: sqrt is IEEE
    * correctly-rounded in both engines (unlike pow/exp, which are
    * libm-dependent), and ⌊sqrt(T_l)·2^20⌋ is exact integer
    * arithmetic after it (×2^20 is a power-of-two scale, floor is
    * exact) — so the quantized weights, their sum, and the
    * cross-multiplied gate
    *   h · ΣW · T_l < 2^32 · B · W_l
    * are all bit-deterministic. Products reach ~1e36 at 100 TB
    * (h·ΣW·T_l ≈ 4e9 · 1e13 · 2.5e13) — inside DECIMAL(38,0)/HUGEINT
    * with two digits to spare; the scaladoc'd bound is the contract.
    *
    * 100 TB physics: identical to q137 — one aggregate pass for the
    * per-language totals, a |langs|-row broadcast, then a scan-fused
    * integer gate. The temperature computation adds zero shuffles. */
  val qTemperatureMix: GraftQuery = GraftQuery(
    "q174_temperature_mix",
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |    CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
      |  FROM documents),
      |tot AS (
      |  SELECT lang, CAST(sum(n_tok) AS BIGINT) AS t_lang
      |  FROM toks GROUP BY lang),
      |wts AS (
      |  SELECT lang, t_lang,
      |    CAST(FLOOR(sqrt(CAST(t_lang AS DOUBLE)) * 1048576) AS BIGINT) AS w
      |  FROM tot),
      |g AS (
      |  SELECT CAST(sum(t_lang) AS BIGINT) // 2 AS budget,
      |    CAST(sum(w) AS BIGINT) AS w_sum
      |  FROM wts),
      |kept AS (
      |  SELECT t.doc_id, t.lang, t.n_tok, w.t_lang, w.w
      |  FROM toks t JOIN wts w USING (lang) CROSS JOIN g
      |  WHERE CAST(t.h AS HUGEINT) * CAST(g.w_sum AS HUGEINT)
      |        * CAST(w.t_lang AS HUGEINT)
      |      < CAST(4294967296 AS HUGEINT) * CAST(g.budget AS HUGEINT)
      |        * CAST(w.w AS HUGEINT))
      |SELECT lang,
      |  max(w) AS weight_q20,
      |  CAST(count(*) AS BIGINT) AS kept_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS kept_tokens,
      |  max(t_lang) AS total_tokens
      |FROM kept
      |GROUP BY lang
      |ORDER BY lang NULLS FIRST""".stripMargin) { (s, d) =>
    val toks = Tables.documents(s, d).select(
      col("doc_id"), col("lang"),
      tokenCount(col("text")).cast("long").as("n_tok"),
      gate32(col("doc_id")).as("h"))
    val tot = toks.groupBy("lang").agg(sum("n_tok").as("t_lang"))
    val wts = tot.withColumn("w",
      floor(sqrt(col("t_lang").cast("double")) * 1048576L))
    val g = wts.agg(sum("t_lang").cast("long").as("t_all"), sum("w").as("w_sum"))
      .select(expr("t_all DIV 2").as("budget"), col("w_sum"))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    toks.join(broadcast(wts), "lang")
      .crossJoin(broadcast(g))
      .where(dec(col("h")) * dec(col("w_sum")) * dec(col("t_lang")) <
        dec(lit(4294967296L)) * dec(col("budget")) * dec(col("w")))
      .groupBy("lang")
      .agg(max("w").as("weight_q20"),
        count(lit(1)).as("kept_docs"),
        sum("n_tok").as("kept_tokens"),
        max("t_lang").as("total_tokens"))
      .select(col("lang"), col("weight_q20"), col("kept_docs"),
        col("kept_tokens"), col("total_tokens"))
      .orderBy(asc_nulls_first("lang"))
  }

  /** LENGTH-BUCKETED WHOLE-DOC PACKING audit — the SFT-style packer
    * that never splits a document (q111/q162's concat-and-chunk takes
    * zero tail waste but pays straddlers; instruction tuning can't
    * straddle, so it pads). Docs bucket by k = L div n_tok (how many
    * fit a 2048-token sequence); same-k docs pack k-per-sequence — a
    * deterministic, coordination-free grouping (any k docs of the
    * bucket fit by construction: k·n_tok ≤ L). Per lang the audit
    * reports exact sequences used and padding waste in ppm of emitted
    * capacity, against the one-doc-per-sequence naive padder —
    * the measured argument for bucketing (waste shrinks toward the
    * tail-of-bucket remainder). Over-length docs (n_tok > L) are
    * counted and excluded (they go to the q114 chunker).
    *
    * Scale (100 TB): one (lang, k) aggregate (map-side combinable,
    * ≤ |langs|·L cells), one lang rollup — the packer itself needs no
    * global sort: bucket membership is a per-row expression and any
    * k-subset of a bucket forms a sequence. */
  val qBucketedPacking: GraftQuery = GraftQuery(
    "q276_bucketed_packing",
    """WITH toks AS (
      |  SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      |  FROM documents),
      |eligible AS (
      |  SELECT lang, n_tok, 2048 // n_tok AS k FROM toks
      |  WHERE n_tok <= 2048 AND n_tok > 0),
      |grp AS (
      |  SELECT lang, k, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(n_tok) AS BIGINT) AS tok
      |  FROM eligible GROUP BY lang, k),
      |packed AS (
      |  SELECT lang, k, n_docs, tok,
      |    (n_docs + k - 1) // k AS n_seq
      |  FROM grp),
      |rollup_l AS (
      |  SELECT lang,
      |    CAST(SUM(n_docs) AS BIGINT) AS n_docs,
      |    CAST(SUM(tok) AS BIGINT) AS total_tok,
      |    CAST(SUM(n_seq) AS BIGINT) AS n_seq_packed
      |  FROM packed GROUP BY lang),
      |overlong AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_overlong
      |  FROM toks WHERE n_tok > 2048 GROUP BY lang)
      |SELECT r.lang, r.n_docs,
      |  COALESCE(o.n_overlong, 0) AS n_overlong,
      |  r.total_tok, r.n_seq_packed,
      |  CAST(((r.n_seq_packed * 2048 - r.total_tok) * 1000000)
      |    // (r.n_seq_packed * 2048) AS BIGINT) AS waste_packed_ppm,
      |  CAST(((r.n_docs * 2048 - r.total_tok) * 1000000)
      |    // (r.n_docs * 2048) AS BIGINT) AS waste_naive_ppm
      |FROM rollup_l r LEFT JOIN overlong o ON o.lang = r.lang
      |ORDER BY r.lang""".stripMargin) { (s, d) =>
    val toks = Tables.documents(s, d).select(col("lang"),
      tokenCount(col("text")).cast("long").as("n_tok"))
    val eligible = toks.where(col("n_tok") <= 2048 && col("n_tok") > 0)
      .withColumn("k", expr("2048 div n_tok"))
    val grp = eligible.groupBy("lang", "k")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("tok"))
    val packed = grp.withColumn("n_seq", expr("(n_docs + k - 1) div k"))
    val rollupL = packed.groupBy("lang").agg(
      sum("n_docs").as("n_docs"),
      sum("tok").as("total_tok"),
      sum("n_seq").as("n_seq_packed"))
    val overlong = toks.where(col("n_tok") > 2048)
      .groupBy("lang").agg(count(lit(1)).as("n_overlong"))
    rollupL.join(overlong, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"),
        coalesce(col("n_overlong"), lit(0L)).as("n_overlong"),
        col("total_tok"), col("n_seq_packed"),
        expr("((n_seq_packed * 2048 - total_tok) * 1000000) div (n_seq_packed * 2048)")
          .as("waste_packed_ppm"),
        expr("((n_docs * 2048 - total_tok) * 1000000) div (n_docs * 2048)")
          .as("waste_naive_ppm"))
      .orderBy("lang")
  }

  val all: Seq[GraftQuery] =
    Seq(qStratifiedMix, qTrainSplit, qPackSequences, qCorpusCard,
      qChunkDocuments, qFimExamples, qTokenBudgetMix, qDedupAwareMix, qEpochShuffle, qSplitLeakage,
      qCurriculumOrder, qSourceQuotaCap, qPackingAudit, qTemperatureMix,
      qBucketedPacking, qClusterSafeSplit)
}
