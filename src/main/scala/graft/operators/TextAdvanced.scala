package graft.operators

import graft.GraftQuery
import graft.functions.TextFunctions
import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Second tranche of the LLM-data-pipeline text surface: tf-idf term
  * ranking, corpus bigram statistics, benchmark-contamination
  * detection, and quality-stratified selection.
  *
  * Scale notes (100 TB):
  *  - tf-idf: two hash aggregates (term-frequency, document-frequency)
  *    plus a join on term — df is Zipf-small relative to the corpus, so
  *    the join side is compact; no driver-side vocabulary.
  *  - contamination: the shingle inverted-index join touches only
  *    shingles that appear on BOTH sides — the standard way benchmark
  *    decontamination scales (never doc × doc).
  *  - tf-idf scores are tf·N/df (log-free): ln() is not bit-specified
  *    across libm implementations, while this rational score is one
  *    exact int product and one correctly-rounded division — same
  *    ranking semantics, engine-stable.
  */
object TextAdvanced {

  /** Per-doc top-3 terms by rational tf-idf (ties → lexicographic). */
  val qTfIdf: GraftQuery = GraftQuery(
    "q63_tfidf_topterms",
    """WITH tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents)
      |  GROUP BY doc_id, term),
      |df AS (
      |  SELECT term, COUNT(*) AS df
      |  FROM (SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS term
      |        FROM documents)
      |  GROUP BY term),
      |n AS (SELECT COUNT(*) AS n_docs FROM documents),
      |ranked AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
      |    row_number() OVER (PARTITION BY tf.doc_id
      |      ORDER BY CAST(tf.tf AS DOUBLE) * n.n_docs / df.df DESC, tf.term) AS rank
      |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n)
      |SELECT doc_id, CAST(rank AS INTEGER) AS rank, term, tf, df
      |FROM ranked WHERE rank <= 3
      |ORDER BY doc_id, rank""".stripMargin) { (s, d) =>
    // repartition the COMPACT doc relation before the ~100x token
    // explosion: the exchange moves the small side; the expansion (and
    // its partial aggregation) then runs at full parallelism even when
    // the input arrives as few large row groups (one scan task).
    val docs = Tables.documents(s, d).repartition(32)
    val exploded = docs.select(col("doc_id"),
      explode(split(lower(col("text")), " ")).as("term"))
    val tf = exploded.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // df DERIVES from tf (one row per (doc, term) already): the token
    // explosion is scanned once, and the exploded→distinct shuffle the
    // naive form pays disappears — at corpus scale that was the second
    // full pass over every token
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id")
      .orderBy((col("tf").cast("double") * col("n_docs") / col("df")).desc, col("term"))
    tf.join(df, "term").crossJoin(broadcast(nDocs))
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= 3)
      .select("doc_id", "rank", "term", "tf", "df")
      .orderBy("doc_id", "rank")
  }

  /** Corpus-wide top-20 bigrams. Bigram construction is positional
    * (array index zip), then one hash aggregate + TakeOrdered. */
  val qBigrams: GraftQuery = GraftQuery(
    "q64_bigrams_top",
    """WITH toks AS (SELECT string_split(lower(text), ' ') AS t FROM documents),
      |big AS (
      |  SELECT unnest(list_filter(
      |    list_transform(range(1, greatest(len(t), 2)), i -> t[i] || ' ' || t[i+1]),
      |    x -> x IS NOT NULL)) AS bigram
      |  FROM toks)
      |SELECT bigram, COUNT(*) AS n
      |FROM big GROUP BY bigram
      |ORDER BY n DESC, bigram
      |LIMIT 20""".stripMargin) { (s, d) =>
    // bind the token array to a COLUMN before the lambda: Spark does
    // not CSE subexpressions inside higher-order-function lambdas, so
    // inlining split() here would re-tokenize the text once per
    // element (measured 30x slower). Single-token docs yield an empty
    // array explicitly — element_at past the end THROWS under Spark
    // 4's default ANSI mode (where the DuckDB oracle NULLs + filters).
    val t = col("__toks")
    val bigrams = when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => concat(element_at(t, i), lit(" "), element_at(t, i + 1))))
      .otherwise(array().cast("array<string>"))
    Tables.documents(s, d).repartition(32)
      .select(split(lower(col("text")), " ").as("__toks"))
      .select(explode(bigrams).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(20)
  }

  /** Benchmark-contamination check: training docs (source <> 'src0')
    * sharing any 3-word shingle with a benchmark doc (source = 'src0'),
    * with the shared-shingle count per (train, bench) pair. */
  val qContamination: GraftQuery = GraftQuery(
    "q65_contamination",
    s"""WITH bench AS (
       |  SELECT doc_id, unnest(${Dedup.shinglesSql}) AS sh
       |  FROM documents WHERE source = 'src0'),
       |train AS (
       |  SELECT doc_id, unnest(${Dedup.shinglesSql}) AS sh
       |  FROM documents WHERE source <> 'src0')
       |SELECT t.doc_id AS train_doc, b.doc_id AS bench_doc, COUNT(*) AS n_shared
       |FROM train t JOIN bench b ON t.sh = b.sh
       |GROUP BY t.doc_id, b.doc_id
       |ORDER BY train_doc, bench_doc""".stripMargin) { (s, d) =>
    // reuse the persisted per-corpus shingle index (built once for the
    // dedup family) instead of re-shingling both sides. The source
    // lookup joins on doc_id WITHOUT a broadcast hint: it is
    // corpus-sized (one row per document), so forcing it to the driver
    // would break exactly at the scale this query is designed for.
    val src = Tables.documents(s, d).select(col("doc_id"), col("source"))
    val ex = Dedup.indexedShingleSets(s, d).join(src, "doc_id")
      .select(col("doc_id"), col("source"), explode(col("toks")).as("sh"))
    ex.where(col("source") === "src0").select(col("doc_id").as("bench_doc"), col("sh"))
      .join(ex.where(col("source") =!= "src0")
        .select(col("doc_id").as("train_doc"), col("sh")), "sh")
      .groupBy("train_doc", "bench_doc")
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("train_doc", "bench_doc")
  }

  /** DuckDB rendering of TextFunctions.qualityScore — the same
    * fixed-order double chain over exact ints, reused by q66 and q72. */
  private[operators] val qualitySql: String =
    s"""(least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 50.0, 1.0) +
       |     least(CAST(${TextQueries.hitCountSql(stopwords)} AS DOUBLE) /
       |           greatest(len(string_split(text, ' ')), 1) * 5.0, 1.0) +
       |     (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE) /
       |                  greatest(length(text), 1) * 4.0, 1.0))) / 3.0""".stripMargin

  /** Quality-stratified selection: top-2 docs per language by the
    * composite quality score (score desc, doc_id tie-break). The score
    * chain is fixed-order double arithmetic over exact ints — engine
    * stable, so it is safe to emit. */
  val qQualityTopK: GraftQuery = GraftQuery(
    "q66_quality_topk",
    s"""WITH scored AS (
       |  SELECT doc_id, lang, $qualitySql AS quality
       |  FROM documents),
       |ranked AS (
       |  SELECT doc_id, lang, quality,
       |    row_number() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) AS rank
       |  FROM scored)
       |SELECT lang, CAST(rank AS INTEGER) AS rank, doc_id, quality
       |FROM ranked WHERE rank <= 2
       |ORDER BY lang, rank""".stripMargin) { (s, d) =>
    val w = Window.partitionBy("lang")
      .orderBy(col("quality").desc, col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("lang"),
        TextFunctions.qualityScore(col("text")).as("quality"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .where(col("rank") <= 2)
      .select("lang", "rank", "doc_id", "quality")
      .orderBy("lang", "rank")
  }

  /** Capstone: the full training-data curation pipeline as ONE
    * oracle-checked dataflow — exact dedup (keep lowest id per content
    * fingerprint), near-dup removal (drop the higher-id side of every
    * Jaccard-verified LSH pair), quality gate, then a per-(lang,
    * source) corpus report. Every stage reuses the persisted per-
    * corpus indexes; the only per-query work is the drop-set join and
    * the final aggregate — exactly how a 100 TB curation run is
    * structured (indexes materialized once, policy passes cheap). */
  val qCurationPipeline: GraftQuery = GraftQuery(
    "q72_curation_pipeline",
    s"""WITH ${Dedup.bandsCte},
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b
       |    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       |   AND a.doc_id < b.doc_id),
       |toks AS (SELECT doc_id, ${Dedup.shinglesSql} AS t FROM documents),
       |neardup_drop AS (
       |  SELECT DISTINCT p.doc_b AS doc_id
       |  FROM pairs p
       |  JOIN toks ta ON p.doc_a = ta.doc_id
       |  JOIN toks tb ON p.doc_b = tb.doc_id
       |  WHERE CAST(len(list_intersect(ta.t, tb.t)) AS DOUBLE) /
       |        len(list_distinct(list_concat(ta.t, tb.t))) >= 0.9),
       |exact_keep AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, min(doc_id) OVER (PARTITION BY md5(lower(text))) AS keep_id
       |    FROM documents)
       |  WHERE doc_id = keep_id),
       |quality AS (
       |  SELECT doc_id, lang, source, $qualitySql AS q,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
       |  FROM documents),
       |survivors AS (
       |  SELECT q.* FROM quality q
       |  JOIN exact_keep k ON q.doc_id = k.doc_id
       |  WHERE q.q >= 0.45
       |    AND q.doc_id NOT IN (SELECT doc_id FROM neardup_drop))
       |SELECT lang, source, COUNT(*) AS n_docs,
       |  CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       |  MIN(doc_id) AS min_doc
       |FROM survivors
       |GROUP BY lang, source
       |ORDER BY lang, source""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val fpWin = Window.partitionBy(TextFunctions.contentFingerprint(col("text")))
    val exactKeep = docs
      .withColumn("keep_id", min(col("doc_id")).over(fpWin))
      .where(col("doc_id") === col("keep_id"))
    val nearDrop = Dedup.withJaccardToks(
        Dedup.candidatePairsFromBands(Dedup.indexedBands(s, d)),
        Dedup.indexedShingleSets(s, d))
      .where(col("jaccard") >= 0.9)
      .select(col("doc_b").as("doc_id")).distinct()
    exactKeep
      .where(TextFunctions.qualityScore(col("text")) >= 0.45)
      .join(nearDrop, Seq("doc_id"), "left_anti")
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(col("text")).cast("long")).as("total_tokens"),
        min(col("doc_id")).as("min_doc"))
      .orderBy("lang", "source")
  }

  /** Redaction pass (PII-scrub shape): numeric literals and quoted
    * values masked from the raw event props, with audit counts —
    * the pattern is deliberately dialect-neutral (char classes only)
    * so Java regex and RE2-style engines agree. */
  val qRedact: GraftQuery = GraftQuery(
    "q81_redact",
    """SELECT event_id,
      |  regexp_replace(regexp_replace(props, '[0-9]+(\.[0-9]+)?', '<NUM>', 'g'),
      |                 '"[a-z]+"', '<STR>', 'g') AS redacted,
      |  CAST(len(regexp_extract_all(props, '[0-9]+(\.[0-9]+)?')) AS INTEGER) AS n_nums_masked,
      |  CAST(len(regexp_extract_all(props, '"[a-z]+"')) AS INTEGER) AS n_strs_masked
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d).select(
      col("event_id"),
      regexp_replace(regexp_replace(col("props"), "[0-9]+(\\.[0-9]+)?", "<NUM>"),
        "\"[a-z]+\"", "<STR>").as("redacted"),
      size(regexp_extract_all(col("props"), lit("[0-9]+(\\.[0-9]+)?"), lit(0)))
        .as("n_nums_masked"),
      size(regexp_extract_all(col("props"), lit("\"[a-z]+\""), lit(0)))
        .as("n_strs_masked"))
      .orderBy("event_id")
  }

  /** Repetition detection (training-data quality): type-token ratio
    * and the highest single-token repeat count per document. Ints and
    * one exact division — engine-stable. */
  val qRepetition: GraftQuery = GraftQuery(
    "q82_repetition",
    """WITH counts AS (
      |  SELECT doc_id, term, COUNT(*) AS c
      |  FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents)
      |  GROUP BY doc_id, term)
      |SELECT doc_id,
      |  CAST(COUNT(*) AS INTEGER) AS n_distinct_tokens,
      |  CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  CAST(MAX(c) AS INTEGER) AS max_repeat,
      |  CAST(COUNT(*) AS DOUBLE) / SUM(c) AS type_token_ratio
      |FROM counts
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_distinct_tokens"),
        sum(col("c")).as("n_tokens"),
        max(col("c")).cast("int").as("max_repeat"),
        (count(lit(1)).cast("double") / sum(col("c"))).as("type_token_ratio"))
      .orderBy("doc_id")
  }

  /** BM25 retrieval scoring for a fixed 3-term query, with the same
    * libm-free discipline as q63: the idf factor is the rational
    * (N - df + 0.5)/(df + 0.5) instead of its log (ln is not
    * bit-specified across engines; the rational form preserves the
    * per-term ordering), and both sides spell the arithmetic with
    * identical parenthesization so every IEEE operation sequence —
    * and therefore every output bit — matches. Corpus stats
    * (N, df, Σdl) reduce to ONE row that is broadcast back over the
    * docs: at 100 TB this is a map-side scan + a 1-row crossjoin, no
    * per-doc shuffle at all (the ORDER BY exists for the oracle). */
  private[operators] val bm25Terms = Seq("join", "scan", "vector")

  /** toks/feat/stats CTE block shared by q113 and the hybrid-retrieval
    * fusion (q134) — ONE source of truth for the BM25 arithmetic. */
  private[operators] val bm25CtesSql: String = {
    val termFeatSql = bm25Terms.map(t =>
      s"    CAST(len(list_filter(t, x -> x = '$t')) AS BIGINT) AS tf_$t").mkString(",\n")
    val termDfSql = bm25Terms.map(t =>
      s"    CAST(sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t").mkString(",\n")
    s"""toks AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
       |feat AS (
       |  SELECT doc_id, CAST(len(t) AS BIGINT) AS dl,
       |$termFeatSql
       |  FROM toks),
       |stats AS (
       |  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl,
       |$termDfSql
       |  FROM feat)""".stripMargin
  }

  // every fractional constant is CAST to DOUBLE: a bare 0.5 parses
  // as DECIMAL in DuckDB, and BIGINT+DECIMAL chains round under
  // decimal arithmetic — off-by-one-ulp vs Spark's double path
  private def bm25ScoreSql(t: String): String =
    s"(((n_docs - df_$t) + CAST(0.5 AS DOUBLE)) / (df_$t + CAST(0.5 AS DOUBLE))) * " +
      s"((tf_$t * CAST(2.2 AS DOUBLE)) / " +
      s"(tf_$t + (CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + " +
      s"(CAST(0.75 AS DOUBLE) * (dl / (CAST(sum_dl AS DOUBLE) / n_docs)))))))"

  /** Total 3-term score over the `feat CROSS JOIN stats` relation. */
  private[operators] val bm25TotalScoreSql: String =
    s"((${bm25ScoreSql(bm25Terms(0))} + ${bm25ScoreSql(bm25Terms(1))}) + ${bm25ScoreSql(bm25Terms(2))})"

  /** Per-doc BM25 features joined with the broadcast 1-row corpus
    * stats: (doc_id, dl, tf_*, n_docs, sum_dl, df_*). At 100 TB this
    * is a map-side scan + a 1-row crossjoin, no per-doc shuffle. */
  private[operators] def bm25FeatWithStats(s: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    val t = col("__toks")
    val feat = Tables.documents(s, d)
      .select(col("doc_id"), split(lower(col("text")), " ").as("__toks"))
      .select(
        col("doc_id") +: size(t).cast("long").as("dl") +:
          bm25Terms.map(w =>
            size(filter(t, x => x === lit(w))).cast("long").as(s"tf_$w")): _*)
    val aggCols = Seq(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")) ++
      bm25Terms.map(w => sum(when(col(s"tf_$w") > 0, 1L).otherwise(0L)).as(s"df_$w"))
    feat.crossJoin(broadcast(feat.agg(aggCols.head, aggCols.tail: _*)))
  }

  /** Identical shape to [[bm25TotalScoreSql]]: rational idf ×
    * saturated tf, dl normalized by (Σdl / N); parenthesization
    * mirrored exactly so every IEEE operation sequence matches. */
  private[operators] def bm25TotalScore: Column = {
    def score(w: String): Column =
      (((col("n_docs") - col(s"df_$w")) + lit(0.5)) / (col(s"df_$w") + lit(0.5))) *
        ((col(s"tf_$w") * lit(2.2)) /
          (col(s"tf_$w") + (lit(1.2) * (lit(0.25) +
            (lit(0.75) * (col("dl") / (col("sum_dl").cast("double") / col("n_docs"))))))))
    (score(bm25Terms(0)) + score(bm25Terms(1))) + score(bm25Terms(2))
  }

  val qBm25: GraftQuery = GraftQuery(
    "q113_bm25_score",
    s"""WITH $bm25CtesSql
       |SELECT doc_id, dl,
       |  ${bm25Terms.map(t => s"CAST(tf_$t AS INTEGER) AS tf_$t").mkString(", ")},
       |  $bm25TotalScoreSql AS score
       |FROM feat CROSS JOIN stats
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    bm25FeatWithStats(s, d)
      .select(
        col("doc_id") +: col("dl") +:
          bm25Terms.map(w => col(s"tf_$w").cast("int").as(s"tf_$w")) :+
          bm25TotalScore.as("score"): _*)
      .orderBy("doc_id")
  }

  /** TOKENIZER FERTILITY PER LANGUAGE: pieces-per-word and
    * chars-per-piece — the metric sheet a multilingual tokenizer
    * evaluation reads (high fertility = a language pays more sequence
    * positions per word; the standard equity check before fixing a
    * vocab). Pieces are the deterministic BPE-ish proxy count (q21's
    * oracle-paired regex); ratios are floor-divided integer ppm (the
    * q160 discipline — no doubles, engine-stable at any magnitude).
    *
    * 100 TB: one conditional aggregate per language over the scan —
    * map-side partials, |langs| output rows. */
  val qFertility: GraftQuery = GraftQuery(
    "q163_tokenizer_fertility",
    """WITH t AS (
      |  SELECT lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
      |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_piece,
      |    CAST(length(text) AS BIGINT) AS n_chars
      |  FROM documents),
      |agg AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(n_ws) AS BIGINT) AS ws_tokens,
      |    CAST(sum(n_piece) AS BIGINT) AS pieces,
      |    CAST(sum(n_chars) AS BIGINT) AS chars
      |  FROM t GROUP BY lang)
      |SELECT lang, n_docs, ws_tokens, pieces,
      |  CAST(CAST(pieces AS HUGEINT) * 1000000 // CAST(ws_tokens AS HUGEINT)
      |    AS BIGINT) AS fertility_ppm,
      |  CAST(CAST(chars AS HUGEINT) * 1000000 // CAST(pieces AS HUGEINT)
      |    AS BIGINT) AS chars_per_piece_ppm
      |FROM agg
      |ORDER BY lang NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .select(col("lang"),
        tokenCount(col("text")).cast("long").as("n_ws"),
        bpeishTokenCount(col("text")).cast("long").as("n_piece"),
        length(col("text")).cast("long").as("n_chars"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_ws").as("ws_tokens"),
        sum("n_piece").as("pieces"),
        sum("n_chars").as("chars"))
      .select(col("lang"), col("n_docs"), col("ws_tokens"), col("pieces"),
        expr("CAST(CAST(pieces AS DECIMAL(38,0)) * 1000000 DIV CAST(ws_tokens AS DECIMAL(38,0)) AS BIGINT)")
          .as("fertility_ppm"),
        expr("CAST(CAST(chars AS DECIMAL(38,0)) * 1000000 DIV CAST(pieces AS DECIMAL(38,0)) AS BIGINT)")
          .as("chars_per_piece_ppm"))
      .orderBy(asc_nulls_first("lang"))
  }

  /** CHUNK-GRAIN RETRIEVAL: q113's BM25 arithmetic at the passage
    * grain a RAG system actually serves — q122's 200-cp/stride-150
    * chunks are the scoring unit (df/avgdl corpus statistics are
    * chunk-level), and the answer is the global top-10 passages with
    * their parent doc. The retrieval unit changes, the verified
    * arithmetic doesn't: identical score expression, so the fused
    * ordering stays oracle-hash-checked.
    *
    * 100 TB: chunking is a shuffle-free per-row explode (q122);
    * per-chunk features are scan-fused; corpus stats reduce to ONE
    * broadcast row; the global top-10 is a TakeOrderedAndProject
    * (bounded heap per partition), never a global sort. */
  val qChunkRetrieval: GraftQuery = GraftQuery(
    "q166_chunk_retrieval",
    s"""WITH ${TrainingPipeline.chunksCteSql},
       |toks AS (
       |  SELECT doc_id, chunk_idx, string_split(lower(chunk), ' ') AS t
       |  FROM chunks),
       |feat AS (
       |  SELECT doc_id, chunk_idx, CAST(len(t) AS BIGINT) AS dl,
       |${bm25Terms.map(t => s"    CAST(len(list_filter(t, x -> x = '$t')) AS BIGINT) AS tf_$t").mkString(",\n")}
       |  FROM toks),
       |stats AS (
       |  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl,
       |${bm25Terms.map(t => s"    CAST(sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t").mkString(",\n")}
       |  FROM feat)
       |SELECT doc_id, chunk_idx, $bm25TotalScoreSql AS score
       |FROM feat CROSS JOIN stats
       |ORDER BY score DESC, doc_id, chunk_idx
       |LIMIT 10""".stripMargin) { (s, d) =>
    val t = col("__toks")
    val feat = TrainingPipeline.chunkRelation(s, d)
      .select(col("doc_id"), col("chunk_idx"),
        split(lower(col("chunk")), " ").as("__toks"))
      .select(
        col("doc_id") +: col("chunk_idx") +: size(t).cast("long").as("dl") +:
          bm25Terms.map(w =>
            size(filter(t, x => x === lit(w))).cast("long").as(s"tf_$w")): _*)
    val aggCols = Seq(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl")) ++
      bm25Terms.map(w => sum(when(col(s"tf_$w") > 0, 1L).otherwise(0L)).as(s"df_$w"))
    feat.crossJoin(broadcast(feat.agg(aggCols.head, aggCols.tail: _*)))
      .select(col("doc_id"), col("chunk_idx"), bm25TotalScore.as("score"))
      .orderBy(col("score").desc, col("doc_id"), col("chunk_idx"))
      .limit(10)
  }

  /** Candidate vocabulary sizes for the coverage curve (geometric —
    * the testdata generator's vocabulary is deliberately tiny, so the
    * low end is where the curve lives there; the high end is where a
    * real corpus's would). */
  val vocabGrid = Seq(1, 4, 16, 64, 256, 4096, 32768)

  /** VOCABULARY COVERAGE CURVE — the tokenizer-design companion to
    * q163's fertility: what fraction of corpus token OCCURRENCES a
    * top-k vocabulary covers, at several candidate k. The Zipf shape
    * makes this the curve every vocab-size decision reads (how much
    * tail becomes OOV/byte-fallback at each size).
    *
    * Exactness: ranks use the (cnt desc, term) total order, coverage
    * is an integer prefix sum, and ppm is one floor division — no
    * doubles anywhere. Grid sizes beyond the actual vocabulary
    * saturate to full coverage (COALESCE to the corpus total).
    *
    * 100 TB: the corpus-sized work is ONE map-side-combined groupBy
    * (the same Zipf-compact term relation every text query leans on);
    * ranking + prefix sum run on the VOCABULARY relation (≪ corpus,
    * single-task window — the q167 bounded-relation argument); the
    * 5-row grid joins by rank equality (broadcast hash), and the
    * 1-row totals broadcast is q63's bounded cross-join shape. */
  val qVocabCoverage: GraftQuery = GraftQuery(
    "q176_vocab_coverage",
    s"""WITH toks AS (
       |  SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents),
       |freq AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY term),
       |ranked AS (
       |  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rnk
       |  FROM freq),
       |cum AS (
       |  SELECT rnk, SUM(cnt) OVER (ORDER BY rnk
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cnt
       |  FROM ranked),
       |tot AS (
       |  SELECT CAST(SUM(cnt) AS BIGINT) AS total_tokens,
       |    CAST(COUNT(*) AS BIGINT) AS vocab_size
       |  FROM freq),
       |grid AS (SELECT * FROM (VALUES ${vocabGrid.map(k => s"($k)").mkString(", ")}) AS g(k))
       |SELECT g.k,
       |  CAST(COALESCE(c.cum_cnt, t.total_tokens) AS BIGINT) AS covered_tokens,
       |  t.total_tokens,
       |  CAST(CAST(COALESCE(c.cum_cnt, t.total_tokens) AS BIGINT) * 1000000
       |    // t.total_tokens AS BIGINT) AS coverage_ppm,
       |  t.vocab_size
       |FROM grid g LEFT JOIN cum c ON c.rnk = g.k CROSS JOIN tot t
       |ORDER BY g.k""".stripMargin) { (s, d) =>
    import s.implicits._
    val freq = Tables.documents(s, d)
      .select(explode(split(lower(col("text")), " ")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("cnt"))
    val wRank = Window.orderBy(col("cnt").desc, col("term"))
    val cum = freq
      .withColumn("rnk", row_number().over(wRank))
      .withColumn("cum_cnt", sum("cnt").over(
        Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("rnk").as("k"), col("cum_cnt"))
    val tot = freq.agg(sum("cnt").as("total_tokens"),
      count(lit(1)).as("vocab_size"))
    vocabGrid.toDF("k")
      .join(cum, Seq("k"), "left")
      .crossJoin(broadcast(tot))
      .select(col("k"),
        coalesce(col("cum_cnt"), col("total_tokens")).as("covered_tokens"),
        col("total_tokens"),
        expr("coalesce(cum_cnt, total_tokens) * 1000000 div total_tokens")
          .as("coverage_ppm"),
        col("vocab_size"))
      .orderBy("k")
  }

  /** Minimum pair count a collocation must reach before PMI is
    * trusted (rare pairs have wildly noisy PMI — the standard floor). */
  val pmiMinCount = 5L

  /** PMI-SCORED COLLOCATIONS (phrase mining): rank corpus bigrams by
    * pointwise mutual information — `p(xy) / (p(x)·p(y))` with unigram
    * probabilities from token counts and pair probability from bigram
    * counts — the classic collocation detector (Church & Hanks 1990)
    * and the scoring rule behind word2vec-style phrase merging. q64
    * ranks bigrams by RAW count, which surfaces "of the"; PMI surfaces
    * pairs that co-occur far above chance, which is what a tokenizer-
    * vocabulary or phrase-vocab builder actually wants.
    *
    * Exactness: PMI itself is a log of a rational; log() is not
    * bit-specified across libm implementations (the q150 rule), so the
    * score is the INTEGER-QUANTIZED ratio `c_xy·N_u²·10⁶ div
    * (N_b·c_x·c_y)` — log's argument scaled to parts-per-million,
    * computed in DECIMAL(38,0) ↔ HUGEINT (products reach ~10²¹ here,
    * past BIGINT, far under 10³⁸). x ↦ log x is monotone, so the
    * RANKING is identical to PMI's; production would additionally
    * render the float log for human eyes.
    *
    * 100 TB: token explosion scanned twice (unigram + bigram passes),
    * both hash-aggregated with map-side partials; the vocabulary
    * relation (bounded by vocab size, Zipf-compact) broadcasts twice
    * onto the bigram counts; two 1-row totals crossJoin-broadcast.
    * Production persists the tokenized relation once (the q63 note)
    * and both passes read it. */
  val qPmiBigrams: GraftQuery = GraftQuery(
    "q205_pmi_bigrams",
    s"""WITH toks AS (
       |  SELECT string_split(lower(text), ' ') AS t FROM documents),
       |uni AS (SELECT unnest(t) AS w FROM toks),
       |cu AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM uni GROUP BY w),
       |nu AS (SELECT CAST(sum(c) AS BIGINT) AS n_u FROM cu),
       |big AS (
       |  SELECT unnest(list_filter(
       |    list_transform(range(1, greatest(len(t), 2)), i -> t[i] || ' ' || t[i+1]),
       |    x -> x IS NOT NULL)) AS bigram
       |  FROM toks),
       |cb AS (
       |  SELECT string_split(bigram, ' ')[1] AS w1,
       |    string_split(bigram, ' ')[2] AS w2,
       |    CAST(count(*) AS BIGINT) AS c_xy
       |  FROM big GROUP BY 1, 2),
       |nb AS (SELECT CAST(sum(c_xy) AS BIGINT) AS n_b FROM cb)
       |SELECT w1, w2, c_xy, cx.c AS c_x, cy.c AS c_y,
       |  CAST(CAST(c_xy AS HUGEINT) * n_u * n_u * 1000000
       |    // (CAST(n_b AS HUGEINT) * cx.c * cy.c) AS BIGINT) AS pmi_q
       |FROM cb
       |JOIN cu cx ON cb.w1 = cx.w
       |JOIN cu cy ON cb.w2 = cy.w
       |CROSS JOIN nu CROSS JOIN nb
       |WHERE c_xy >= $pmiMinCount
       |ORDER BY pmi_q DESC, w1, w2
       |LIMIT 40""".stripMargin) { (s, d) =>
    val t = col("__toks")
    val pairs = when(size(t) >= 2,
      transform(sequence(lit(1), size(t) - 1),
        i => struct(element_at(t, i).as("w1"), element_at(t, i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    val toks = Tables.documents(s, d).repartition(32)
      .select(split(lower(col("text")), " ").as("__toks"))
    val cu = toks.select(explode(t).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    // totals WITHOUT re-running the explode+aggregate lineage: N_u is
    // the corpus token count and N_b the corpus pair count, both plain
    // narrow sums over the tokenized relation (Σ|t| and Σmax(|t|−1,0)
    // — equal to sum(c) over cu / sum(c_xy) over cb by construction,
    // at a scan instead of a recomputed aggregate each)
    val nu = toks.agg(sum(size(t)).cast("long").as("n_u"))
    val cb = toks.select(explode(pairs).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
    val nb = toks.agg(sum(greatest(size(t) - 1, lit(0))).cast("long").as("n_b"))
    cb.join(broadcast(cu.withColumnRenamed("w", "w1").withColumnRenamed("c", "c_x")), "w1")
      .join(broadcast(cu.withColumnRenamed("w", "w2").withColumnRenamed("c", "c_y")), "w2")
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .where(col("c_xy") >= pmiMinCount)
      .select(col("w1"), col("w2"), col("c_xy"), col("c_x"), col("c_y"),
        expr("""CAST((CAST(c_xy AS DECIMAL(38,0)) * CAST(n_u AS DECIMAL(38,0))
          * CAST(n_u AS DECIMAL(38,0)) * CAST(1000000 AS DECIMAL(38,0)))
          DIV (CAST(n_b AS DECIMAL(38,0)) * CAST(c_x AS DECIMAL(38,0))
          * CAST(c_y AS DECIMAL(38,0))) AS BIGINT)""").as("pmi_q"))
      .orderBy(col("pmi_q").desc, col("w1"), col("w2"))
      .limit(40)
  }

  def all: Seq[GraftQuery] = Seq(qTfIdf, qBigrams, qContamination, qQualityTopK,
    qCurationPipeline, qRedact, qRepetition, qBm25, qFertility, qChunkRetrieval,
    qVocabCoverage, qPmiBigrams)
}
