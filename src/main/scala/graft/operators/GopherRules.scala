package graft.operators

import graft.GraftQuery
import graft.functions.TextFunctions.stopwords
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gopher-style rule-bundle quality filtering (the heuristic-gate
  * family published in Gopher/MassiveText and C4: word-count bounds,
  * mean-word-length band, stopword floor, max-word-length cap,
  * repetition ratio), composed two ways:
  *
  *  - q197: the per-document rule report — one flag per rule plus the
  *    failed-rule count and the keep decision (`n_failed <= 1`, the
  *    soft composition real pipelines use: a single marginal rule hit
  *    shouldn't discard a document).
  *  - q198: domain-level gating on top of it (the UT1-blocklist /
  *    per-domain-quality pattern): sources whose documents fail the
  *    bundle too often are dropped WHOLESALE, and only per-document
  *    keepers from surviving sources pass.
  *
  * Determinism: every rule is an exact INTEGER comparison — ratio
  * thresholds are cross-multiplied (mean word length in [4,5] becomes
  * `4·n_tokens <= n_chars <= 5·n_tokens`, the q137 exact-gate
  * discipline), so there is no float anywhere and both engines agree
  * bit-for-bit.
  *
  * 100 TB: q197 is ONE narrow codegen projection over the scan — no
  * join, no aggregate, no exchange beyond the presentation sort
  * (GopherRulesSpec pins it). q198 adds a map-side-combinable rollup
  * on `source` (domain cardinality ~10⁶ in production, trivially
  * shuffle-able) whose verdict relation is broadcast back — the
  * document side is never shuffled. In production the q197 signals
  * relation would be persisted once (the RedPajama-v2 quality-signals
  * layout) and both consumers would read it; here the rollup recomputes
  * the projection, which costs one extra codegen scan and nothing else.
  */
object GopherRules {

  // Rule thresholds: the SHAPES are Gopher's; the values are tuned so
  // every rule splits the synthetic corpus (tokens 10-99, mean word
  // length 3.7-5.3, max word length 5-8, stopword hits 0-14).
  val minWords = 30
  val maxWords = 90
  val wordLenLo = 4 // mean word length in [4, 5], cross-multiplied
  val wordLenHi = 5
  val minStopHits = 3
  val maxWordLen = 7

  /** Keep a document failing at most this many rules. */
  val maxFailed = 1

  /** Drop a source once more than 4/5 of its documents fail the
    * bundle: `5 · src_fails > 4 · src_docs` (exact integers). */
  val srcFailNum = 4
  val srcFailDen = 5

  private val ruleCols =
    Seq("r_words", "r_wordlen", "r_stop", "r_maxword", "r_repetition")

  /** Shared oracle CTE: per-document integer features -> rule flags ->
    * failed-rule count. */
  private[operators] val flaggedCteSql: String =
    s"""feat AS (
       |  SELECT doc_id, source,
       |    CAST(len(string_split(text, ' ')) AS INTEGER) AS nt,
       |    CAST(length(replace(text, ' ', '')) AS INTEGER) AS nc,
       |    CAST(${TextQueries.hitCountSql(stopwords)} AS INTEGER) AS st,
       |    CAST(list_max(list_transform(string_split(text, ' '), t -> length(t))) AS INTEGER) AS lw,
       |    CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS dt
       |  FROM documents),
       |rules AS (
       |  SELECT doc_id, source, nt AS n_tokens,
       |    nt BETWEEN $minWords AND $maxWords AS r_words,
       |    $wordLenLo * nt <= nc AND nc <= $wordLenHi * nt AS r_wordlen,
       |    st >= $minStopHits AS r_stop,
       |    lw <= $maxWordLen AS r_maxword,
       |    2 * dt >= nt AS r_repetition
       |  FROM feat),
       |flagged AS (
       |  SELECT doc_id, source, n_tokens,
       |    r_words, r_wordlen, r_stop, r_maxword, r_repetition,
       |    CAST(CAST(NOT r_words AS INTEGER) + CAST(NOT r_wordlen AS INTEGER)
       |      + CAST(NOT r_stop AS INTEGER) + CAST(NOT r_maxword AS INTEGER)
       |      + CAST(NOT r_repetition AS INTEGER) AS INTEGER) AS n_failed
       |  FROM rules)""".stripMargin

  /** The five rule flags as (name, expression) pairs over a bound
    * (text, toks) column pair — shared by [[flagged]] and the q206
    * agreement audit. `toks` MUST be a real column (the q64
    * no-CSE-in-lambdas rule). */
  private[operators] def ruleExprs(text: Column, toks: Column)
      : Seq[(String, Column)] = {
    val nt = size(toks)
    val nc = length(regexp_replace(text, " ", ""))
    val st = size(filter(toks, t => t.isInCollection(stopwords)))
    val lw = array_max(transform(toks, t => length(t)))
    val dt = size(array_distinct(toks))
    Seq(
      "r_words" -> nt.between(minWords, maxWords),
      "r_wordlen" -> (nt * wordLenLo <= nc && nc <= nt * wordLenHi),
      "r_stop" -> (st >= minStopHits),
      "r_maxword" -> (lw <= maxWordLen),
      "r_repetition" -> (dt * 2 >= nt))
  }

  /** Per-document rule relation (Spark mirror of [[flaggedCteSql]]):
    * one projection, the token array bound ONCE before any lambda (the
    * q64 no-CSE-in-lambdas rule). */
  private[operators] def flagged(s: SparkSession, d: String): DataFrame = {
    val rules = ruleExprs(col("text"), col("toks"))
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"),
        split(col("text"), " ").as("toks"))
      .select(col("doc_id") +: col("source") +: size(col("toks")).as("n_tokens") +:
        rules.map { case (n, c) => c.as(n) }: _*)
      .withColumn("n_failed",
        ruleCols.map(r => (!col(r)).cast("int")).reduce(_ + _))
  }

  /** Per-document Gopher rule report: flags, failed count, keep. */
  val qGopherRules: GraftQuery = GraftQuery(
    "q197_gopher_rules",
    s"""WITH $flaggedCteSql
       |SELECT doc_id, n_tokens,
       |  r_words, r_wordlen, r_stop, r_maxword, r_repetition,
       |  n_failed, n_failed <= $maxFailed AS keep_doc
       |FROM flagged
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    flagged(s, d)
      .select(col("doc_id"), col("n_tokens"),
        col("r_words"), col("r_wordlen"), col("r_stop"),
        col("r_maxword"), col("r_repetition"), col("n_failed"),
        (col("n_failed") <= maxFailed).as("keep_doc"))
      .orderBy("doc_id")
  }

  /** Domain gate: per-source bundle-failure rollup -> drop bad
    * sources wholesale -> per-document keepers from survivors. */
  val qDomainGate: GraftQuery = GraftQuery(
    "q198_domain_gate",
    s"""WITH $flaggedCteSql,
       |src AS (
       |  SELECT source, count(*) AS src_docs,
       |    count(*) FILTER (n_failed > $maxFailed) AS src_fails
       |  FROM flagged GROUP BY source),
       |good AS (
       |  SELECT source, src_docs, src_fails FROM src
       |  WHERE $srcFailDen * src_fails <= $srcFailNum * src_docs)
       |SELECT f.doc_id, f.source, g.src_docs, g.src_fails
       |FROM flagged f JOIN good g USING (source)
       |WHERE f.n_failed <= $maxFailed
       |ORDER BY f.doc_id""".stripMargin) { (s, d) =>
    val fl = flagged(s, d)
    val src = fl.groupBy("source").agg(
      count(lit(1)).as("src_docs"),
      count(when(col("n_failed") > maxFailed, 1)).as("src_fails"))
    val good = src.where(
      col("src_fails") * srcFailDen <= col("src_docs") * srcFailNum)
    fl.where(col("n_failed") <= maxFailed)
      .join(broadcast(good), "source")
      .select(col("doc_id"), col("source"), col("src_docs"), col("src_fails"))
      .orderBy("doc_id")
  }

  /** RULE-vs-MODEL AGREEMENT AUDIT: the governance query a curation
    * pipeline runs before swapping its heuristic gate (q197's Gopher
    * bundle) for a learned one (q129's quantized logistic gate) — a
    * per-language confusion matrix of the two keep decisions plus an
    * integer agreement rate. Disagreement cells are exactly the docs
    * a human reviews before the swap (rule_only = what the model
    * would newly drop; model_only = what it would newly admit), and
    * a language whose agreement craters flags a gate that didn't
    * transfer across languages — the CCNet failure mode.
    *
    * Exactness: the rule side is all-integer (q197), the model side
    * is the q129 on-grid logit sign, and the agreement rate is an
    * integer DIV — nothing floats. Both decisions are computed in ONE
    * projection over one documents scan (no self-join of two scored
    * relations), then a |langs|-row hash aggregate: scan-bound at
    * 100 TB like q197 itself. */
  val qGateAgreement: GraftQuery = GraftQuery(
    "q206_gate_agreement",
    s"""WITH $flaggedCteSql,
       |grams AS (
       |  ${TextVector.gramsSql}),
       |vecs AS (
       |  ${TextVector.vecSql}),
       |model AS (
       |  SELECT doc_id, CAST(${QualityGate.dotSql} >= 0 AS INTEGER) AS keep_model
       |  FROM vecs),
       |joined AS (
       |  SELECT d.lang,
       |    CAST(f.n_failed <= $maxFailed AS INTEGER) AS keep_rule,
       |    m.keep_model
       |  FROM flagged f
       |  JOIN model m USING (doc_id)
       |  JOIN documents d USING (doc_id))
       |SELECT lang,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(count(*) FILTER (keep_rule = 1 AND keep_model = 1) AS BIGINT) AS n_both,
       |  CAST(count(*) FILTER (keep_rule = 1 AND keep_model = 0) AS BIGINT) AS n_rule_only,
       |  CAST(count(*) FILTER (keep_rule = 0 AND keep_model = 1) AS BIGINT) AS n_model_only,
       |  CAST(count(*) FILTER (keep_rule = 0 AND keep_model = 0) AS BIGINT) AS n_neither,
       |  (CAST(count(*) FILTER (keep_rule = keep_model) AS BIGINT) * 1000)
       |    // CAST(count(*) AS BIGINT) AS agree_permille
       |FROM joined
       |GROUP BY lang
       |ORDER BY lang NULLS FIRST""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.graftshim.CharGramVector
    val rules = ruleExprs(col("text"), col("toks"))
    val nFailed = rules.map { case (_, c) => (!c).cast("int") }.reduce(_ + _)
    val decided = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("text"),
        split(col("text"), " ").as("toks"),
        CharGramVector(col("text"), TextVector.dim).as("v"))
      .select(col("lang"),
        (nFailed <= maxFailed).cast("int").as("keep_rule"),
        (QualityGate.logitOf(col("v")) >= 0).cast("int").as("keep_model"))
    decided.groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        count(when(col("keep_rule") === 1 && col("keep_model") === 1, 1)).as("n_both"),
        count(when(col("keep_rule") === 1 && col("keep_model") === 0, 1)).as("n_rule_only"),
        count(when(col("keep_rule") === 0 && col("keep_model") === 1, 1)).as("n_model_only"),
        count(when(col("keep_rule") === 0 && col("keep_model") === 0, 1)).as("n_neither"),
        count(when(col("keep_rule") === col("keep_model"), 1)).as("n_agree"))
      .select(col("lang"), col("n_docs"), col("n_both"), col("n_rule_only"),
        col("n_model_only"), col("n_neither"),
        expr("(n_agree * 1000) DIV n_docs").as("agree_permille"))
      .orderBy(col("lang").asc_nulls_first)
  }

  def all: Seq[GraftQuery] = Seq(qGopherRules, qDomainGate, qGateAgreement)
}
