package graft.operators

import graft.GraftQuery
import graft.functions.TextFunctions._
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Oracle-paired text-analysis queries over `documents` (north-star
  * text-analysis surface; driven by TextFunctions). */
object TextQueries {

  private[operators] def sqlList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  private[operators] def hitCountSql(words: Seq[String]): String =
    s"len(list_filter(string_split(text, ' '), t -> list_contains(${sqlList(words)}, t)))"

  /** Token counting: whitespace tokenizer + BPE-ish regex counter. */
  val qTextTokens: GraftQuery = GraftQuery(
    "q21_text_tokens",
    """SELECT doc_id, lang, source,
      |  CAST(length(text) AS INTEGER) AS n_chars_actual,
      |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct_tokens,
      |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INTEGER) AS n_bpeish
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"), col("lang"), col("source"),
      length(col("text")).as("n_chars_actual"),
      tokenCount(col("text")).as("n_tokens"),
      size(distinctTokens(col("text"))).as("n_distinct_tokens"),
      bpeishTokenCount(col("text")).as("n_bpeish"))
      .orderBy("doc_id")
  }

  /** Quality scoring: ratios are exact-int divisions → deterministic. */
  val qTextQuality: GraftQuery = GraftQuery(
    "q22_text_quality",
    s"""SELECT doc_id,
       |  CAST(${hitCountSql(stopwords)} AS INTEGER) AS stopword_hits,
       |  CAST(${hitCountSql(stopwords)} AS DOUBLE) /
       |    greatest(len(string_split(text, ' ')), 1) AS stopword_ratio,
       |  CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS DOUBLE) /
       |    greatest(length(text), 1) AS punct_ratio,
       |  CAST(length(replace(text, ' ', '')) AS DOUBLE) /
       |    greatest(len(string_split(text, ' ')), 1) AS mean_word_len
       |FROM documents
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      hitCount(col("text"), stopwords).as("stopword_hits"),
      stopwordRatio(col("text")).as("stopword_ratio"),
      punctRatio(col("text")).as("punct_ratio"),
      meanWordLen(col("text")).as("mean_word_len"))
      .orderBy("doc_id")
  }

  /** LANGUAGE-ID CONFUSION MATRIX: q23's per-doc classifier rolled up
    * into the (declared × guessed) grid with exact-ppm per-class
    * recall — the evaluation sheet a lang-ID model actually ships
    * with (q23 emits per-doc rows; this is the census an eval
    * pipeline reads). Diagonal cells are hits; per declared lang the
    * recall is hits·10⁶ div class size, all integer.
    *
    * Scale (100 TB): the classifier is a scan-fused expression; the
    * matrix is one map-side-combinable count into ≤|langs|² cells. */
  val qLangConfusion: GraftQuery = GraftQuery(
    "q296_lang_confusion",
    s"""WITH scored AS (
       |  SELECT lang AS declared,
       |    CAST(${hitCountSql(langMarkers("en"))} AS INTEGER) AS s_en,
       |    CAST(${hitCountSql(langMarkers("es"))} AS INTEGER) AS s_es,
       |    CAST(${hitCountSql(langMarkers("de"))} AS INTEGER) AS s_de,
       |    CAST(${hitCountSql(langMarkers("fr"))} AS INTEGER) AS s_fr
       |  FROM documents),
       |guessed AS (
       |  SELECT declared,
       |    CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
       |         WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
       |         WHEN s_de >= s_fr THEN 'de'
       |         ELSE 'fr' END AS guess
       |  FROM scored),
       |cells AS (
       |  SELECT declared, guess, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM guessed GROUP BY declared, guess),
       |tot AS (
       |  SELECT declared, guess, n,
       |    SUM(n) OVER (PARTITION BY declared) AS class_n
       |  FROM cells)
       |SELECT declared, guess, n, CAST(class_n AS BIGINT) AS class_n,
       |  CAST((CASE WHEN declared = guess THEN n ELSE 0 END * 1000000)
       |    // class_n AS BIGINT) AS recall_ppm
       |FROM tot ORDER BY declared, guess""".stripMargin) { (s, d) =>
    val guessed = Tables.documents(s, d)
      .select(col("lang").as("declared"),
        graft.functions.TextFunctions.langGuess(col("text")).as("guess"))
    val cells = guessed.groupBy("declared", "guess").agg(count(lit(1)).as("n"))
    cells
      .withColumn("class_n", sum("n").over(
        org.apache.spark.sql.expressions.Window.partitionBy("declared")))
      .select(col("declared"), col("guess"), col("n"), col("class_n"),
        expr("((CASE WHEN declared = guess THEN n ELSE 0 END) * 1000000) div class_n")
          .as("recall_ppm"))
      .orderBy("declared", "guess")
  }

  /** Marker-based language ID (argmax over exact int scores). */
  val qTextLangid: GraftQuery = GraftQuery(
    "q23_text_langid",
    s"""WITH scored AS (
       |  SELECT doc_id, lang AS labeled_lang,
       |    CAST(${hitCountSql(langMarkers("en"))} AS INTEGER) AS s_en,
       |    CAST(${hitCountSql(langMarkers("es"))} AS INTEGER) AS s_es,
       |    CAST(${hitCountSql(langMarkers("de"))} AS INTEGER) AS s_de,
       |    CAST(${hitCountSql(langMarkers("fr"))} AS INTEGER) AS s_fr
       |  FROM documents)
       |SELECT doc_id, labeled_lang, s_en, s_es, s_de, s_fr,
       |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
       |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
       |       WHEN s_de >= s_fr THEN 'de'
       |       ELSE 'fr' END AS guessed_lang
       |FROM scored
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"), col("lang").as("labeled_lang"),
      hitCount(col("text"), langMarkers("en")).as("s_en"),
      hitCount(col("text"), langMarkers("es")).as("s_es"),
      hitCount(col("text"), langMarkers("de")).as("s_de"),
      hitCount(col("text"), langMarkers("fr")).as("s_fr"),
      langGuess(col("text")).as("guessed_lang"))
      .orderBy("doc_id")
  }

  /** Document fingerprints: exact + normalized (token-set) forms. */
  val qTextFingerprint: GraftQuery = GraftQuery(
    "q24_text_fingerprint",
    """SELECT doc_id,
      |  md5(lower(text)) AS content_fp,
      |  md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS normalized_fp
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      contentFingerprint(col("text")).as("content_fp"),
      normalizedFingerprint(col("text")).as("normalized_fp"))
      .orderBy("doc_id")
  }

  /** T1 reference parity: regex extract-all numerics from JSON-ish
    * event props (Application.py:34-43). The extracted list is emitted
    * joined to one string (plus its length): the driver's comparator
    * sorts rows in pandas, where array-typed cells are unhashable —
    * scalar columns keep the oracle hash-comparable while still
    * exercising extract-all end to end. */
  val qExtractNumbers: GraftQuery = GraftQuery(
    "q25_extract_numbers",
    """SELECT event_id,
      |  array_to_string(regexp_extract_all(props, '\d+(?:\.\d+)?'), ',') AS nums,
      |  CAST(len(regexp_extract_all(props, '\d+(?:\.\d+)?')) AS INTEGER) AS n_nums
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d).select(
      col("event_id"),
      array_join(extractNumbers(col("props")), ",").as("nums"),
      size(extractNumbers(col("props"))).as("n_nums"))
      .orderBy("event_id")
  }

  /** Unicode NFC normalization (graftshim.NfcNormalize, codegen'd vs a
    * UDF): decomposed and composed forms of the same text must
    * fingerprint identically before dedup. The corpus text is ASCII, so
    * a decomposed suffix (`e` + combining acute U+0301) is appended
    * deterministically — DuckDB's chr() is code-point-based (Spark's
    * char() is mod-256, so the Spark side embeds the literal), and both
    * engines' length() counts code points: 2 before composition, 1
    * after. The normalized bytes themselves are hash-compared. */
  val qNfcNormalize: GraftQuery = GraftQuery(
    "q95_nfc_normalize",
    """WITH dirty AS (
      |  SELECT doc_id, text || ' caf' || chr(101) || chr(769) AS t
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(length(t) AS INTEGER) AS raw_len,
      |  CAST(length(nfc_normalize(t)) AS INTEGER) AS nfc_len,
      |  t = nfc_normalize(t) AS was_normalized,
      |  right(nfc_normalize(t), 4) AS norm_tail,
      |  md5(nfc_normalize(t)) AS norm_fp
      |FROM dirty
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.graftshim.NfcNormalize
    val dirty = concat(col("text"), lit(" caf"), lit("e"), lit("\u0301"))
    Tables.documents(s, d)
      .select(col("doc_id"), dirty.as("t"))
      .select(
        col("doc_id"),
        length(col("t")).as("raw_len"),
        length(NfcNormalize(col("t"))).as("nfc_len"),
        (col("t") === NfcNormalize(col("t"))).as("was_normalized"),
        substring(NfcNormalize(col("t")), -4, 4).as("norm_tail"),
        md5(NfcNormalize(col("t"))).as("norm_fp"))
      .orderBy("doc_id")
  }

  def all: Seq[GraftQuery] = Seq(
    qTextTokens, qTextQuality, qTextLangid, qTextFingerprint, qExtractNumbers,
    qNfcNormalize, qLangConfusion)
}
