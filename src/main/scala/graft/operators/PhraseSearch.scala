package graft.operators

import graft.GraftQuery
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EXACT PHRASE SEARCH over a positional inverted index — the
  * retrieval capability BM25 (q113/q166) and dense ANN cannot express:
  * "these tokens, adjacent, in this order". The standard IR mechanism
  * (positional postings + adjacency intersection, Manning/Raghavan/
  * Schütze IIR §2.4) expressed as Spark joins.
  *
  * Postings derive from the per-corpus tokenized index
  * ([[NgramStats.indexedDocToks]] — built once per session+corpus,
  * the same stream every n-gram consumer reads): one `posexplode`
  * gives (doc_id, pos, tok). For an n-token phrase the engine joins
  * the n term-filtered posting streams on (doc_id, pos − offset) —
  * each match row IS an occurrence, so per-doc occurrence counts and
  * first positions are one keyed aggregate away.
  *
  * Scale (100 TB):
  *  - The phrase terms filter the postings BEFORE any exchange: only
  *    rows for the n query terms shuffle, bounded by the terms'
  *    document frequencies — never the token stream. A production
  *    deployment serves these filters from a TERM-PARTITIONED
  *    postings table (the q139 cell-partition layout applied to
  *    terms), making each one a partition-pruned read.
  *  - All n streams hash-partition on (doc_id, adjusted pos), so the
  *    adjacency intersection is n−1 co-partitioned joins after one
  *    common exchange; AQE reorders by measured stream size, which
  *    realizes the rarest-term-first heuristic at runtime from real
  *    statistics rather than planner guesses.
  *  - Skew-proof by construction: a stop-word-heavy phrase term
  *    contributes rows spread across (doc_id, pos) — there is no
  *    single hot key.
  */
object PhraseSearch {

  /** Fixed demo phrase — present at every testdata scale factor. */
  val phrase: Seq[String] = Seq("row", "column", "sort")

  /** (doc_id, pos, tok) positional postings (pos is 1-based). */
  private def postings(spark: SparkSession, d: String): DataFrame =
    NgramStats.indexedDocToks(spark, d)
      .select(col("doc_id"), posexplode(col("t")).as(Seq("i0", "tok")))
      .select(col("doc_id"), (col("i0") + 1).as("pos"), col("tok"))

  /** Per-doc phrase occurrence stats for `terms`. */
  def phraseMatches(spark: SparkSession, d: String, terms: Seq[String]): DataFrame = {
    val post = postings(spark, d)
    val streams = terms.zipWithIndex.map { case (w, off) =>
      post.where(col("tok") === w)
        .select(col("doc_id"), (col("pos") - off).as("pos"))
    }
    streams.reduce(_.join(_, Seq("doc_id", "pos")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_occ"), min(col("pos")).as("first_pos"))
  }

  /** q215: every document containing the exact phrase, with occurrence
    * count and first match position. The oracle spells the identical
    * positional-postings intersection over the same whitespace
    * tokenization. */
  val qPhraseSearch: GraftQuery = GraftQuery(
    "q215_phrase_search", {
      val filters = phrase.zipWithIndex.map { case (w, off) =>
        s"p$off AS (SELECT doc_id, i - $off AS i FROM pos WHERE tok = '$w')"
      }.mkString(",\n")
      val joins = (1 until phrase.size).map(i => s"JOIN p$i USING (doc_id, i)").mkString(" ")
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
         |pos AS (
         |  SELECT doc_id, t[i] AS tok, i
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i FROM toks)),
         |$filters
         |SELECT p0.doc_id,
         |  CAST(COUNT(*) AS BIGINT) AS n_occ,
         |  CAST(MIN(i) AS INTEGER) AS first_pos
         |FROM p0 $joins
         |GROUP BY p0.doc_id
         |ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
    phraseMatches(s, d, phrase).orderBy("doc_id")
  }

  def all: Seq[GraftQuery] = Seq(qPhraseSearch)
}
