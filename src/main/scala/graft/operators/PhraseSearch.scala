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

  /** q240: BOOLEAN RETRIEVAL — the AND/OR/NOT query algebra over the
    * same inverted index (IIR §1), the third retrieval mode next to
    * ranked (BM25/cosine/RRF) and positional (phrase/proximity).
    * Fixed demo query: ("vector" AND "hash" AND NOT "slow") OR
    * ("merge" AND "stream"); the result carries a branch bitmask so
    * the oracle checks WHICH clause matched, not just membership.
    *
    * Compilation is the classic one: AND → semi-join chain on doc_id,
    * NOT → anti-join, OR → union of branch results (here: full outer
    * on the two branch sets to build the mask without scanning docs
    * twice more). All term relations are DISTINCT (doc_id) sets
    * filtered from the postings BEFORE any exchange — shuffle volume
    * is the terms' document frequencies, like q215.
    *
    * Scale: each term set is df(term) rows; semi/anti joins keep the
    * smaller side broadcastable per AQE; nothing ever touches the
    * token stream after the initial term filters. */
  val qBooleanSearch: GraftQuery = GraftQuery(
    "q240_boolean_search",
    """WITH td AS (
      |  SELECT DISTINCT doc_id, tok FROM (
      |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      |    FROM documents)),
      |b1 AS (
      |  SELECT doc_id FROM td WHERE tok = 'vector'
      |  INTERSECT SELECT doc_id FROM td WHERE tok = 'hash'
      |  EXCEPT SELECT doc_id FROM td WHERE tok = 'slow'),
      |b2 AS (
      |  SELECT doc_id FROM td WHERE tok = 'merge'
      |  INTERSECT SELECT doc_id FROM td WHERE tok = 'stream')
      |SELECT COALESCE(b1.doc_id, b2.doc_id) AS doc_id,
      |  CAST(CASE WHEN b1.doc_id IS NOT NULL THEN 1 ELSE 0 END
      |     + CASE WHEN b2.doc_id IS NOT NULL THEN 2 ELSE 0 END AS BIGINT)
      |    AS branches
      |FROM b1 FULL OUTER JOIN b2 ON b1.doc_id = b2.doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val td = NgramStats.indexedDocToks(s, d)
      .select(col("doc_id"), explode(col("t")).as("tok")).distinct()
    def docsWith(w: String): DataFrame =
      td.where(col("tok") === w).select("doc_id")
    val b1 = docsWith("vector")
      .join(docsWith("hash"), Seq("doc_id"), "semi")
      .join(docsWith("slow"), Seq("doc_id"), "anti")
      .withColumn("in_b1", lit(1L))
    val b2 = docsWith("merge")
      .join(docsWith("stream"), Seq("doc_id"), "semi")
      .withColumn("in_b2", lit(2L))
    b1.join(b2, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(col("in_b1"), lit(0L)) + coalesce(col("in_b2"), lit(0L)))
          .as("branches"))
      .orderBy("doc_id")
  }

  /** q241: PROXIMITY SEARCH — "sort" within 5 positions of "merge"
    * (unordered NEAR/5, IIR §2.4.2): the positional operator between
    * exact phrase (distance 1, ordered) and bag-of-words AND (any
    * distance). Per matching doc: the pair count and the closest
    * distance.
    *
    * Scale: the two posting streams are term-filtered before the
    * doc_id join; per-doc pair count is tf(w1)·tf(w2) of the QUERY
    * terms only — bounded by each doc's own term frequencies, the
    * q236 band-join argument. A pathological doc repeating both terms
    * thousands of times routes through the q170 skew diagnostics; the
    * positional band-bucket join (pos div k co-location) is the
    * documented escape hatch, not needed at observed Zipf tf. */
  val qProximitySearch: GraftQuery = GraftQuery(
    "q241_proximity_search",
    """WITH toks AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
      |pos AS (
      |  SELECT doc_id, t[i] AS tok, i
      |  FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i FROM toks)),
      |w1 AS (SELECT doc_id, i FROM pos WHERE tok = 'sort'),
      |w2 AS (SELECT doc_id, i FROM pos WHERE tok = 'merge')
      |SELECT w1.doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(MIN(abs(w1.i - w2.i)) AS BIGINT) AS min_dist
      |FROM w1 JOIN w2 ON w1.doc_id = w2.doc_id
      |  AND abs(w1.i - w2.i) <= 5
      |GROUP BY w1.doc_id
      |ORDER BY w1.doc_id""".stripMargin) { (s, d) =>
    val post = NgramStats.indexedDocToks(s, d)
      .select(col("doc_id"), posexplode(col("t")).as(Seq("i0", "tok")))
      .select(col("doc_id"), (col("i0") + 1).cast("long").as("i"), col("tok"))
    val w1 = post.where(col("tok") === "sort").select(col("doc_id"), col("i").as("i1"))
    val w2 = post.where(col("tok") === "merge").select(col("doc_id"), col("i").as("i2"))
    w1.join(w2, Seq("doc_id"))
      .where(abs(col("i1") - col("i2")) <= 5)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pairs"),
        min(abs(col("i1") - col("i2"))).as("min_dist"))
      .orderBy("doc_id")
  }

  def all: Seq[GraftQuery] = Seq(qPhraseSearch, qBooleanSearch, qProximitySearch)
}
