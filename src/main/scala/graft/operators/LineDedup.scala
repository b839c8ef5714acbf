package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-wide line-level deduplication WITH text rewriting — the
  * RefinedWeb/Dolma "remove repeated lines across the corpus" pass,
  * which document-level dedup (q26/q28) and span MEASUREMENT (q117)
  * both leave on the table: here the duplicated spans are actually
  * REMOVED and the cleaned text is reconstructed deterministically.
  * This fixture's text has no newlines, so a "line" is a fixed
  * 10-token block (the operator is separator-agnostic by
  * construction: any segmentation that yields (doc_id, position,
  * segment) rows plugs into the same keep/reconstruct machinery).
  *
  * Keep rule: a block survives iff it is the corpus-wide FIRST
  * occurrence of its text, ordered by (doc_id, position) — one
  * row_number window over the block key. Reconstruction concatenates
  * a document's surviving blocks in position order; the per-doc md5
  * of the rebuilt text rides in the output, so the oracle hash-checks
  * the REWRITE byte-for-byte, not just the removal counts.
  *
  * 100 TB notes: one shuffle, keyed by block text (same physics as
  * exact dedup — duplicate groups are overwhelmingly size 1, and
  * map-side nothing: the window needs global order within a block's
  * group, which IS the dedup decision); reconstruction groups by
  * doc_id — second shuffle, carrying only surviving blocks. The
  * sort_array(collect_list(struct(pos, blk))) rebuild is bounded by
  * the document's own block count, never the corpus.
  */
object LineDedup {

  val blockTokens = 10

  val qLineDedup: GraftQuery = GraftQuery(
    "q126_line_dedup",
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
       |blocks AS (
       |  SELECT doc_id, k,
       |    array_to_string(t[1 + $blockTokens * k : $blockTokens + $blockTokens * k], ' ') AS blk
       |  FROM (SELECT doc_id, t, unnest(range(0, (len(t) + ${blockTokens - 1}) // $blockTokens)) AS k
       |        FROM toks)),
       |ranked AS (
       |  SELECT doc_id, k, blk,
       |    row_number() OVER (PARTITION BY blk ORDER BY doc_id, k) AS rn
       |  FROM blocks)
       |SELECT doc_id,
       |  CAST(count(*) AS INTEGER) AS n_blocks,
       |  CAST(count(*) FILTER (rn > 1) AS INTEGER) AS n_removed,
       |  md5(COALESCE(string_agg(CASE WHEN rn = 1 THEN blk END, ' ' ORDER BY k), ''))
       |    AS cleaned_md5
       |FROM ranked
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    // no length filter: split('') = [''] yields one empty block on
    // BOTH sides (NULL text yields no rows on both — NULL sequence
    // bound explodes to nothing, NULL range unnests to nothing)
    val toks = Tables.documents(s, d).repartition(32)
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
    val blocks = toks
      .select(col("doc_id"),
        explode(sequence(lit(0),
          expr(s"CAST(size(t) + ${blockTokens - 1} AS BIGINT) DIV $blockTokens") - 1))
          .as("k"), col("t"))
      .select(col("doc_id"), col("k"),
        concat_ws(" ",
          slice(col("t"), (lit(1) + lit(blockTokens) * col("k")).cast("int"),
            lit(blockTokens))).as("blk"))
    val ranked = blocks.withColumn("rn",
      row_number().over(Window.partitionBy("blk").orderBy("doc_id", "k")))
    ranked
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("int").as("n_blocks"),
        count(when(col("rn") > 1, 1)).cast("int").as("n_removed"),
        md5(coalesce(
          array_join(
            transform(
              array_sort(collect_list(when(col("rn") === 1,
                struct(col("k"), col("blk"))))),
              e => e.getField("blk")),
            " "),
          lit(""))).as("cleaned_md5"))
      .orderBy("doc_id")
  }

  def all: Seq[GraftQuery] = Seq(qLineDedup)
}
