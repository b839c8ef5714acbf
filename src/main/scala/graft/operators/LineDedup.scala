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

  /** Content-defined (anchored) substring dedup — the overlap-aware
    * successor to q126. q126's fixed 10-token blocks miss a duplicated
    * span that straddles a block boundary, and fixed-STRIDE overlapping
    * blocks would only catch copies whose offsets agree mod the stride;
    * content-defined segmentation (the CDC idea, Lee et al.'s exact
    * substring dedup at segment granularity) is ALIGNMENT-FREE: a
    * token is an anchor iff the first hex digit of md5(token) is in
    * {0,1,2} (≈3/16 of tokens, mean segment ≈5 tokens; md5 because it
    * is bit-identical in Spark and DuckDB, unlike either engine's
    * native hash), and every anchor starts a new segment. Two copies
    * of a span therefore segment IDENTICALLY from the first anchor
    * inside the span, wherever each copy sits in its document.
    *
    * Keep rule and rebuild are q126's, at segment granularity: a
    * segment survives iff it is the corpus-wide first occurrence of
    * its text (by doc_id, then start position); a document's kept
    * tokens are re-concatenated in position order and md5'd, so the
    * oracle byte-checks the rewrite. LineDedupSpec plants a straddling
    * misaligned duplicate that q126 provably keeps and q128 removes.
    *
    * Boundary effects (by construction, not bugs): tokens before a
    * copy's first internal anchor and after its last internal anchor
    * segment together with surrounding novel text, so only the span's
    * interior segments dedup — the price of alignment-freedom, shrinking
    * as spans grow. A document with no anchors is one segment (degrades
    * to exact doc-level dedup).
    *
    * 100 TB: same physics as q126 — one token-stream window keyed by
    * doc_id (prefix-sum of anchor flags), one shuffle keyed by segment
    * text (Zipf-compact groups), one per-doc regroup bounded by the
    * doc's own tokens. */
  val qAnchoredDedup: GraftQuery = GraftQuery(
    "q128_anchored_substring_dedup",
    """WITH toks AS (
      |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
      |  WHERE text IS NOT NULL),
      |tokens AS (
      |  SELECT doc_id, i - 1 AS pos, t[i] AS tok,
      |    CASE WHEN substring(md5(t[i]), 1, 1) IN ('0','1','2')
      |      THEN 1 ELSE 0 END AS anchor
      |  FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i FROM toks)),
      |segged AS (
      |  SELECT doc_id, pos, tok,
      |    sum(anchor) OVER (PARTITION BY doc_id ORDER BY pos) AS seg_id
      |  FROM tokens),
      |segs AS (
      |  SELECT doc_id, seg_id,
      |    string_agg(tok, ' ' ORDER BY pos) AS seg_text,
      |    min(pos) AS start_pos
      |  FROM segged GROUP BY doc_id, seg_id),
      |ranked AS (
      |  SELECT doc_id, seg_id,
      |    row_number() OVER (PARTITION BY seg_text
      |      ORDER BY doc_id, start_pos) AS rn
      |  FROM segs)
      |SELECT g.doc_id,
      |  CAST(count(*) AS INTEGER) AS n_tok,
      |  CAST(count(*) FILTER (r.rn > 1) AS INTEGER) AS n_removed,
      |  md5(COALESCE(string_agg(CASE WHEN r.rn = 1 THEN g.tok END,
      |    ' ' ORDER BY g.pos), '')) AS cleaned_md5
      |FROM segged g JOIN ranked r USING (doc_id, seg_id)
      |GROUP BY g.doc_id
      |ORDER BY g.doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val toks = Tables.documents(s, d).where(col("text").isNotNull)
      .repartition(32)
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
    val tokens = toks
      .select(col("doc_id"), posexplode(col("t")).as(Seq("pos", "tok")))
      .withColumn("anchor",
        when(substring(md5(col("tok")), 1, 1).isin("0", "1", "2"), 1)
          .otherwise(0))
    val segged = tokens.withColumn("seg_id",
      sum(col("anchor")).over(Window.partitionBy("doc_id").orderBy("pos")))
    val segs = segged.groupBy("doc_id", "seg_id")
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            e => e.getField("tok")), " ").as("seg_text"),
        min(col("pos")).as("start_pos"))
    val ranked = segs.withColumn("rn",
      row_number().over(
        Window.partitionBy("seg_text").orderBy("doc_id", "start_pos")))
    segged
      .join(ranked.select("doc_id", "seg_id", "rn"), Seq("doc_id", "seg_id"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("int").as("n_tok"),
        count(when(col("rn") > 1, 1)).cast("int").as("n_removed"),
        md5(coalesce(
          array_join(
            transform(
              array_sort(collect_list(when(col("rn") === 1,
                struct(col("pos"), col("tok"))))),
              e => e.getField("tok")),
            " "),
          lit(""))).as("cleaned_md5"))
      .orderBy("doc_id")
  }

  /** Intra-document repeated-block trimming — the per-document
    * complement of q126. q126 removes the corpus-wide duplicate
    * blocks; this pass removes a block repeated WITHIN one document
    * (boilerplate headers, chorus-style repetition, copy-paste loops —
    * the spans q82 measures but nothing yet removed), keeping each
    * doc's first occurrence. Cross-document copies are deliberately
    * untouched: both docs keep their own first occurrence (the spec
    * pins this against q126's behavior on the same planted rows).
    *
    * The scale point IS the plan shape: the keep decision needs no
    * other row, so the whole rewrite is ONE narrow projection over
    * `text` built from higher-order array functions (split → block
    * transform → indexed filter keeping block i iff its first
    * occurrence index is i → rejoin+md5). Zero joins, zero windows,
    * zero aggregates — the only exchange in the plan is the
    * presentation orderBy (plan-audited). At 100 TB this runs at
    * full scan speed with map-side parallelism and nothing to spill.
    * Cost is quadratic in the DOCUMENT'S OWN block count
    * (array_position scans the doc's block list per block) — bounded
    * by web-document lengths, never the corpus; a pathological
    * book-length doc would use q126's keyed window restricted to
    * doc_id, trading a shuffle for linearity.
    *
    * Oracle: the rebuilt text's md5 rides in the output, so the hash
    * match byte-checks the rewrite (q126's discipline). Both engines
    * filter NULL text (q128's convention); empty text is one empty
    * block, kept, md5("") on both sides.
    */
  val qIntraDocDedup: GraftQuery = GraftQuery(
    "q132_intradoc_dedup",
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
       |  WHERE text IS NOT NULL),
       |b AS (
       |  SELECT doc_id,
       |    list_transform(range(0, (len(t) + ${blockTokens - 1}) // $blockTokens),
       |      k -> array_to_string(t[1 + $blockTokens * k : $blockTokens + $blockTokens * k], ' ')) AS blks
       |  FROM toks),
       |kept AS (
       |  SELECT doc_id, blks,
       |    list_filter(blks, (x, i) -> list_position(blks, x) = i) AS keep
       |  FROM b)
       |SELECT doc_id,
       |  CAST(len(blks) AS INTEGER) AS n_blocks,
       |  CAST(len(blks) - len(keep) AS INTEGER) AS n_removed,
       |  md5(array_to_string(keep, ' ')) AS cleaned_md5
       |FROM kept
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val toks = Tables.documents(s, d).where(col("text").isNotNull)
      .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
    val blocked = toks.select(col("doc_id"),
      transform(
        sequence(lit(0L),
          expr(s"CAST(size(t) + ${blockTokens - 1} AS BIGINT) DIV $blockTokens") - 1),
        k => concat_ws(" ",
          slice(col("t"), (lit(1) + lit(blockTokens) * k).cast("int"),
            lit(blockTokens)))).as("blks"))
    // keep block i iff the FIRST occurrence of its text in this doc's
    // own block list is at i (array_position is 1-based first-match;
    // the filter index is 0-based)
    val kept = blocked.select(col("doc_id"), col("blks"),
      filter(col("blks"),
        (b, i) => array_position(col("blks"), b) === i.cast("long") + 1)
        .as("keep"))
    kept.select(col("doc_id"),
        size(col("blks")).cast("int").as("n_blocks"),
        (size(col("blks")) - size(col("keep"))).cast("int").as("n_removed"),
        md5(array_join(col("keep"), " ")).as("cleaned_md5"))
      .orderBy("doc_id")
  }

  /** Exact substring dedup at a MINIMUM MATCH LENGTH — the Lee et al.
    * (ACL'22, "Deduplicating Training Data Makes Language Models
    * Better") ExactSubstr semantics that q126/q128 approximate at
    * segment grain: remove EVERY duplicated span of ≥ L tokens,
    * regardless of alignment or segmentation, all occurrences (their
    * released pipeline's cut rule). q128's content-defined anchors
    * keep a copy's pre-first-anchor / post-last-anchor edge tokens and
    * any span inside one anchor-free stretch; this pass has no such
    * grain: the spec plants exactly those shapes and q141 removes them.
    *
    * The suffix-array machinery of the paper collapses to a window
    * identity on the token stream: a token lies inside some duplicated
    * span of length ≥ L  ⟺  it is covered by at least one L-token
    * window whose text occurs ≥ 2 times in the corpus. (⇒ a span of
    * length M ≥ L duplicated elsewhere has all M−L+1 of its windows
    * duplicated, and their union is the whole span; ⇐ a duplicated
    * window IS a duplicated span of length L.) So: hash every L-token
    * window, count occurrences corpus-wide, and sweep coverage per
    * document with one bounded window-max — no suffix array, no
    * global sort, every stage keyed and shuffle-bounded.
    *
    * 100 TB notes: the window relation is one row per token (n−L+1
    * per doc) carrying a 32-char hash, not the window text; the
    * occurrence count groups by that hash (Zipf-compact, map-side
    * partials) and semi-joins back — both exchanges keyed by the
    * hash. The coverage sweep is a ROWS BETWEEN L−1 PRECEDING window
    * max per doc (positions are dense, so ROWS ≡ RANGE) and the
    * rebuild groups by doc_id, bounded by the doc's own tokens.
    * Window hashing here re-reads L tokens per position (O(nL) CPU,
    * the md5 keeps Spark and DuckDB bit-identical); a production run
    * at 100 TB would swap in a rolling polynomial hash (O(n), the q24
    * fingerprint machinery) without touching the plan shape. */
  val minMatchTokens = 10

  val qExactSubstringDedup: GraftQuery = {
    val L = minMatchTokens
    GraftQuery(
      "q141_exact_substring_dedup",
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents
         |  WHERE text IS NOT NULL),
         |tokens AS (
         |  SELECT doc_id, i - 1 AS pos, t[i] AS tok
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i FROM toks)),
         |wins AS (
         |  SELECT doc_id, i - 1 AS wpos,
         |    md5(array_to_string(t[i : i + ${L - 1}], ' ')) AS wh
         |  FROM (SELECT doc_id, t, unnest(range(1, len(t) - ${L - 2})) AS i
         |        FROM toks)),
         |dup AS (SELECT wh FROM wins GROUP BY wh HAVING count(*) >= 2),
         |dstart AS (SELECT w.doc_id, w.wpos FROM wins w JOIN dup USING (wh)),
         |cov AS (
         |  SELECT tk.doc_id, tk.pos, tk.tok,
         |    max(CASE WHEN ds.wpos IS NOT NULL THEN 1 ELSE 0 END)
         |      OVER (PARTITION BY tk.doc_id ORDER BY tk.pos
         |            ROWS BETWEEN ${L - 1} PRECEDING AND CURRENT ROW) AS covered
         |  FROM tokens tk LEFT JOIN dstart ds
         |    ON tk.doc_id = ds.doc_id AND tk.pos = ds.wpos)
         |SELECT doc_id,
         |  CAST(count(*) AS INTEGER) AS n_tok,
         |  CAST(count(*) FILTER (covered = 1) AS INTEGER) AS n_removed,
         |  md5(COALESCE(string_agg(CASE WHEN covered = 0 THEN tok END,
         |    ' ' ORDER BY pos), '')) AS cleaned_md5
         |FROM cov
         |GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = Tables.documents(s, d).where(col("text").isNotNull)
        .repartition(32)
        .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
      val tokens = toks
        .select(col("doc_id"), posexplode(col("t")).as(Seq("pos", "tok")))
      // guard short docs explicitly: Spark's sequence(0, negative)
      // DESCENDS instead of being empty
      val wins = toks
        .select(col("doc_id"),
          posexplode(
            when(size(col("t")) >= L,
              transform(sequence(lit(0), size(col("t")) - L),
                i => md5(concat_ws(" ", slice(col("t"), i + 1, lit(L))))))
              .otherwise(array()))
            .as(Seq("wpos", "wh")))
      val dup = wins.groupBy("wh").agg(count(lit(1)).as("n"))
        .where(col("n") >= 2).select("wh")
      // rename the start-marker keys: tokens and wins share lineage
      // (both derive from toks), so joining on same-named columns
      // would be a self-join ambiguity
      val dstart = wins.join(dup, Seq("wh"), "left_semi")
        .select(col("doc_id").as("s_doc"), col("wpos"), lit(1).as("d"))
      val cov = tokens
        .join(dstart,
          col("doc_id") === col("s_doc") && col("pos") === col("wpos"),
          "left")
        .select(col("doc_id"), col("pos"), col("tok"),
          coalesce(col("d"), lit(0)).as("d"))
        .withColumn("covered",
          max(col("d")).over(Window.partitionBy("doc_id").orderBy("pos")
            .rowsBetween(-(L - 1), 0)))
      cov.groupBy("doc_id")
        .agg(
          count(lit(1)).cast("int").as("n_tok"),
          count(when(col("covered") === 1, 1)).cast("int").as("n_removed"),
          md5(coalesce(
            array_join(
              transform(
                array_sort(collect_list(when(col("covered") === 0,
                  struct(col("pos"), col("tok"))))),
                e => e.getField("tok")),
              " "),
            lit(""))).as("cleaned_md5"))
        .orderBy("doc_id")
    }
  }

  def all: Seq[GraftQuery] =
    Seq(qLineDedup, qAnchoredDedup, qIntraDocDedup, qExactSubstringDedup)
}
