package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary learning (Sennrich et al. 2016) — the
  * tokenizer-training step of an LLM data pipeline, run ON the
  * engine's corpus instead of a single machine.
  *
  * Shape (the one industrial BPE trainers use): the corpus is scanned
  * ONCE into a word-frequency table — Zipf-compact relative to the
  * token stream — and every merge iteration then operates on that
  * table only: count adjacent symbol pairs weighted by word
  * frequency (hash aggregate with map-side partials), pick the
  * arg-max pair (a ONE-ROW collect — the same documented bounded
  * driver transfer as IvfAnn's centroids), and rewrite each word's
  * symbol array with a single codegen fold (no shuffle). At 100 TB
  * the word table is ~10⁷-10⁸ rows — cluster-trivial — and the corpus
  * itself is never rescanned.
  *
  * Determinism: ties on pair frequency break lexicographically
  * (left, right) — merge sequences are exactly reproducible, which
  * the BpeSpec asserts against an independent single-node reference
  * implementation. The learned table itself is rows-only-checked in
  * the catalog (q120): k chained arg-maxes with global restructuring
  * between them have no recursive-SQL rendering (DuckDB's recursive
  * CTEs forbid aggregates on the recursive side), the same
  * by-design gap as the k-means fit (q50). The FIRST iteration's
  * pair-count relation — the evidence for merge #1 — is fully
  * SQL-expressible and oracle-paired as q121.
  *
  * Greedy left-to-right application: scanning a word, (last==left &&
  * next==right) collapses; the merged symbol immediately becomes
  * `last`, so "aaa" under (a,a) yields [aa, a] — standard BPE
  * behavior, mirrored in the spec's reference.
  */
object Bpe {

  final case class Merge(rank: Int, left: String, right: String, freq: Long)

  /** Word-frequency table over whitespace-split lowercased text;
    * single-symbol words carry no pairs and are dropped up front. */
  private[graft] def wordFreq(docs: DataFrame): DataFrame =
    docs.select(explode(split(lower(col("text")), " ")).as("w"))
      .where(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** Adjacent symbol pairs of one generation, frequency-weighted. */
  private def pairCounts(gen: DataFrame): DataFrame =
    gen.where(size(col("syms")) >= 2)
      .select(col("freq"),
        explode(sequence(lit(1), size(col("syms")) - 1)).as("i"), col("syms"))
      .select(element_at(col("syms"), col("i")).as("left"),
        element_at(col("syms"), col("i") + 1).as("right"), col("freq"))
      .groupBy("left", "right").agg(sum("freq").as("n"))

  /** One greedy left-to-right merge pass over a symbol array as a
    * codegen fold. try_element_at: Spark's And is not short-circuit
    * under codegen, so element_at(-1) on the empty accumulator must
    * be the NULL-returning variant (ANSI mode throws otherwise). */
  private def applyMerge(syms: Column, left: String, right: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) =>
        when(try_element_at(acc, lit(-1)) === lit(left) && x === lit(right),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(left + right))))
          .otherwise(concat(acc, array(x))))

  /** Learn up to `numMerges` merges with corpus support ≥ `minFreq`. */
  def learn(docs: DataFrame, numMerges: Int, minFreq: Long = 2L): Seq[Merge] =
    learnFromWords(wordFreq(docs), numMerges, minFreq)

  /** Learn from a precomputed (w, freq) table — the corpus is scanned
    * once even when the caller also needs the word table (q125 encodes
    * over it after training). Each generation is an EAGER
    * localCheckpoint: persist alone keeps the logical plan growing one
    * nested lambda per merge, and Catalyst's re-analysis of that chain
    * turns exponential (measured: 12 merges 9 s, 20 merges OOM — on a
    * 30-row table). Checkpointing truncates the lineage so every
    * iteration plans depth-1 work; on a real cluster the same loop
    * would use reliable checkpoint() if executor loss mid-train
    * mattered. */
  def learnFromWords(wf: DataFrame, numMerges: Int, minFreq: Long = 2L): Seq[Merge] = {
    var gen = wf
      .select(split(col("w"), "").as("syms"), col("freq"))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val top = pairCounts(gen)
        .orderBy(col("n").desc, col("left"), col("right"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minFreq) done = true
      else {
        val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(rank + 1, l, r, n)
        val next = gen
          .select(applyMerge(col("syms"), l, r).as("syms"), col("freq"))
          .localCheckpoint() // eager: materializes before the old
        gen.unpersist()      // generation's blocks are released
        gen = next
        rank += 1
      }
    }
    gen.unpersist()
    merges.result()
  }

  /** Rows-only catalog entry: 20 merges learned on the documents
    * corpus (deterministic; cross-checked by BpeSpec's reference). */
  val qBpeMerges: GraftQuery = GraftQuery.noOracle("q120_bpe_merges") { (s, d) =>
    import s.implicits._
    learn(Tables.documents(s, d).repartition(32), numMerges = 20)
      .toDF("rank", "left", "right", "freq")
      .orderBy("rank")
  }

  /** Encode a symbol column with a FIXED learned merge list: the
    * merges fold into one projection (rank order, the same greedy
    * rule as training). Unlike the trainer's loop there is no
    * re-analysis blowup here — this is a single plan with k nested
    * lambdas, compiled once. */
  private[operators] def encodeSyms(syms: Column, merges: Seq[Merge]): Column =
    merges.sortBy(_.rank).foldLeft(syms)((c, m) => applyMerge(c, m.left, m.right))

  /** Tokenize-with-learned-vocabulary (q125): learn 12 merges, then
    * encode the corpus and report per-document BPE statistics. The
    * encode pass runs on the DISTINCT word table (the same
    * Zipf-compact relation the trainer iterates on) and joins the
    * per-word token counts back to the doc→word stream — each vocab
    * word is encoded exactly ONCE no matter how often it occurs, the
    * shape a production tokenizer job uses. Rows-only like q120 (the
    * merge loop has no SQL rendering); BpeSpec checks the encoder
    * against the single-node reference symbol-for-symbol. */
  val qBpeEncode: GraftQuery = GraftQuery.noOracle("q125_bpe_encode") { (s, d) =>
    val docs = Tables.documents(s, d).repartition(32)
    // ONE corpus scan builds the word table; the trainer iterates on
    // the checkpoint and the encoder reuses the same relation
    val wf = wordFreq(docs).localCheckpoint()
    val merges = learnFromWords(wf, numMerges = 12)
    val vocabEnc = wf // distinct words, length >= 2
      .select(col("w"),
        size(encodeSyms(split(col("w"), ""), merges)).as("n_sym"))
    val words = docs.select(col("doc_id"),
      explode(split(lower(col("text")), " ")).as("w"))
    // words absent from the vocab table encode to themselves: a
    // single-char word is 1 symbol, an EMPTY word (consecutive/
    // leading/trailing spaces) is 0 — counting it as 1 would break
    // the tokens <= chars invariant the spec asserts
    words.join(vocabEnc, Seq("w"), "left")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).cast("int").as("n_words"),
        sum(coalesce(col("n_sym"), least(length(col("w")), lit(1))))
          .cast("long").as("n_bpe_tokens"),
        sum(length(col("w"))).cast("long").as("n_chars_in_words"))
      .orderBy("doc_id")
  }

  /** Oracle-paired first iteration: the frequency-weighted adjacent
    * character-pair counts that select merge #1, top-20. Pairs are
    * rendered with substring (code-point semantics in both engines —
    * the CharGramVector convention), not the symbol arrays. */
  val qBpeTopPairs: GraftQuery = GraftQuery(
    "q121_bpe_top_pairs",
    """WITH wf AS (
      |  SELECT w, count(*) AS freq
      |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
      |  WHERE length(w) >= 2 GROUP BY w),
      |pairs AS (
      |  SELECT substring(w, CAST(i AS INTEGER), 2) AS pair, freq
      |  FROM (SELECT w, freq, unnest(range(1, length(w))) AS i FROM wf))
      |SELECT pair, CAST(sum(freq) AS BIGINT) AS n
      |FROM pairs GROUP BY pair
      |ORDER BY n DESC, pair
      |LIMIT 20""".stripMargin) { (s, d) =>
    val wf = wordFreq(Tables.documents(s, d).repartition(32))
    wf.select(col("freq"),
        explode(sequence(lit(1), length(col("w")) - 1)).as("i"), col("w"))
      .select(col("w").substr(col("i"), lit(2)).as("pair"), col("freq"))
      .groupBy("pair").agg(sum("freq").as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(20)
  }

  def all: Seq[GraftQuery] = Seq(qBpeMerges, qBpeTopPairs, qBpeEncode)
}
