package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Interchange-format surface as a driver-checked catalog query (the
  * round-trip specs in FormatsSpec cover CSV/JSON/ORC/partitioned
  * parquet; this makes the JSONL path — the lingua franca of LLM
  * corpus distribution — oracle-visible).
  *
  * The query writes the documents table as JSON Lines, reads it back
  * with a PINNED schema (inference would re-scan and can widen types),
  * and aggregates per language. The oracle computes the same aggregate
  * from the original parquet, so a hash match proves the round trip
  * preserved every doc_id, every n_chars, and every text byte (via the
  * distinct-md5 count) — not merely the row count.
  *
  * 100 TB notes: writer and reader are both fully parallel (one JSONL
  * part-file per task, no coordination); the aggregate is the only
  * shuffle and it carries |langs| rows after map-side partials. JSONL
  * costs ~3-4× parquet in bytes and loses column pruning/predicate
  * pushdown — the round trip exists for interchange, not for serving;
  * the comparison query IS the demonstration of why the engine's
  * native table format stays parquet. */
object Formats {

  private val docsSchema =
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"

  /** Per-corpus AND per-process scratch path: the sanitized corpus
    * path (not its hashCode — two dirs can collide) keys reruns in
    * one JVM idempotently via overwrite, and the pid component keeps
    * two JVMs over the same corpus (bench racing a spec) from
    * overwriting each other mid-read. Exposed so FormatsSpec inspects
    * the same directory the query wrote. */
  def jsonlScratchDir(d: String): String =
    new java.io.File(
      sys.props("java.io.tmpdir"),
      "graft_jsonl_" + d.replaceAll("[^A-Za-z0-9._-]", "_") +
        "_p" + ProcessHandle.current().pid()).getAbsolutePath

  val qJsonlRoundtrip: GraftQuery = GraftQuery(
    "q118_jsonl_roundtrip",
    """SELECT lang,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
      |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang NULLS FIRST""".stripMargin) { (s, d) =>
    val tmp = jsonlScratchDir(d)
    Tables.documents(s, d).write.mode("overwrite").json(tmp)
    s.read.schema(docsSchema).json(tmp)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        countDistinct(md5(col("text"))).as("n_unique"),
        min("doc_id").as("min_doc"),
        max("doc_id").as("max_doc"))
      .orderBy(col("lang").asc_nulls_first)
  }

  def all: Seq[GraftQuery] = Seq(qJsonlRoundtrip)
}
