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
    * overwriting each other mid-read. Every dir is registered for
    * recursive deletion at JVM exit — the pid isolation would
    * otherwise leak one corpus-sized copy per process into the temp
    * dir, forever. Exposed so FormatsSpec inspects the same directory
    * the query wrote. */
  def scratchDir(prefix: String, d: String): String = {
    val path = new java.io.File(
      sys.props("java.io.tmpdir"),
      prefix + "_" + d.replaceAll("[^A-Za-z0-9._-]", "_") +
        "_p" + ProcessHandle.current().pid()).getAbsolutePath
    cleanupHookInstalled
    cleanupRegistry.add(path)
    path
  }

  private val cleanupRegistry =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def deleteRecursively(f: java.io.File): Unit = {
    // Never follow symlinks: a link inside a registered scratch dir
    // (the streaming staging dirs use exactly that pattern) must be
    // unlinked, not have its TARGET's contents deleted.
    if (!java.nio.file.Files.isSymbolicLink(f.toPath)) {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(deleteRecursively)
    }
    f.delete(): Unit
  }

  /** Recursively remove a scratch path now (reruns that must not see a
    * previous run's output call this up front). */
  def wipe(path: String): Unit = deleteRecursively(new java.io.File(path))

  private lazy val cleanupHookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      cleanupRegistry.forEach(p => deleteRecursively(new java.io.File(p)))))
    true
  }

  def jsonlScratchDir(d: String): String = scratchDir("graft_jsonl", d)

  def exportScratchDir(d: String): String = scratchDir("graft_export", d)

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

  /** How many rows a single exported file may hold — deliberately
    * small at test scale so several part files exist per partition
    * (FormatsSpec counts them); at 100 TB the same knob bounds file
    * sizes for the object store (the real failure mode is one
    * mega-file per partition that downstream readers can't split). */
  val exportMaxRecordsPerFile = 64

  /** The "materialize the curated corpus" stage: documents tagged with
    * the deterministic q110 split, exported as hive-partitioned
    * parquet (lang × split — the layout a trainer's data loader
    * prunes by), then read BACK and aggregated per partition. The
    * oracle computes the same aggregate from the original table, so a
    * hash match proves the export lost nothing: every doc_id, every
    * n_chars, every text byte (distinct-md5), and the partition
    * columns themselves round-tripped.
    *
    * 100 TB notes: the write is fully parallel (each task writes its
    * own files under each partition dir it holds rows for;
    * maxRecordsPerFile splits oversized tasks); no pre-shuffle — a
    * production run that wants exactly-one-file-per-partition would
    * repartition(lang, split) first, trading one exchange for layout.
    * The read-back aggregate prunes to the partition columns + the
    * two data columns it needs. */
  val qPartitionedExport: GraftQuery = GraftQuery(
    "q135_partitioned_export",
    s"""WITH tagged AS (
       |  SELECT doc_id, text, n_chars, lang,
       |    ${TrainingPipeline.splitSqlCase("doc_id")} AS split
       |  FROM documents)
       |SELECT lang, split,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
       |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
       |FROM tagged
       |GROUP BY lang, split
       |ORDER BY lang NULLS FIRST, split""".stripMargin) { (s, d) =>
    val out = exportScratchDir(d)
    // Hive layout writes lang='' and lang=NULL to the same
    // __HIVE_DEFAULT_PARTITION__ dir and both read back as NULL; an
    // empty-string lang would silently merge into the NULL group. Guard
    // it inside the write job itself (raise_error rides the projection
    // — no extra scan) so a future corpus that ships '' fails loudly
    // instead of hash-mismatching the oracle.
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("n_chars"),
        when(col("lang") === "",
          raise_error(lit("q135: empty-string lang would collapse into the NULL partition")))
          .otherwise(col("lang")).as("lang"),
        TrainingPipeline.splitColumn(col("doc_id")).as("split"))
      .write.partitionBy("lang", "split")
      .option("maxRecordsPerFile", exportMaxRecordsPerFile)
      .mode("overwrite").parquet(out)
    // Explicit schema on the read-back: partition-column type inference
    // could retype a numeric-looking lang (e.g. every value "42") as
    // INT and hash-mismatch the oracle's VARCHAR.
    s.read
      .schema("doc_id BIGINT, text STRING, n_chars BIGINT, lang STRING, split STRING")
      .parquet(out)
      .groupBy("lang", "split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        countDistinct(md5(col("text"))).as("n_unique"),
        min("doc_id").as("min_doc"),
        max("doc_id").as("max_doc"))
      .orderBy(col("lang").asc_nulls_first, col("split"))
  }

  /** ORC roundtrip (the q118 contract on Spark's other first-class
    * columnar format): write the documents table as ORC, read it back,
    * and prove losslessness by hashing the same per-language digest
    * the oracle computes from the ORIGINAL parquet — doc ids, char
    * sums, and distinct-content counts all survive or the hash gate
    * fails. ORC matters operationally: it is the interchange format
    * of the Hive/Trino estate a 100 TB corpus usually borders, and
    * its schema is carried in-file (no schema= needed on read-back,
    * unlike q118's JSONL). */
  val qOrcRoundtrip: GraftQuery = GraftQuery(
    "q164_orc_roundtrip",
    """SELECT lang,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
      |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang NULLS FIRST""".stripMargin) { (s, d) =>
    val tmp = scratchDir("graft_orc", d)
    Tables.documents(s, d).write.mode("overwrite").orc(tmp)
    s.read.orc(tmp)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_chars").as("sum_chars"),
        countDistinct(md5(col("text"))).as("n_unique"),
        min("doc_id").as("min_doc"),
        max("doc_id").as("max_doc"))
      .orderBy(col("lang").asc_nulls_first)
  }

  /** DYNAMIC PARTITION PRUNING: the runtime counterpart of q135's
    * static layout. The fact side is a lang-partitioned export; the
    * dim side is a DATA-DEPENDENT language selection (every language
    * except the token-heaviest) that no optimizer can constant-fold —
    * so the partition filter on the fact scan can only exist at
    * RUNTIME, via Spark's DPP subquery (the broadcast join's build
    * side is re-used as the pruning filter). PlanAuditSpec pins
    * `dynamicpruning` inside the scan's PartitionFilters: the fact
    * table's excluded partitions are never read.
    *
    * Why this matters at 100 TB: "join fact to a filtered dim" is THE
    * warehouse access pattern, and without DPP it scans the whole
    * fact regardless of layout. With it, the partitioned layout q135
    * buys at write time is exploited by every such join automatically
    * — no hand-written partition predicates. Oracle: the same
    * semantics computed straight off the unpartitioned documents
    * table (the export is lossless, q135's proof). */
  val qDppJoin: GraftQuery = GraftQuery(
    "q179_dpp_join",
    """WITH tot AS (
      |  SELECT lang, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS t_lang
      |  FROM documents GROUP BY lang),
      |ranked AS (
      |  SELECT lang, row_number() OVER (ORDER BY t_lang DESC, lang NULLS FIRST) AS rnk
      |  FROM tot),
      |keep AS (SELECT lang FROM ranked WHERE rnk >= 2)
      |SELECT d.lang,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(d.n_chars) AS BIGINT) AS sum_chars,
      |  min(d.doc_id) AS min_doc, max(d.doc_id) AS max_doc
      |FROM documents d JOIN keep USING (lang)
      |GROUP BY d.lang
      |ORDER BY lang""".stripMargin) { (s, d) =>
    val out = scratchDir("graft_dpp", d)
    Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        when(col("lang") === "",
          raise_error(lit("q179: empty-string lang would collapse into the NULL partition")))
          .otherwise(col("lang")).as("lang"))
      .write.partitionBy("lang").mode("overwrite").parquet(out)
    val fact = s.read
      .schema("doc_id BIGINT, n_chars BIGINT, lang STRING")
      .parquet(out)
    // the language DIM is itself a materialized table (the lakehouse
    // shape DPP expects: a dim SCAN under a selective comparison
    // filter — Spark's isLikelySelective requires a BinaryComparison,
    // a bare boolean-flag filter does not qualify), carrying each
    // language's token-mass rank
    val dimPath = scratchDir("graft_dpp_dim", d)
    val tot = Tables.documents(s, d)
      .groupBy("lang")
      .agg(sum(graft.functions.TextFunctions.tokenCount(col("text")).cast("long"))
        .as("t_lang"))
    tot.select(col("lang"), col("t_lang"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("t_lang").desc, col("lang").asc_nulls_first)).as("rnk"))
      .write.mode("overwrite").parquet(dimPath)
    // "every language except the token-heaviest": rnk >= 2
    val keep = s.read.schema("lang STRING, t_lang BIGINT, rnk INT")
      .parquet(dimPath)
      .where(col("rnk") >= 2)
      .select("lang")
    fact.join(broadcast(keep), Seq("lang"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("sum_chars"),
        min("doc_id").as("min_doc"), max("doc_id").as("max_doc"))
      .orderBy("lang")
  }

  /** SCHEMA-EVOLUTION READ (mergeSchema): a long-lived 100 TB table is
    * never one schema — early files lack columns later files carry.
    * This query writes the events table as two physical generations
    * into ONE directory (even event_ids with the v1 column set —
    * no `value`, no `props`; odd event_ids with the full v2 set),
    * reads it back with parquet footer merging, and aggregates — the
    * v1 rows must surface the missing columns as NULL, not fail the
    * read and not leak another row's value. The oracle computes the
    * same aggregate from the original table with the v1 columns
    * CASE'd to NULL, so the hash match pins the whole evolution
    * contract: row counts, NULL accounting, and the sums over only
    * the rows that ever had the column.
    *
    * 100 TB notes: mergeSchema unions FOOTERS (per-file metadata),
    * not data — the scan stays parallel and columnar, and files
    * missing a projected column produce NULL vectors without reading
    * anything extra. Production pins an explicit read schema once the
    * union is known (the q135 inference lesson); mergeSchema is the
    * discovery step. */
  val qSchemaEvolution: GraftQuery = GraftQuery(
    "q213_schema_evolution",
    """WITH merged AS (
      |  SELECT event_type,
      |    CASE WHEN event_id % 2 = 1 THEN value END AS value,
      |    CASE WHEN event_id % 2 = 1 THEN props END AS props
      |  FROM events)
      |SELECT event_type,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(value) AS BIGINT) AS n_with_value,
      |  CAST(count(props) AS BIGINT) AS n_with_props,
      |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      |FROM merged
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val out = scratchDir("graft_schema_evo", d)
    val ev = Tables.events(s, d)
    // generation 1: the narrow early schema (overwrite resets the dir)
    ev.where(pmod(col("event_id"), lit(2L)) === 0L)
      .select("event_id", "user_id", "event_type")
      .write.mode("overwrite").parquet(out)
    // generation 2: the widened schema, appended into the SAME dir
    ev.where(pmod(col("event_id"), lit(2L)) === 1L)
      .select("event_id", "user_id", "event_type", "value", "props")
      .write.mode("append").parquet(out)
    s.read.option("mergeSchema", "true").parquet(out)
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("value")).as("n_with_value"),
        count(col("props")).as("n_with_props"),
        sum(col("value").cast("decimal(14,2)")).cast("double").as("sum_value"))
      .orderBy("event_type")
  }

  def all: Seq[GraftQuery] =
    Seq(qJsonlRoundtrip, qPartitionedExport, qOrcRoundtrip, qDppJoin,
      qSchemaEvolution)
}
