package graft.streaming

import graft.GraftQuery
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface (north-star; the reference has no
  * streaming — SURVEY §2.12). The `events` table doubles as a file
  * stream source: readStream → windowed aggregation → memory sink,
  * driven synchronously for verification via processAllAvailable().
  *
  * Scale design: the same plan deployed against a real source (Kafka,
  * incoming parquet drops) runs unchanged; watermarking bounds state,
  * and the hourly-window aggregation state is O(#windows × #types),
  * independent of input volume. Complete mode is used here so a single
  * batch emits every window (append mode would hold windows open until
  * the watermark passes them — right for production, wrong for a
  * one-shot verification read).
  */
object Streams {

  /** Stateful operators allocate one state store per shuffle partition
    * per micro-batch; at this input volume 8 partitions carry the state
    * comfortably and cut per-batch fixed cost 4x vs the batch-tuned 32.
    * (At production volume this knob is sized to state bytes per
    * partition, not to CPU count.) Restored after the query stops so
    * batch queries in the same session keep their tuning. NOTE: the
    * conf is session-global — a concurrent query on the same session
    * would see it; safe under the single-threaded driver harness, use
    * spark.newSession() per stream in a multi-tenant driver. */
  private def withStreamShufflePartitions[T](spark: SparkSession)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "8")
    try f finally spark.conf.set(key, prev)
  }

  // ts arrives as nanos-as-long (legacy read) OR µs TIMESTAMP_NTZ
  // depending on the testdata generation; the streaming source must
  // declare a schema up front, so readEventsStream probes the file's
  // batch-read schema and normalizes via Tables.normalizeEventsTs.

  /** Hourly tumbling-window counts per event type, executed as a real
    * streaming query over the events parquet and returned as a batch
    * DataFrame once all available input is processed. */
  def hourlyCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val name = "graft_stream_hourly"
    withStreamShufflePartitions(spark) {
      val stream = readEventsStream(spark, sfDir)
      val agg = stream
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(14,2)")).cast("double").as("sum_value"))
      val q = agg.writeStream.outputMode("complete")
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(name)
      .select(col("win.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))
      .orderBy("hour_start", "event_type")
  }

  /** The streaming query, oracle-checked against the equivalent batch
    * SQL — tumbling windows over event time are deterministic, so the
    * streaming result must equal the batch group-by. */
  val qStreamHourly: GraftQuery = GraftQuery(
    "q35_stream_hourly",
    """SELECT date_trunc('hour', ts) AS hour_start, event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY hour_start, event_type""".stripMargin) { (s, d) =>
    hourlyCounts(s, d)
  }

  /** Streaming dedup via dropDuplicates on the key columns — state is
    * one entry per distinct key (bounded by watermark in production
    * via dropDuplicatesWithinWatermark). Key set is deterministic even
    * though WHICH row survives isn't — so the query emits keys only. */
  def streamDedupKeys(spark: SparkSession, sfDir: String): DataFrame = {
    val name = "graft_stream_dedup"
    withStreamShufflePartitions(spark) {
      val stream = readEventsStream(spark, sfDir)
      val q = stream
        .select(col("user_id"), col("event_type"))
        .dropDuplicates("user_id", "event_type")
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(name).orderBy("user_id", "event_type")
  }

  /** BOUNDED-STATE streaming dedup — the production form: duplicates
    * arriving within the watermark delay are dropped and state older
    * than the watermark is evicted, so state holds one entry per key
    * seen in the last hour of event time instead of one per key EVER
    * (plain dropDuplicates grows without bound on an unbounded key
    * domain — a non-starter at 100 TB/day). Emitted keys equal batch
    * DISTINCT whenever each key's duplicates arrive within the delay
    * of its first occurrence — trivially true here (the file source
    * delivers one micro-batch) and the contract a production deployer
    * sizes the delay for; the multi-batch eviction/re-emission
    * semantics are pinned by StreamsSpec. */
  def streamDedupWithinWatermarkKeys(spark: SparkSession, sfDir: String): DataFrame = {
    val name = "graft_stream_wm_dedup"
    withStreamShufflePartitions(spark) {
      val q = readEventsStream(spark, sfDir)
        .select(col("user_id"), col("event_type"), col("ts"))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark("user_id", "event_type")
        .select("user_id", "event_type")
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(name).orderBy("user_id", "event_type")
  }

  /** Stateful sessionization with flatMapGroupsWithState: per-user
    * event-time gap > 1h starts a new session (the streaming form of
    * Relational.q20Sessionize — same session count contract). State is
    * O(1) per user: last timestamp + running count. */
  def sessionCounts(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val name = "graft_stream_sessions"
    val stream = readEventsStream(spark, sfDir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("ts_sec"))
      .as[(Long, Long)]
    def update(userId: Long, rows: Iterator[(Long, Long)],
        state: GroupState[(Long, Long, Long)]): Iterator[(Long, Long, Long)] = {
      // state: (lastSec, nSessions, nEvents); batch rows sorted here —
      // within one micro-batch ordering is not guaranteed by the source
      val sorted = rows.map(_._2).toSeq.sorted
      var (last, sessions, events) = state.getOption.getOrElse((Long.MinValue, 0L, 0L))
      sorted.foreach { sec =>
        if (last == Long.MinValue || sec - last > 3600) sessions += 1
        last = sec; events += 1
      }
      state.update((last, sessions, events))
      Iterator.single((userId, sessions, events))
    }
    withStreamShufflePartitions(spark) {
      val q = stream.groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
        .toDF("user_id", "n_sessions", "n_events")
        .writeStream.outputMode("update").format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    }
    // keep the last update per user (multi-batch safety), sorted
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("n_events").desc)
    spark.table(name)
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .where(col("rn") === 1).drop("rn")
      .orderBy("user_id")
  }

  /** The file stream source wants a DIRECTORY of arriving files (its
    * production shape); stage a single testdata file into one via
    * symlink without touching the read-only testdata tree. NOFOLLOW on
    * the existence check: a dangling leftover link (testdata moved)
    * reports non-existent through follow semantics but still blocks
    * createSymbolicLink — recreate it unconditionally. ONE copy of
    * this subtle filesystem logic, shared by the events and documents
    * streams. */
  private def stageAsStreamDir(prefix: String, sfDir: String,
      fileName: String): String = {
    val streamDir = java.nio.file.Paths.get(
      sys.props("java.io.tmpdir"), prefix, sfDir.replaceAll("[^A-Za-z0-9]", "_"))
    java.nio.file.Files.createDirectories(streamDir)
    val link = streamDir.resolve(fileName)
    val target = java.nio.file.Paths.get(sfDir, fileName)
    if (java.nio.file.Files.exists(link, java.nio.file.LinkOption.NOFOLLOW_LINKS) &&
        java.nio.file.Files.readSymbolicLink(link) != target)
      java.nio.file.Files.delete(link)
    if (!java.nio.file.Files.exists(link, java.nio.file.LinkOption.NOFOLLOW_LINKS))
      java.nio.file.Files.createSymbolicLink(link, target)
    streamDir.toString
  }

  private def readEventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val streamDir = stageAsStreamDir("graft_stream", sfDir, "events.parquet")
    // footer-only probe (no data read) for the generation's ts type
    val fileSchema = spark.read.parquet(streamDir).schema
    graft.sources.Tables.normalizeEventsTs(
      spark.readStream.schema(fileSchema).parquet(streamDir))
  }

  /** Stream-static join: the event stream enriched against a static
    * dimension (customer) — the dim is effectively broadcast to every
    * micro-batch; no stream-side state. Aggregated per segment. */
  def streamStaticJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val name = "graft_stream_static"
    val cust = graft.sources.Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    withStreamShufflePartitions(spark) {
      val q = readEventsStream(spark, sfDir)
        .join(cust, "user_id")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(14,2)")).cast("double").as("sum_value"))
        .writeStream.outputMode("complete").format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(name).orderBy("c_mktsegment")
  }

  /** Stream-stream inner join with watermarks on both sides: views
    * joined to same-user clicks landing within the following hour.
    * Inner joins emit on match (no watermark holdback — that's only
    * outer joins), while the watermark + time-range condition bounds
    * the join state to one hour of events per side. */
  def streamStreamJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val name = "graft_stream_stream"
    val views = readEventsStream(spark, sfDir)
      .where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", "1 hour")
    val clicks = readEventsStream(spark, sfDir)
      .where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    withStreamShufflePartitions(spark) {
      val q = views.join(clicks,
          col("user_id") === col("c_user") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"))
        .select("user_id", "view_id", "click_id")
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(name).orderBy("user_id", "view_id", "click_id")
  }

  /** Stream-stream join, oracle = the equivalent batch interval join. */
  val qStreamStreamJoin: GraftQuery = GraftQuery(
    "q67_stream_stream_join",
    """SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
      |FROM events v JOIN events c
      |  ON v.user_id = c.user_id
      | AND v.event_type = 'view' AND c.event_type = 'click'
      | AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
      |ORDER BY v.user_id, view_id, click_id""".stripMargin) { (s, d) =>
    streamStreamJoin(s, d)
  }

  /** Stream-static join, oracle = the equivalent batch join+group. */
  val qStreamStaticJoin: GraftQuery = GraftQuery(
    "q49_stream_static_join",
    """SELECT c.c_mktsegment, COUNT(*) AS n,
      |  CAST(SUM(CAST(e.value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey
      |GROUP BY c.c_mktsegment
      |ORDER BY c.c_mktsegment""".stripMargin) { (s, d) =>
    streamStaticJoin(s, d)
  }

  /** Streaming dedup, oracle = batch DISTINCT keys. */
  val qStreamDedup: GraftQuery = GraftQuery(
    "q42_stream_dedup",
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
    streamDedupKeys(s, d)
  }

  /** Watermark-bounded streaming dedup, oracle = batch DISTINCT keys
    * (same contract as q42, different state physics: q42's state is
    * every-key-ever, this one's is keys within the watermark). */
  val qStreamDedupWatermark: GraftQuery = GraftQuery(
    "q104_stream_dedup_watermark",
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin) { (s, d) =>
    streamDedupWithinWatermarkKeys(s, d)
  }

  /** Stateful streaming sessionization, oracle = the batch lag-gap SQL
    * (identical session semantics ⇒ identical counts). */
  val qStreamSessions: GraftQuery = GraftQuery(
    "q43_stream_sessions",
    """WITH ordered AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
      |    lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_sec
      |  FROM events),
      |flagged AS (
      |  SELECT *, CASE WHEN prev_sec IS NULL OR ts_sec - prev_sec > 3600
      |                 THEN 1 ELSE 0 END AS new_session
      |  FROM ordered)
      |SELECT user_id,
      |  CAST(SUM(new_session) AS BIGINT) AS n_sessions,
      |  COUNT(*) AS n_events
      |FROM flagged GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    sessionCounts(s, d)
  }

  /** Documents table as a file stream (same symlink staging as the
    * events stream). `srcDir` overrides the staged directory — the
    * spec stages a MULTI-FILE copy to force multiple micro-batches. */
  private[graft] def readDocsStream(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val dir = srcDir.getOrElse(
      stageAsStreamDir("graft_stream_docs", sfDir, "documents.parquet"))
    val reader = spark.readStream
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(dir)
  }

  /** Streaming multimodal featurize: the q101 decode pipeline run as a
    * micro-batch stream — foreachBatch synthesizes the PNG payloads and
    * decodes them through the EXECUTOR-GLOBAL decoder pool
    * ([[graft.operators.Multimodal.decodeImagesPooled]]), appending
    * fixed-width features to a parquet sink. foreachBatch is the right
    * streaming shape for a featurize stage: the batch is a plain
    * DataFrame, so the exact batch code (same typed mapPartitions, same
    * decoder discipline) serves both modes, and the sink is a real
    * table a trainer can read mid-stream. Decoder constructions are
    * bounded by peak task concurrency for the session lifetime — NOT
    * by trigger count (MultimodalSpec drives 3 micro-batches and
    * pins the counter); payloads are born and consumed inside the
    * partition, so no image bytes ever cross an exchange or land in
    * the sink.
    *
    * Oracle: q101's analytic pixel recompute — the streaming execution
    * must produce byte-identical features to the batch path. */
  def streamImageFeatures(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    // deterministic per-(source, process) sink dir, wiped up front:
    // the sink appends WITHIN one run (micro-batches), but a rerun
    // must not read the previous run's batches — and a fresh
    // createTempDirectory per invocation would leak one feature-table
    // copy per bench/verify execution (the dir is also registered for
    // deletion at JVM exit via Formats.scratchDir)
    val outDir = graft.operators.Formats.scratchDir(
      "graft_stream_imgfeat", srcDir.getOrElse(sfDir))
    graft.operators.Formats.wipe(outDir)
    withStreamShufflePartitions(spark) {
      val stream = readDocsStream(spark, sfDir, srcDir, maxFilesPerTrigger)
      val q = stream.select(col("doc_id"))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          val imgs = batch.select(col("doc_id")).as[Long]
            .mapPartitions(ids => ids.map(id =>
              graft.operators.Multimodal.ImageRow(id,
                graft.operators.Multimodal.synthPng(id))))(
              org.apache.spark.sql.Encoders.product[graft.operators.Multimodal.ImageRow])
          graft.operators.Multimodal.decodeImagesPooled(imgs)
            .write.mode("append").parquet(outDir)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.read.parquet(outDir).orderBy("doc_id")
  }

  /** Streaming featurize, oracle = q101's analytic recompute. */
  val qStreamImageDecode: GraftQuery = GraftQuery(
    "q131_stream_image_decode",
    graft.operators.Multimodal.imageDecodeOracleSql) { (s, d) =>
    streamImageFeatures(s, d)
  }

  /** Sessionization via the ENGINE's session_window (dynamic-gap
    * merging windows) rather than q43's hand-rolled
    * flatMapGroupsWithState — the two bound state differently: q43
    * keeps one (count, last_ts) pair per user, this keeps one open
    * window per (user, session). Spark's merge rule, verified against
    * this Spark build in both batch and streaming: an event arriving
    * EXACTLY gap after the last one still MERGES (windows
    * [t, t+gap] touch at the closed edge) — a new session needs a gap
    * STRICTLY GREATER than 30 minutes. The oracle mirrors that
    * boundary as an integer µs comparison (> 1 800 000 000), dodging
    * interval/rounding semantics entirely, and tiebreaks its windows
    * by (ts, event_id) so duplicate timestamps can't land the lag
    * pass and the running-sum pass on different tie orders (the q43
    * hazard).
    *
    * 100 TB: state is per OPEN session, not per event. This driver-
    * checked run uses COMPLETE output into the memory sink (append
    * would withhold the tail sessions still above the watermark when
    * the file stream drains), so state is NOT evicted here; the same
    * query deployed in append mode is where the attached watermark
    * earns its keep — closed sessions age out of the store, the
    * production posture for an unbounded user domain. */
  def sessionWindows(spark: SparkSession, sfDir: String): DataFrame = {
    val name = "graft_stream_session_win"
    withStreamShufflePartitions(spark) {
      val q = readEventsStream(spark, sfDir)
        .withWatermark("ts", "1 hour")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .writeStream.outputMode("complete").format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(name)
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))
      .orderBy("user_id", "session_start")
  }

  val qStreamSessionWindow: GraftQuery = GraftQuery(
    "q136_stream_session_window",
    """WITH ordered AS (
      |  SELECT user_id, ts, event_id,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |  FROM events),
      |flagged AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN prev IS NULL OR epoch_us(ts) - epoch_us(prev) > 1800000000
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM ordered),
      |tagged AS (
      |  SELECT user_id, ts,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged)
      |SELECT user_id,
      |  min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  COUNT(*) AS n_events
      |FROM tagged
      |GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
    sessionWindows(s, d)
  }

  /** STREAMING incremental curation: q130's gate logic run inside
    * foreachBatch against the persisted corpus statistics — the
    * round-6 verdict's missing piece between batch-incremental (q130)
    * and a live ingest pipeline. Each micro-batch is "an arriving
    * batch" in q130's sense: its docs are tokenized from the
    * micro-batch itself, every corpus-wide quantity comes from the
    * per-(session, corpus) SessionMemo indexes — built ONCE across
    * all micro-batches (StreamsSpec pins the build counter, the q131
    * decoder-pooling discipline applied to index state) — and the
    * decisions land in a parquet sink a downstream trainer can read
    * mid-stream.
    *
    * With the whole batch in one trigger (the staged single-file
    * default) the streamed decisions are BYTE-IDENTICAL to q130's —
    * q145's oracle is q130's SQL verbatim. Under maxFilesPerTrigger
    * the stream becomes several smaller arriving batches; each batch's
    * decisions then equal curateBatch run on exactly that slice
    * (StreamsSpec), the honest semantics of batch-at-a-time arrival
    * (batch-internal effects — the exact gate's batch min — are per
    * arrival, as in q130 itself). */
  def streamIncrementalCuration(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val outDir = graft.operators.Formats.scratchDir(
      "graft_stream_curate", srcDir.getOrElse(sfDir))
    graft.operators.Formats.wipe(outDir)
    withStreamShufflePartitions(spark) {
      val stream = readDocsStream(spark, sfDir, srcDir, maxFilesPerTrigger)
        .where(pmod(col("doc_id"), lit(5)) === 4)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
          graft.operators.CurationFunnel.curateBatch(spark, sfDir, batch)
            .withColumn("batch_id", lit(bid))
            .write.mode("append").parquet(outDir)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.read.parquet(outDir)
  }

  /** Streamed incremental curation, oracle = q130's full-recompute
    * equivalence SQL (single-trigger staging ⇒ identical batch). */
  val qStreamIncrementalFunnel: GraftQuery = GraftQuery(
    "q145_stream_incremental_funnel",
    graft.operators.CurationFunnel.qIncrementalFunnel.oracle.get) { (s, d) =>
    streamIncrementalCuration(s, d)
      .select("doc_id", "lang", "n_tok", "keep_exact", "keep_span", "keep_fluency")
      .orderBy("doc_id")
  }

  /** Embeddings table as a file stream (same symlink staging as the
    * events/documents streams); `srcDir` lets the spec stage a
    * multi-file copy to force several micro-batches. */
  private[graft] def readEmbeddingsStream(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val dir = srcDir.getOrElse(
      stageAsStreamDir("graft_stream_emb", sfDir, "embeddings.parquet"))
    val reader = spark.readStream
      .schema("vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
    reader.parquet(dir)
  }

  /** STREAMING ANN index ingest: q140's append path run inside
    * foreachBatch — the live counterpart of batch index maintenance,
    * completing the index lifecycle (build q139 → append q140 →
    * stream-append q147 → compact q146). Each arriving vector
    * micro-batch is assigned to the EXISTING centroids (the collected
    * centroid set is built once per session and reused across
    * triggers — the q131 pooling discipline; StreamsSpec pins the
    * counter), PQ-encoded, and appended to a cell-partitioned delta
    * segment. The base index is read from disk, never reassigned.
    * After the stream drains, the search unions the pruned base and
    * delta scans — byte-identical to q140's batch result, so the
    * oracle is q127's from-scratch SQL: the hash match proves
    * streamed ingest ≡ batch append ≡ full rebuild. */
  def streamAnnIngest(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val basePath = graft.operators.IvfPq.baseSegment(spark, sfDir)
    val deltaDir = graft.operators.Formats.scratchDir(
      "graft_ivfpq_streamdelta", srcDir.getOrElse(sfDir))
    graft.operators.Formats.wipe(deltaDir)
    withStreamShufflePartitions(spark) {
      val stream = readEmbeddingsStream(spark, sfDir, srcDir, maxFilesPerTrigger)
        .where(pmod(col("vec_id"), lit(5)) === 4)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
          graft.operators.IvfPq.appendBatch(spark, sfDir, batch, deltaDir, bid)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    graft.operators.IvfPq.searchSegments(spark, sfDir,
      basePath +: graft.operators.IvfPq.batchSegments(spark, deltaDir))
  }

  val qStreamAnnIngest: GraftQuery = GraftQuery(
    "q147_stream_ann_ingest",
    graft.operators.IvfPq.qIvfPqTopK.oracle.get) { (s, d) =>
    streamAnnIngest(s, d)
  }

  /** STREAMING QUERY SERVING: q303's batch-query ANN serving run as a
    * continuous retrieval service — query vectors ARRIVE as a stream
    * (every 97th vector), each micro-batch is served against the
    * persisted cell-partitioned index by the same distributed
    * batch-serve plan (per-batch probe-union pruned scan, broadcast
    * LUT ADC, distributed exact re-rank), and results land in a
    * batchId-keyed overwrite sink (the q147 replay-idempotent shape —
    * an at-least-once redelivery rewrites the same bytes). File
    * streams partition rows, so each query is served exactly once and
    * the drained result is row-identical to batch q303 — the oracle
    * is q303's from-scratch SQL verbatim.
    *
    * 100 TB/day: the index builds once; per trigger the work is
    * O(batch queries × probed cells) — the serving cost a RAG
    * inference tier actually pays, with zero per-query driver
    * round-trips inside each batch. */
  def streamBatchServe(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import graft.operators.{IvfAnn, IvfPq}
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val centroids = IvfAnn.fixedCentroids(emb, IvfAnn.fixedStride)
    val fullPath = IvfPq.codesSegment(spark, sfDir, "full",
      IvfAnn.assign(emb, centroids))
    val outDir = graft.operators.Formats.scratchDir(
      "graft_stream_serve", srcDir.getOrElse(sfDir))
    graft.operators.Formats.wipe(outDir)
    withStreamShufflePartitions(spark) {
      val stream = readEmbeddingsStream(spark, sfDir, srcDir, maxFilesPerTrigger)
        .where(pmod(col("vec_id"), lit(IvfPq.batchQueryMod)) === 0)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
          if (!batch.isEmpty) {
            val queries = batch.toDF()
              .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
            IvfPq.batchServe(spark, Seq(fullPath), centroids, queries, emb)
              .write.mode("overwrite").parquet(s"$outDir/batch=$bid")
          }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.read.parquet(outDir)
      .select("query_id", "rank", "vec_id", "exact_dist")
      .orderBy("query_id", "rank")
  }

  val qStreamBatchServe: GraftQuery = GraftQuery(
    "q314_stream_batch_serve",
    graft.operators.IvfPq.qIvfPqBatchServe.oracle.get) { (s, d) =>
    streamBatchServe(s, d)
  }

  /** STREAMING PLANNER-DRIVEN SERVE — q328's composition run as the
    * continuous retrieval service: the nProbe policy is read ONCE
    * from the q327 planner at service start (the config loop a
    * production tier runs — measure the recall curve, pick the probe
    * width, THEN open the query stream), and every arriving query
    * micro-batch is served through the q303 plan at the planned
    * width. The oracle is q328's SQL verbatim (policy as scalar
    * subquery composed with the serve CTEs), so the hash match proves
    * per-trigger serving composes with the planner — the q145/q147
    * maintenance discipline applied to the serving tier, closing the
    * loop the round-9 verdict asked for (planner → batch serve →
    * streaming serve, one answer).
    *
    * 100 TB/day: the planner eval runs once per policy refresh (or on
    * the q340 hash sample at query-log scale); per trigger the work
    * is O(batch queries × planned probed cells). */
  def streamPlannedServe(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import graft.operators.{IvfAnn, IvfPq}
    val p = IvfPq.nProbeForRecall(spark, sfDir, IvfPq.plannedTargetPct)
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val centroids = IvfAnn.fixedCentroids(emb, IvfAnn.fixedStride)
    val fullPath = IvfPq.codesSegment(spark, sfDir, "full",
      IvfAnn.assign(emb, centroids))
    val outDir = graft.operators.Formats.scratchDir(
      "graft_stream_planned_serve", srcDir.getOrElse(sfDir))
    graft.operators.Formats.wipe(outDir)
    withStreamShufflePartitions(spark) {
      val stream = readEmbeddingsStream(spark, sfDir, srcDir, maxFilesPerTrigger)
        .where(pmod(col("vec_id"), lit(IvfPq.batchQueryMod)) === 0)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
          if (!batch.isEmpty) {
            val queries = batch.toDF()
              .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
            IvfPq.batchServe(spark, Seq(fullPath), centroids, queries, emb,
              probes = p)
              .write.mode("overwrite").parquet(s"$outDir/batch=$bid")
          }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.read.parquet(outDir)
      .select("query_id", "rank", "vec_id", "exact_dist")
      .orderBy("query_id", "rank")
  }

  val qStreamPlannedServe: GraftQuery = GraftQuery(
    "q341_stream_planned_serve",
    graft.operators.IvfPq.qPlannedServe.oracle.get) { (s, d) =>
    streamPlannedServe(s, d)
  }

  /** STREAMING COMPACTION-POLICY MAINTENANCE — q342's decision kept
    * warm as delta rows ARRIVE: the segment-size census is a MONOID
    * (counts add), so each micro-batch appends one bounded partial
    * census row per segment it touched (batchId-keyed overwrite — the
    * q147 replay-idempotent shape), and the policy re-evaluates from
    * the summed census after any trigger. This is how a long-running
    * ingest tier decides when to fold WITHOUT rescanning segments:
    * per trigger the work is one tiny aggregate over the arriving
    * batch; the durable state is ≤ nSegs rows per trigger. The
    * drained policy is the q342 batch answer — the oracle is q342's
    * SQL VERBATIM, so the hash match proves the monoid maintenance
    * and the batch census make the same decision under any arrival
    * slicing.
    *
    * 100 TB: the census partials never touch segment bytes — the
    * arriving rows are classified by the same segment rule that
    * routed them to disk, and the policy reads |segments| rows. */
  /** The drained compaction decision, materialized once per (session,
    * corpus, staging dir) — same barrier rationale as
    * [[refreshPolicyIndex]] (this maintainer predates the discipline;
    * round 11 retrofits it). */
  private val compactionPolicyIndex =
    new graft.spark.SessionMemo[(String, Option[String], Option[Int]), DataFrame](
      "streams.compactionPolicy")(
      org.apache.spark.sql.graftshim.Checkpoints.release(_))

  def streamCompactionPolicy(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame =
    compactionPolicyIndex.getOrElseUpdate(
      spark, (sfDir, srcDir, maxFilesPerTrigger))(
      drainCompactionPolicy(spark, sfDir, srcDir, maxFilesPerTrigger)
        .localCheckpoint())

  private def drainCompactionPolicy(spark: SparkSession, sfDir: String,
      srcDir: Option[String],
      maxFilesPerTrigger: Option[Int]): DataFrame = {
    import graft.operators.Compaction
    val outDir = graft.operators.Formats.scratchDir(
      "graft_stream_compact_census", srcDir.getOrElse(sfDir))
    graft.operators.Formats.wipe(outDir)
    withStreamShufflePartitions(spark) {
      val stream = readEmbeddingsStream(spark, sfDir, srcDir, maxFilesPerTrigger)
        .where(pmod(col("vec_id"), lit(5)) === 4)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
          if (!batch.isEmpty) {
            batch.toDF()
              .withColumn("seg_id", Compaction.segIdExpr)
              .groupBy("seg_id").agg(count(lit(1)).as("n_partial"))
              .write.mode("overwrite").parquet(s"$outDir/batch=$bid")
          }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val census = spark.read.parquet(outDir)
      .groupBy("seg_id").agg(sum("n_partial").as("n_rows"))
    Compaction.policyFromCensus(census)
  }

  val qStreamCompactionPolicy: GraftQuery = GraftQuery(
    "q344_stream_compaction_policy",
    graft.operators.Compaction.qCompactionPolicy.oracle.get) { (s, d) =>
    streamCompactionPolicy(s, d)
  }

  /** STREAMING MAINTENANCE OF THE INCREMENTAL-DEDUP PROBE TARGET —
    * the q344 monoid discipline applied to q345's corpus simhash
    * value census: counts per value ADD, so each arriving corpus
    * micro-batch hashes only ITS OWN documents and overwrites one
    * batchId-keyed partial census (replay-idempotent — a retried
    * trigger rewrites, never double-counts); the serve re-sums the
    * partials. The corpus is never re-hashed: per trigger the work is
    * one hash pass + one tiny aggregate over the batch, and the
    * durable state is ≤ |batch values| rows per trigger, bounded by
    * fingerprint entropy. The drained census is the q345 corpus index
    * VERBATIM (the q147 pattern) — the oracle is the same census SQL,
    * so the hash match proves the monoid maintenance converges to the
    * batch-built index under any arrival slicing. */
  /** The drained simhash census, materialized once per (session,
    * corpus, staging dir, trigger config): q350 and q351 share ONE
    * stream drain, and the checkpoint barrier decouples the returned
    * relation from the scratch directory — a later re-drain wipes and
    * rewrites those files, which would otherwise invalidate a
    * previously returned lazy census's file listing. The guard
    * statistics ride in the memo (computed ONCE over the drained,
    * checkpointed census — band-bucket occupancy is a DISTINCT-value
    * count, not additive across arriving batches, so it derives from
    * the summed census, never from per-trigger partials) and make the
    * q351 probe corpus-aggregate-free. Released on eviction. */
  private val simhashCensusIndex =
    new graft.spark.SessionMemo[
      (String, Option[String], Option[Int]),
      graft.operators.BandedHamming.StatedIndex](
      "streams.simhashCensus")(i =>
      org.apache.spark.sql.graftshim.Checkpoints.release(i.rows))

  def streamSimhashCensus(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None)
      : graft.operators.BandedHamming.StatedIndex =
    simhashCensusIndex.getOrElseUpdate(
      spark, (sfDir, srcDir, maxFilesPerTrigger))(
      graft.operators.Dedup.simhashScheme.indexed(
        drainSimhashCensus(spark, sfDir, srcDir, maxFilesPerTrigger)
          .localCheckpoint()))

  /** THE parameterized streaming value-census maintainer behind every
    * corpus-index tier (simhash q350, image q355, audio q358, wide
    * video q360): corpus documents arrive as micro-batches;
    * `featurize` turns each batch's documents into fingerprint rows
    * (synthesis + decode stay inside the partition — payloads never
    * cross an exchange or land in the sink); the per-batch census
    * partial OVERWRITES a batchId-keyed sink (replay-idempotent — a
    * retried trigger rewrites, never double-counts); the serve
    * re-sums. Counts add — every value census is a monoid — so the
    * drained relation is the batch-built corpus index VERBATIM under
    * any arrival slicing, proven per tier by the corpus-census oracle.
    * `partialSchema` pins the read-back types so each tier's output
    * schema matches its oracle exactly. `corpusFilter` selects which
    * arriving documents belong to the maintained corpus — a caller
    * concern (the current tiers pass the [[fixtureCorpusFilter]]
    * split), never a constant of the maintainer.
    *
    * `onPrefix` is the PREFIX-SERVEABILITY observation hook: when
    * present, it fires after every non-empty trigger with (the
    * trigger's doc ids, the census summed over every partial written
    * SO FAR) — the relation a mid-stream probe would serve from.
    * StreamsSpec drives it to assert that probing the
    * partially-maintained census at EVERY prefix equals the batch
    * probe over the prefix corpus (drained ≡ batch applied at every
    * trigger boundary, not just at the end). Production drains pass
    * None and pay nothing. */
  private[graft] final case class CensusTier(
      scratch: String,
      groupCols: Seq[String],
      partialSchema: String,
      scheme: graft.operators.BandedHamming.BandScheme,
      featurize: DataFrame => DataFrame)

  private[graft] def drainValueCensus(spark: SparkSession,
      tier: CensusTier, sfDir: String, srcDir: Option[String],
      maxFilesPerTrigger: Option[Int], corpusFilter: Column,
      onPrefix: Option[(Seq[Long], DataFrame) => Unit] = None): DataFrame = {
    val outDir = graft.operators.Formats.scratchDir(
      tier.scratch, srcDir.getOrElse(sfDir))
    graft.operators.Formats.wipe(outDir)
    // a drain whose every trigger is empty (all docs filtered out)
    // writes no partial — the read-back must see an empty DIRECTORY,
    // not a missing path (explicit schema makes the empty read valid)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    def summedCensus: DataFrame =
      spark.read.schema(tier.partialSchema).parquet(outDir)
        .groupBy(tier.groupCols.map(col): _*)
        .agg(sum("n_partial").as("n_docs"))
    withStreamShufflePartitions(spark) {
      val stream = readDocsStream(spark, sfDir, srcDir, maxFilesPerTrigger)
        .where(corpusFilter)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
          if (!batch.isEmpty) {
            tier.featurize(batch.toDF())
              .groupBy(tier.groupCols.map(col): _*)
              .agg(count(lit(1)).as("n_partial"))
              .write.mode("overwrite").parquet(s"$outDir/batch=$bid")
            onPrefix.foreach(f => f(
              batch.toDF().select("doc_id")
                .collect().map(_.getLong(0)).toSeq,
              summedCensus))
          }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    summedCensus
  }

  /** The incremental-dedup FIXTURES' batch/corpus split (q345/q349/
    * q353/q354 and their streaming twins): doc_id % 5 == 4 is the
    * arriving batch, everything else the maintained corpus. A fixture
    * convention, passed to [[drainValueCensus]] by each tier — the
    * shared maintainer itself is fixture-agnostic. */
  private[graft] def fixtureCorpusFilter: Column =
    pmod(col("doc_id"), lit(5)) =!= 4

  /** The four census tiers, each pairing the maintainer's featurize
    * with the banding scheme its probes use. */
  private[graft] val simhashCensusTier = CensusTier(
    "graft_stream_simhash_census", Seq("simhash"),
    "simhash BIGINT, n_partial BIGINT",
    graft.operators.Dedup.simhashScheme,
    b => b.select(org.apache.spark.sql.graftshim.SimHashMd5(
      graft.functions.TextFunctions.distinctTokens(
        lower(col("text")))).as("simhash")))

  private def drainSimhashCensus(spark: SparkSession, sfDir: String,
      srcDir: Option[String],
      maxFilesPerTrigger: Option[Int]): DataFrame =
    drainValueCensus(spark, simhashCensusTier, sfDir, srcDir,
      maxFilesPerTrigger, fixtureCorpusFilter)

  val qStreamSimhashCensus: GraftQuery = GraftQuery(
    "q350_stream_simhash_census",
    graft.operators.Dedup.simhashCorpusCensusSql) { (s, d) =>
    streamSimhashCensus(s, d).rows.orderBy("simhash")
  }

  /** INCREMENTAL DEDUP AGAINST THE STREAM-MAINTAINED INDEX — q345's
    * banded cross-corpus probe run against the census q350 keeps warm
    * under arrival, instead of the batch-built corpus index: the
    * arriving batch's values probe the drained partials through the
    * SAME probe plan (graft.operators.Dedup.simhashBatchProbe), and
    * the oracle is q345's VERBATIM — the hash match proves the
    * maintained index and the batch index are interchangeable probe
    * targets. This is the full production posture: the corpus census
    * accretes as a stream, and admission control probes it without
    * ever re-hashing or re-pairing the corpus. */
  val qStreamSimhashProbe: GraftQuery = GraftQuery(
    "q351_stream_simhash_probe",
    graft.operators.Dedup.qSimhashNearDupBatch.oracle.get) { (s, d) =>
    graft.operators.Dedup.simhashBatchProbe(s, d, streamSimhashCensus(s, d))
  }

  /** The drained image census, materialized once per (session,
    * corpus, staging dir) — the q350 discipline on the image tier
    * (see [[simhashCensusIndex]] for the barrier rationale). */
  private val imageCensusIndex =
    new graft.spark.SessionMemo[
      (String, Option[String], Option[Int]),
      graft.operators.BandedHamming.StatedIndex](
      "streams.imageCensus")(i =>
      org.apache.spark.sql.graftshim.Checkpoints.release(i.rows))

  /** STREAMING MAINTENANCE OF THE IMAGE CORPUS INDEX — q350's monoid
    * discipline on the REAL-CODEC tier: each arriving corpus
    * micro-batch synthesizes and decodes only ITS OWN PNG payloads
    * (executor-global decoder pool — constructions bounded by peak
    * task concurrency, not trigger count; payloads are born and
    * consumed inside the partition, no image bytes cross an exchange
    * or land in the sink) and overwrites one batchId-keyed partial
    * aHash census. The drained sum is the q349 corpus index VERBATIM
    * — the multimodal corpus is never re-decoded, which at 100 TB is
    * the difference between a census refresh and a full decode pass
    * over the archive. */
  def streamImageCensus(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None)
      : graft.operators.BandedHamming.StatedIndex =
    imageCensusIndex.getOrElseUpdate(
      spark, (sfDir, srcDir, maxFilesPerTrigger))(
      graft.operators.Multimodal.imageScheme.indexed(
        drainImageCensus(spark, sfDir, srcDir, maxFilesPerTrigger)
          .localCheckpoint()))

  private[graft] val imageCensusTier = CensusTier(
    "graft_stream_image_census", Seq("ahash_hi", "ahash_lo"),
    "ahash_hi BIGINT, ahash_lo BIGINT, n_partial BIGINT",
    graft.operators.Multimodal.imageScheme,
    graft.operators.Multimodal.imageAHashesFromDocs)

  private def drainImageCensus(spark: SparkSession, sfDir: String,
      srcDir: Option[String],
      maxFilesPerTrigger: Option[Int]): DataFrame =
    drainValueCensus(spark, imageCensusTier, sfDir, srcDir,
      maxFilesPerTrigger, fixtureCorpusFilter)

  val qStreamImageCensus: GraftQuery = GraftQuery(
    "q355_stream_image_census",
    graft.operators.Multimodal.imageCorpusCensusSql) { (s, d) =>
    streamImageCensus(s, d).rows.orderBy("ahash_hi", "ahash_lo")
  }

  /** INCREMENTAL IMAGE DEDUP AGAINST THE STREAM-MAINTAINED INDEX —
    * q349's banded cross-corpus probe run against the census q355
    * keeps warm (the q351 composition on the real-codec tier), oracle
    * = q349's VERBATIM: the maintained and batch-built image indexes
    * are interchangeable probe targets. */
  val qStreamImageProbe: GraftQuery = GraftQuery(
    "q356_stream_image_probe",
    graft.operators.Multimodal.qImageNearDupBatch.oracle.get) { (s, d) =>
    graft.operators.Multimodal.imageBatchProbe(s, d, streamImageCensus(s, d))
  }

  /** The drained audio census (see [[simhashCensusIndex]]). */
  private val audioCensusIndex =
    new graft.spark.SessionMemo[
      (String, Option[String], Option[Int]),
      graft.operators.BandedHamming.StatedIndex](
      "streams.audioCensus")(i =>
      org.apache.spark.sql.graftshim.Checkpoints.release(i.rows))

  /** Streaming maintenance of the q353 audio corpus index — the
    * shared [[drainValueCensus]] maintainer with the audio featurize
    * (WAV synthesis + real-codec decode per partition, one decoder
    * per task disposed on completion). */
  private[graft] val audioCensusTier = CensusTier(
    "graft_stream_audio_census", Seq("fingerprint"),
    "fingerprint BIGINT, n_partial BIGINT",
    graft.operators.Multimodal.audioScheme,
    graft.operators.Multimodal.audioFingerprintsFromDocs)

  def streamAudioCensus(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None)
      : graft.operators.BandedHamming.StatedIndex =
    audioCensusIndex.getOrElseUpdate(
      spark, (sfDir, srcDir, maxFilesPerTrigger))(
      graft.operators.Multimodal.audioScheme.indexed(
        drainValueCensus(spark, audioCensusTier, sfDir, srcDir,
          maxFilesPerTrigger, fixtureCorpusFilter)
          .localCheckpoint()))

  val qStreamAudioCensus: GraftQuery = GraftQuery(
    "q358_stream_audio_census",
    graft.operators.Multimodal.audioCorpusCensusSql) { (s, d) =>
    streamAudioCensus(s, d).rows.orderBy("fingerprint")
  }

  /** q353's probe against the stream-maintained audio index (oracle
    * verbatim — maintained and batch-built indexes interchangeable). */
  val qStreamAudioProbe: GraftQuery = GraftQuery(
    "q359_stream_audio_probe",
    graft.operators.Multimodal.qAudioNearDupBatch.oracle.get) { (s, d) =>
    graft.operators.Multimodal.audioBatchProbe(s, d, streamAudioCensus(s, d))
  }

  /** The drained wide-video census (see [[simhashCensusIndex]]). */
  private val videoWideCensusIndex =
    new graft.spark.SessionMemo[
      (String, Option[String], Option[Int]),
      graft.operators.BandedHamming.StatedIndex](
      "streams.videoWideCensus")(i =>
      org.apache.spark.sql.graftshim.Checkpoints.release(i.rows))

  /** Streaming maintenance of the q354 wide-video corpus index; the
    * census key carries the clip width (n_sampled pinned INTEGER so
    * the drained schema matches the oracle's). */
  private[graft] val videoWideCensusTier = CensusTier(
    "graft_stream_videow_census",
    graft.operators.Multimodal.videoWideCensusCols,
    graft.operators.Multimodal.videoWideCensusCols.map {
      case "n_sampled" => "n_sampled INT"
      case c => s"$c BIGINT"
    }.mkString(", ") + ", n_partial BIGINT",
    graft.operators.Multimodal.videoWideScheme,
    graft.operators.Multimodal.videoWideFromDocs)

  def streamVideoWideCensus(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None)
      : graft.operators.BandedHamming.StatedIndex =
    videoWideCensusIndex.getOrElseUpdate(
      spark, (sfDir, srcDir, maxFilesPerTrigger))(
      graft.operators.Multimodal.videoWideScheme.indexed(
        drainValueCensus(spark, videoWideCensusTier, sfDir, srcDir,
          maxFilesPerTrigger, fixtureCorpusFilter)
          .localCheckpoint()))

  val qStreamVideoWideCensus: GraftQuery = GraftQuery(
    "q360_stream_videow_census",
    graft.operators.Multimodal.videoWideCorpusCensusSql) { (s, d) =>
    streamVideoWideCensus(s, d).rows
      .orderBy(graft.operators.Multimodal.videoWideCensusCols.map(col): _*)
  }

  /** q354's probe against the stream-maintained wide-video index
    * (oracle verbatim). */
  val qStreamVideoWideProbe: GraftQuery = GraftQuery(
    "q361_stream_videow_probe",
    graft.operators.Multimodal.qVideoNearDupWideBatch.oracle.get) { (s, d) =>
    graft.operators.Multimodal.videoWideBatchProbe(
      s, d, streamVideoWideCensus(s, d))
  }

  /** STREAMING MAINTENANCE OF THE MINHASH BAND INDEX — the q350
    * discipline on the JACCARD tier, closing the one corpus index the
    * streaming matrix did not yet maintain (q94's probe target). The
    * band index is per-doc APPEND, not a count census: each arriving
    * corpus micro-batch signs only ITS OWN documents (the fused
    * MinHashBandHashes expression — shingles/digests never
    * materialize) and overwrites one batchId-keyed partial of
    * (doc_id, band_id, band_hash) rows; a retried trigger rewrites,
    * never duplicates, and the drained UNION is the batch-built band
    * index VERBATIM under any arrival slicing — each document
    * contributes its band rows exactly once. The corpus is never
    * re-shingled: per trigger the work is one signature pass over the
    * batch, the 100 TB difference between maintaining the dedup index
    * and rebuilding it per ingest. Oracle: the same bands CTE q94
    * probes, restricted to the corpus split. */
  /** The drained band index, materialized once per (session, corpus,
    * staging dir, trigger config) — see [[simhashCensusIndex]] for the
    * barrier rationale. Held as a [[graft.operators.Dedup.BandIndex]]:
    * the per-bucket census is maintained as its own batchId-keyed
    * monoid partials (counts ADD) and summed at drain, so the probe's
    * flood guard reads persisted counts instead of windowing the
    * corpus index — and the maintained index carries the SAME stated
    * shape as the batch-built one (r13, jaccard-tier gstats). */
  private val minhashBandsIndex =
    new graft.spark.SessionMemo[(String, Option[String], Option[Int]),
      graft.operators.Dedup.BandIndex](
      "streams.minhashBands")(i => {
      org.apache.spark.sql.graftshim.Checkpoints.release(i.rows)
      org.apache.spark.sql.graftshim.Checkpoints.release(i.bucketCounts)
    })

  def streamMinhashBandIndex(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None)
      : graft.operators.Dedup.BandIndex =
    minhashBandsIndex.getOrElseUpdate(
      spark, (sfDir, srcDir, maxFilesPerTrigger)) {
      val (i, _, _) = drainMinhashBands(spark, sfDir, srcDir, maxFilesPerTrigger)
      graft.operators.Dedup.BandIndex(
        i.rows.localCheckpoint(), i.bucketCounts.localCheckpoint())
    }

  /** The maintained band index's ROWS (q363's oracle surface). */
  def streamMinhashBands(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame =
    streamMinhashBandIndex(spark, sfDir, srcDir, maxFilesPerTrigger).rows

  /** Runs the drain; returns the lazy drained index plus the two
    * partial-log directories (so [[compactBandPartials]] can fold them
    * before the serve checkpoint). */
  private def drainMinhashBands(spark: SparkSession, sfDir: String,
      srcDir: Option[String],
      maxFilesPerTrigger: Option[Int])
      : (graft.operators.Dedup.BandIndex, String, String) = {
    val outDir = graft.operators.Formats.scratchDir(
      "graft_stream_minhash_bands", srcDir.getOrElse(sfDir))
    val cntDir = graft.operators.Formats.scratchDir(
      "graft_stream_minhash_band_counts", srcDir.getOrElse(sfDir))
    graft.operators.Formats.wipe(outDir)
    graft.operators.Formats.wipe(cntDir)
    // see drainValueCensus: an all-empty drain must read back as an
    // empty band index, not a missing path
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(cntDir))
    withStreamShufflePartitions(spark) {
      val stream = readDocsStream(spark, sfDir, srcDir, maxFilesPerTrigger)
        .where(pmod(col("doc_id"), lit(2)) === 0) // q94's corpus split
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
          if (!batch.isEmpty) {
            // one signature pass per trigger: bands land in the row
            // partial; the bucket-count partial derives from THOSE
            // written rows (a read-back of the just-written partial,
            // not a second signing) so rows and counts can never
            // disagree — counts are a monoid, summed at drain
            graft.operators.Dedup.docBands(batch.toDF())
              .write.mode("overwrite").parquet(s"$outDir/batch=$bid")
            spark.read
              .schema("doc_id BIGINT, band_id INT, band_hash STRING")
              .parquet(s"$outDir/batch=$bid")
              .groupBy("band_id", "band_hash")
              .agg(count(lit(1)).as("n_partial"))
              .write.mode("overwrite").parquet(s"$cntDir/batch=$bid")
          }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    (readBandLog(spark, outDir, cntDir), outDir, cntDir)
  }

  /** Serve the partial log as a [[graft.operators.Dedup.BandIndex]].
    * The parquet file listing resolves at READ construction, so this
    * must be called (again) after any fold rewrites the log. */
  private def readBandLog(spark: SparkSession, outDir: String,
      cntDir: String): graft.operators.Dedup.BandIndex =
    graft.operators.Dedup.BandIndex(
      spark.read.schema("doc_id BIGINT, band_id INT, band_hash STRING")
        .parquet(outDir)
        .select("doc_id", "band_id", "band_hash"),
      spark.read.schema("band_id INT, band_hash STRING, n_partial BIGINT")
        .parquet(cntDir)
        .groupBy("band_id", "band_hash")
        .agg(sum("n_partial").as("n_corpus")))

  /** SIZE-TIERED COMPACTION OF THE MAINTAINED BAND-INDEX PARTIAL LOG
    * (r12 verdict: the q363 index accumulated one parquet directory
    * per micro-batch FOREVER) — q344's decision arithmetic applied to
    * q363's partials: per-partial row counts come from the COUNT
    * partials (metadata-scale — band rows are never rescanned to
    * decide), partials group into exact-integer ⌊log₄ n⌋ size tiers,
    * and a tier holding ≥ [[graft.operators.Compaction.minThreshold]]
    * partials folds into ONE next-generation partial — rows by plain
    * union (append-only band rows; each doc signed exactly once), the
    * count partial by the monoid sum, so folded rows and folded
    * counts can never disagree. Folding is EXACT: the served union is
    * unchanged (spec-pinned fold ≡ union; q365 pins it through q94's
    * oracle), only the file/footer count drops. Generation names
    * carry a strictly increasing ordinal so a fold can never
    * overwrite a member it is reading. Returns the number of tiers
    * folded. */
  private[graft] def compactBandPartials(spark: SparkSession,
      outDir: String, cntDir: String): Int = {
    val rowSchema = "doc_id BIGINT, band_id INT, band_hash STRING"
    val cntSchema = "band_id INT, band_hash STRING, n_partial BIGINT"
    val dirs = Option(new java.io.File(outDir).listFiles())
      .map(_.toSeq).getOrElse(Nil)
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.getName.stripPrefix("batch=")).sorted
    if (dirs.size < graft.operators.Compaction.minThreshold) return 0
    val sizes = spark.read.parquet(cntDir)
      .groupBy(col("batch").cast("string").as("b"))
      .agg(sum("n_partial").as("n_rows"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact integer ⌊log₄ n⌋ — the q342 tier rule, no floating log
    def tierOf(n: Long): Int =
      (63 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n))) / 2
    val genRx = "^g\\d+n(\\d+)$".r
    var gen = dirs.collect { case genRx(n) => n.toInt }
      .maxOption.getOrElse(-1) + 1
    var folds = 0
    dirs.filter(sizes.contains).groupBy(d => tierOf(sizes(d)))
      .toSeq.sortBy(_._1).foreach { case (tier, members) =>
        if (members.size >= graft.operators.Compaction.minThreshold) {
          val name = s"batch=g${tier}n$gen"
          gen += 1
          spark.read.schema(rowSchema)
            .parquet(members.map(m => s"$outDir/batch=$m"): _*)
            .write.mode("overwrite").parquet(s"$outDir/$name")
          spark.read.schema(cntSchema)
            .parquet(members.map(m => s"$cntDir/batch=$m"): _*)
            .groupBy("band_id", "band_hash")
            .agg(sum("n_partial").as("n_partial"))
            .write.mode("overwrite").parquet(s"$cntDir/$name")
          members.foreach { m =>
            graft.operators.Formats.wipe(s"$outDir/batch=$m")
            graft.operators.Formats.wipe(s"$cntDir/batch=$m")
          }
          folds += 1
        }
      }
    folds
  }

  /** The maintained-then-COMPACTED band index: the corpus is staged
    * into several arrival files so the partial log genuinely
    * accumulates (8 triggers), the size-tiered fold runs, and the
    * compacted log serves the same [[graft.operators.Dedup.BandIndex]]
    * shape. Memoized once per (session, corpus); the require proves
    * the fold actually fired (the fixture's 8 same-size partials sit
    * in one tier). */
  private val minhashBandsCompactedIndex =
    new graft.spark.SessionMemo[String, graft.operators.Dedup.BandIndex](
      "streams.minhashBandsCompacted")(i => {
      org.apache.spark.sql.graftshim.Checkpoints.release(i.rows)
      org.apache.spark.sql.graftshim.Checkpoints.release(i.bucketCounts)
    })

  def streamMinhashBandIndexCompacted(spark: SparkSession,
      sfDir: String): graft.operators.Dedup.BandIndex =
    minhashBandsCompactedIndex.getOrElseUpdate(spark, sfDir) {
      val stage = graft.operators.Formats.scratchDir(
        "graft_minhash_compact_stage", sfDir)
      graft.operators.Formats.wipe(stage)
      graft.sources.Tables.documents(spark, sfDir).repartition(8)
        .write.mode("overwrite").parquet(stage)
      val (_, outDir, cntDir) =
        drainMinhashBands(spark, sfDir, Some(stage), Some(1))
      val folds = compactBandPartials(spark, outDir, cntDir)
      require(folds >= 1,
        s"compaction fixture staged 8 same-tier partials but folded $folds tiers")
      // re-read: the fold rewrote the log, and parquet file listings
      // resolve at read construction
      val i = readBandLog(spark, outDir, cntDir)
      graft.operators.Dedup.BandIndex(
        i.rows.localCheckpoint(), i.bucketCounts.localCheckpoint())
    }

  /** q365: q94's probe against the maintained-then-compacted band
    * index, q94's oracle VERBATIM — the fold is invisible to the
    * probe (hash-equal serve from a bounded partial log). */
  val qStreamMinhashCompactProbe: GraftQuery = GraftQuery(
    "q365_stream_minhash_compact_probe",
    graft.operators.Dedup.qDedupBatchVsCorpus.oracle.get) { (s, d) =>
    graft.operators.Dedup.minhashBatchProbe(s, d,
      streamMinhashBandIndexCompacted(s, d))
  }

  /** The three indexes one multi-drain pass maintains together. */
  private[graft] final case class MultiIndexes(
      simhashCensus: DataFrame,
      imageCensus: DataFrame,
      bands: graft.operators.Dedup.BandIndex)

  private val multiIndexMemo =
    new graft.spark.SessionMemo[(String, Option[String], Option[Int]),
      MultiIndexes]("streams.multiIndex")(m => {
      org.apache.spark.sql.graftshim.Checkpoints.release(m.simhashCensus)
      org.apache.spark.sql.graftshim.Checkpoints.release(m.imageCensus)
      org.apache.spark.sql.graftshim.Checkpoints.release(m.bands.rows)
      org.apache.spark.sql.graftshim.Checkpoints.release(m.bands.bucketCounts)
    })

  def streamMultiIndexes(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): MultiIndexes =
    multiIndexMemo.getOrElseUpdate(
      spark, (sfDir, srcDir, maxFilesPerTrigger)) {
      val m = drainMultiIndexes(spark, sfDir, srcDir, maxFilesPerTrigger)
      MultiIndexes(
        m.simhashCensus.localCheckpoint(),
        m.imageCensus.localCheckpoint(),
        graft.operators.Dedup.BandIndex(
          m.bands.rows.localCheckpoint(),
          m.bands.bucketCounts.localCheckpoint()))
    }

  /** SINGLE-PASS MULTI-INDEX MAINTENANCE (r12 verdict #5): the
    * per-tier maintainers each open their own stream over the same
    * document arrivals — correct, but at 100 TB that is N reads of
    * the ingest. This drain opens ONE stream and updates THREE corpus
    * indexes per trigger — the simhash value census (q350's), the
    * image aHash census (q355's), and the stated MinHash band index
    * (q363's rows + bucket counts) — so the ingest bytes are read
    * once: the trigger's documents are persisted, every index
    * featurizes from that cached batch, and each keeps its OWN
    * batchId-keyed monoid-partial contract in a tier-owned `_multi`
    * scratch dir (the single-drain twins stay untouched, which is
    * what makes the equivalence provable). Per-index corpus filters
    * apply inside the trigger — filters are an index concern, not a
    * stream concern, exactly as in the single drains. q366 oracle-
    * pairs the simhash census; StreamsSpec pins the image census and
    * the band index against their single-drain twins and asserts the
    * whole drain started exactly one streaming query. */
  private def drainMultiIndexes(spark: SparkSession, sfDir: String,
      srcDir: Option[String],
      maxFilesPerTrigger: Option[Int]): MultiIndexes = {
    val key = srcDir.getOrElse(sfDir)
    val simDir = graft.operators.Formats.scratchDir(
      simhashCensusTier.scratch + "_multi", key)
    val imgDir = graft.operators.Formats.scratchDir(
      imageCensusTier.scratch + "_multi", key)
    val bandDir = graft.operators.Formats.scratchDir(
      "graft_stream_minhash_bands_multi", key)
    val bandCntDir = graft.operators.Formats.scratchDir(
      "graft_stream_minhash_band_counts_multi", key)
    val all = Seq(simDir, imgDir, bandDir, bandCntDir)
    all.foreach(graft.operators.Formats.wipe)
    all.foreach(p =>
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p)))
    withStreamShufflePartitions(spark) {
      val stream = readDocsStream(spark, sfDir, srcDir, maxFilesPerTrigger)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
          // one read of the trigger's bytes: every index works off
          // the cached batch
          val b = batch.toDF().persist()
          try {
            if (!b.isEmpty) {
              val census = b.where(fixtureCorpusFilter)
              Seq(simhashCensusTier -> simDir,
                  imageCensusTier -> imgDir).foreach { case (t, dir) =>
                t.featurize(census)
                  .groupBy(t.groupCols.map(col): _*)
                  .agg(count(lit(1)).as("n_partial"))
                  .write.mode("overwrite").parquet(s"$dir/batch=$bid")
              }
              val corp = b.where(pmod(col("doc_id"), lit(2)) === 0)
              graft.operators.Dedup.docBands(corp)
                .write.mode("overwrite").parquet(s"$bandDir/batch=$bid")
              spark.read
                .schema("doc_id BIGINT, band_id INT, band_hash STRING")
                .parquet(s"$bandDir/batch=$bid")
                .groupBy("band_id", "band_hash")
                .agg(count(lit(1)).as("n_partial"))
                .write.mode("overwrite").parquet(s"$bandCntDir/batch=$bid")
            }
          } finally { b.unpersist(); () }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    def summed(dir: String, tier: CensusTier): DataFrame =
      spark.read.schema(tier.partialSchema).parquet(dir)
        .groupBy(tier.groupCols.map(col): _*)
        .agg(sum("n_partial").as("n_docs"))
    MultiIndexes(
      summed(simDir, simhashCensusTier),
      summed(imgDir, imageCensusTier),
      readBandLog(spark, bandDir, bandCntDir))
  }

  /** q366: the simhash corpus census maintained by the SINGLE-PASS
    * multi-index drain, q350's oracle VERBATIM — one stream read
    * feeds three indexes and the maintained census is still the batch
    * census bit for bit. */
  val qStreamMultiMaintenance: GraftQuery = GraftQuery(
    "q366_stream_multi_maintenance",
    graft.operators.Dedup.simhashCorpusCensusSql) { (s, d) =>
    streamMultiIndexes(s, d).simhashCensus.orderBy("simhash")
  }

  val qStreamMinhashBands: GraftQuery = GraftQuery(
    "q363_stream_minhash_bands",
    graft.operators.Dedup.minhashCorpusBandsSql) { (s, d) =>
    streamMinhashBands(s, d).orderBy("doc_id", "band_id")
  }

  /** INCREMENTAL JACCARD DEDUP AGAINST THE STREAM-MAINTAINED BAND
    * INDEX — q94's banded cross-corpus probe (candidates from shared
    * LSH bands, exact shingle-Jaccard verify at ≥ 0.9) run against the
    * band index q363 keeps warm under arrival, oracle = q94's
    * VERBATIM: the maintained and batch-built indexes are
    * interchangeable probe targets, completing the
    * maintain-then-probe matrix across ALL five dedup tiers (jaccard,
    * simhash, image, audio, wide video). */
  val qStreamMinhashProbe: GraftQuery = GraftQuery(
    "q364_stream_minhash_probe",
    graft.operators.Dedup.qDedupBatchVsCorpus.oracle.get) { (s, d) =>
    graft.operators.Dedup.minhashBatchProbe(s, d,
      streamMinhashBandIndex(s, d))
  }

  /** STREAMING DRIFT MONITOR — q352's refresh decision maintained ON
    * the ingest stream (the q344 discipline on the quantizer
    * lifecycle): the persisted and re-fit centroid sets are FIXED
    * index artifacts during a monitoring window, so the per-cell
    * drift census is a monoid — each arriving micro-batch double-
    * assigns only ITS OWN vectors (two fused scan-stage expressions
    * against the two bounded centroid literals; nothing broadcast,
    * nothing joined) and overwrites one batchId-keyed partial census;
    * the drained sum feeds the same exact-integer decision. This is
    * the production posture for WHEN-to-retrain: drift is measured as
    * data arrives, and the decision re-evaluates from |cells| rows of
    * summed statistics without ever rescanning the corpus. Oracle:
    * q352's VERBATIM — the hash match proves the streamed census and
    * the batch census make the same decision under any arrival
    * slicing. */
  /** The drained refresh decision, materialized once per (session,
    * corpus, staging dir) — the census-maintainer barrier discipline:
    * a re-drain wipes the scratch partials, which would invalidate a
    * previously returned lazy decision's file listing, and plan-audit
    * re-invocations must not re-pay the stream drain. Released on
    * eviction. */
  private val refreshPolicyIndex =
    new graft.spark.SessionMemo[(String, Option[String], Option[Int]), DataFrame](
      "streams.refreshPolicy")(
      org.apache.spark.sql.graftshim.Checkpoints.release(_))

  def streamRefreshPolicy(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame =
    refreshPolicyIndex.getOrElseUpdate(
      spark, (sfDir, srcDir, maxFilesPerTrigger))(
      drainRefreshPolicy(spark, sfDir, srcDir, maxFilesPerTrigger)
        .localCheckpoint())

  private def drainRefreshPolicy(spark: SparkSession, sfDir: String,
      srcDir: Option[String],
      maxFilesPerTrigger: Option[Int]): DataFrame = {
    import graft.operators.IvfAnn
    val outDir = graft.operators.Formats.scratchDir(
      "graft_stream_refresh_census", srcDir.getOrElse(sfDir))
    graft.operators.Formats.wipe(outDir)
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val pc = IvfAnn.collectCents(
      IvfAnn.fixedCentroids(emb, IvfAnn.fixedStride))
    val rc = IvfAnn.collectCents(IvfAnn.refitSample(emb))
    withStreamShufflePartitions(spark) {
      val stream = readEmbeddingsStream(spark, sfDir, srcDir, maxFilesPerTrigger)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
          if (!batch.isEmpty) {
            IvfAnn.driftCensusPartial(batch.toDF(), pc, rc)
              .write.mode("overwrite").parquet(s"$outDir/batch=$bid")
          }
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val census = spark.read
      .schema("cell_old BIGINT, n_rows BIGINT, n_moved BIGINT")
      .parquet(outDir)
      .groupBy("cell_old")
      .agg(sum("n_rows").as("n_rows"), sum("n_moved").as("n_moved"))
    // the centroid literals (persisted + re-fit) derive from the sfDir
    // embeddings; a srcDir that does not RE-STAGE that same corpus
    // would drift-census one population against another's centroids —
    // silently. Structural check: the drained census must cover
    // exactly the corpus row count (one tiny aggregate over the
    // partials, paid once per drain).
    val sRow = census.agg(sum("n_rows")).head
    val streamedRows = if (sRow.isNullAt(0)) 0L else sRow.getLong(0)
    val corpusRows = emb.count()
    require(streamedRows == corpusRows,
      s"drift census covered $streamedRows vectors but the centroid " +
        s"corpus ($sfDir embeddings) has $corpusRows — srcDir must " +
        "re-stage the same embeddings corpus the centroid literals " +
        "derive from")
    IvfAnn.refreshDecision(census)
  }

  val qStreamRefreshPolicy: GraftQuery = GraftQuery(
    "q357_stream_refresh_policy",
    graft.operators.IvfAnn.qCentroidRefreshPolicy.oracle.get) { (s, d) =>
    streamRefreshPolicy(s, d)
  }

  /** STREAMING HARD-NEGATIVE MINING: q199's per-anchor argmax
    * maintained as candidate vectors ARRIVE. Argmax under the
    * (cos desc, id asc) total order is a MONOID — the fold of
    * per-batch winners IS the global winner — so each micro-batch
    * scores only ITS OWN vectors against the broadcast anchors and
    * appends one bounded partial row per (anchor, batch); the serve
    * re-folds with the same k=1 heap and is hash-identical to batch
    * q199 under any arrival slicing (oracle verbatim). This is how a
    * contrastive-training pipeline keeps its negative pool warm while
    * the corpus grows: per trigger, work is O(batch × anchors), and
    * the durable state is |anchors| rows per trigger, never vectors. */
  def streamHardNegatives(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import graft.operators.{HardNegatives, Similarity}
    import org.apache.spark.sql.graftshim.TopKByScore
    val outDir = graft.operators.Formats.scratchDir(
      "graft_stream_hardneg", srcDir.getOrElse(sfDir))
    graft.operators.Formats.wipe(outDir)
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val anchors = emb
      .where(pmod(col("vec_id"), lit(HardNegatives.anchorStride)) === 0)
      .select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
        col("label").as("a_label"))
    withStreamShufflePartitions(spark) {
      val stream = readEmbeddingsStream(spark, sfDir, srcDir, maxFilesPerTrigger)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.toDF()
            .join(broadcast(anchors), col("label") =!= col("a_label"))
            .select(col("a_id"), col("a_label"), col("vec_id").as("neg_id"),
              Similarity.cosine(col("a_emb"), col("embedding")).as("cos"))
            .groupBy("a_id", "a_label")
            .agg(TopKByScore(col("cos"), col("neg_id"), 1).as("t"))
            .select(col("a_id"), col("a_label"),
              element_at(col("t"), 1).getField("id").as("neg_id"),
              element_at(col("t"), 1).getField("score").as("cos"))
            .write.mode("append").parquet(outDir)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    // serve: fold per-batch winners with the same total order, then
    // attach the winner's label (|anchors| rows broadcast — a point
    // lookup against the corpus)
    val folded = spark.read
      .schema("a_id BIGINT, a_label INT, neg_id BIGINT, cos DOUBLE")
      .parquet(outDir)
      .groupBy("a_id", "a_label")
      .agg(TopKByScore(col("cos"), col("neg_id"), 1).as("t"))
      .select(col("a_id"), col("a_label"),
        element_at(col("t"), 1).getField("id").as("neg_id"),
        element_at(col("t"), 1).getField("score").as("cos"))
    emb.select(col("vec_id").as("neg_id"), col("label").as("neg_label"))
      .join(broadcast(folded), "neg_id")
      .select(col("a_id"), col("a_label"), col("neg_id"),
        col("neg_label"), col("cos"))
      .orderBy("a_id")
  }

  val qStreamHardNegatives: GraftQuery = GraftQuery(
    "q325_stream_hard_negatives",
    graft.operators.HardNegatives.qHardNegatives.oracle.get) { (s, d) =>
    streamHardNegatives(s, d)
  }

  /** STREAMING COUNT-MIN SKETCH: q151's frequency estimator maintained
    * across micro-batches. Each arriving document batch contributes a
    * PARTIAL sketch (≤ depth×width counter rows — the bounded thing a
    * stream can durably append regardless of batch size); counter
    * addition is the sketch's merge operator, so the drained union
    * sums to exactly the whole-corpus sketch. The estimates are then
    * byte-identical to the batch build — the oracle is q151's SQL,
    * and the hash match proves streamed merge ≡ batch sketch. The
    * exact top-20 relation is computed batch-side (it exists only to
    * oracle-check the estimator; a production stream would point-query
    * the sketch directly).
    *
    * 100 TB: the per-trigger state is the 2048-row partial, not the
    * tokens — a vocabulary-frequency monitor whose stream-side cost is
    * constant per batch. */
  def streamCountMin(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val outDir = graft.operators.Formats.scratchDir(
      "graft_stream_cms", srcDir.getOrElse(sfDir))
    graft.operators.Formats.wipe(outDir)
    withStreamShufflePartitions(spark) {
      val stream = readDocsStream(spark, sfDir, srcDir, maxFilesPerTrigger)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          graft.operators.Selection
            .cmPartialSketch(graft.operators.Selection.docTokens(batch.toDF()))
            .write.mode("append").parquet(outDir)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val sketch = graft.operators.Selection.cmMerge(spark.read.parquet(outDir))
    val top = graft.operators.Selection.exactTop20(
      graft.operators.Selection.docTokens(
        graft.sources.Tables.documents(spark, sfDir)))
    graft.operators.Selection.cmPointQuery(sketch, top)
  }

  val qStreamCountMin: GraftQuery = GraftQuery(
    "q153_stream_countmin",
    graft.operators.Selection.qCountMinTokens.oracle.get) { (s, d) =>
    streamCountMin(s, d)
  }

  /** STREAMING DRIFT MONITOR: q160's snapshot-distribution comparison
    * fed by the stream — each arriving micro-batch appends its
    * ≤ 2·width-row partial counter table; the report runs on the
    * merged counters after the drain and is hash-identical to the
    * batch build (q160's oracle), because counter addition is the
    * merge operator. This is the production posture: the monitor's
    * state is a bounded sketch that survives any arrival slicing. */
  def streamDrift(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val outDir = graft.operators.Formats.scratchDir(
      "graft_stream_drift", srcDir.getOrElse(sfDir))
    graft.operators.Formats.wipe(outDir)
    withStreamShufflePartitions(spark) {
      val stream = readDocsStream(spark, sfDir, srcDir, maxFilesPerTrigger)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          graft.operators.Selection.driftPartial(batch.toDF())
            .write.mode("append").parquet(outDir)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    graft.operators.Selection.driftReport(
      graft.operators.Selection.driftMerge(spark.read.parquet(outDir)))
  }

  val qStreamDrift: GraftQuery = GraftQuery(
    "q165_stream_drift",
    graft.operators.Selection.qSketchDrift.oracle.get) { (s, d) =>
    streamDrift(s, d)
  }

  /** STREAMING Z-ORDER INGEST: q171's tile maintenance run inside
    * foreachBatch — the layout lifecycle's live path (build q169 →
    * batch-maintain q171 → stream-maintain q173, mirroring the ANN
    * index's q139→q140→q147 arc). Each arriving event micro-batch is
    * Morton-coded and merged into the cell-partitioned base via
    * [[graft.operators.ZOrder.incrementalMaintain]]: only the tiles
    * the batch touches are rewritten (dynamic partition overwrite),
    * so per-trigger write I/O is proportional to the BATCH's locality
    * footprint — the property that keeps a continuously-maintained
    * clustered table affordable. After the stream drains, the census
    * over the maintained tree must hash-match q169's census over the
    * whole corpus: streamed maintenance ≡ batch maintenance ≡ full
    * rebuild. */
  def streamZorderIngest(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import graft.operators.ZOrder
    val basePath = graft.operators.Formats.scratchDir(
      "graft_zorder_streambase", srcDir.getOrElse(sfDir))
    graft.operators.Formats.wipe(basePath)
    val corpus = ZOrder.eventCells(graft.sources.Tables.events(spark, sfDir))
      .where(pmod(col("event_id"), lit(5L)) =!= 4L)
    ZOrder.writeLayout(corpus, basePath)
    withStreamShufflePartitions(spark) {
      val stream = (srcDir match {
        case Some(dir) =>
          // spec-staged copy (already µs ts, possibly re-chunked for
          // multi-trigger runs)
          val fileSchema = spark.read.parquet(dir).schema
          val reader = spark.readStream.schema(fileSchema)
          maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
          graft.sources.Tables.normalizeEventsTs(reader.parquet(dir))
        case None => readEventsStream(spark, sfDir)
      }).where(pmod(col("event_id"), lit(5L)) === 4L)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          ZOrder.incrementalMaintain(spark, basePath,
            ZOrder.eventCells(batch.toDF()))
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val schema = "event_id BIGINT, user_id BIGINT, ub BIGINT, tb BIGINT, " +
      "morton BIGINT, cell BIGINT"
    spark.read.schema(schema).parquet(basePath)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_events"),
        min("user_id").as("min_user"), max("user_id").as("max_user"),
        min("tb").as("min_minute"), max("tb").as("max_minute"),
        min("morton").as("min_morton"), max("morton").as("max_morton"))
      .orderBy("cell")
  }

  val qStreamZorderIngest: GraftQuery = GraftQuery(
    "q173_stream_zorder_ingest",
    graft.operators.ZOrder.qZorderCells.oracle.get) { (s, d) =>
    streamZorderIngest(s, d)
  }

  /** STREAMING DECAYED COUNTS: q186's Q30 fixed-point trending
    * counter maintained across micro-batches. The durable per-trigger
    * state is the (event_type, day, n) PARTIAL — counts merge by
    * addition (the q153 sketch-partial pattern), and the decay
    * weighting is applied at READ time against the merged relation's
    * own max day, so late batches can only ADD to partials, never
    * invalidate applied weights. Drained result is hash-identical to
    * the batch q186 — the oracle is q186's SQL. */
  def streamDecayedCounts(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val outDir = graft.operators.Formats.scratchDir(
      "graft_stream_decay", srcDir.getOrElse(sfDir))
    graft.operators.Formats.wipe(outDir)
    withStreamShufflePartitions(spark) {
      val stream = srcDir match {
        case Some(dir) =>
          val fileSchema = spark.read.parquet(dir).schema
          val reader = spark.readStream.schema(fileSchema)
          maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
          graft.sources.Tables.normalizeEventsTs(reader.parquet(dir))
        case None => readEventsStream(spark, sfDir)
      }
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.toDF()
            .groupBy(col("event_type"), to_date(col("ts")).as("day"))
            .agg(count(lit(1)).as("n"))
            .write.mode("append").parquet(outDir)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    import org.apache.spark.sql.expressions.Window
    spark.read.schema("event_type STRING, day DATE, n BIGINT").parquet(outDir)
      .groupBy("event_type", "day").agg(sum("n").as("n")) // merge partials
      .withColumn("max_day", max("day").over(Window.partitionBy()))
      .withColumn("age", datediff(col("max_day"), col("day")).cast("long"))
      .withColumn("wgt",
        when(col("age") <= 30,
          expr("shiftleft(CAST(1 AS BIGINT), CAST(30 - age AS INT))"))
          .otherwise(lit(0L)))
      .groupBy("event_type")
      .agg(sum("n").as("n_total"),
        sum(col("n") * col("wgt")).as("decayed_q30"),
        min("age").cast("int").as("newest_age"),
        max("age").cast("int").as("oldest_age"))
      .orderBy("event_type")
  }

  val qStreamDecayedCounts: GraftQuery = GraftQuery(
    "q188_stream_decayed_counts",
    graft.operators.Extras.qDecayedCounts.oracle.get) { (s, d) =>
    streamDecayedCounts(s, d)
  }

  // ---- q203: watermark late-data accounting ----

  /** Arrival-file count and allowed lateness for the late-data audit. */
  private[graft] val lateArrivalFiles = 4
  private val lateDelayMicros = 3600L * 1000000L // 1 hour

  /** Stage the events table as [[lateArrivalFiles]] ARRIVAL files with
    * strictly increasing modification times (file i = `event_id % k =
    * i`, named arr00i): FileStreamSource picks new files oldest-mtime-
    * first (ties by path — both orders agree here by construction), so
    * with maxFilesPerTrigger=1 micro-batch i is EXACTLY file i. That
    * pins an arrival order the oracle can reconstruct — the piece
    * plain single-file staging can't give an order-DEPENDENT audit.
    * Timestamps are normalized to µs at staging so the stream schema
    * is stable across testdata generations. */
  private def stageOrderedEventArrivals(spark: SparkSession,
      sfDir: String): String = {
    val k = lateArrivalFiles
    val dir = graft.operators.Formats.scratchDir("graft_stream_late", sfDir)
    val marker = new java.io.File(dir, "_staged")
    if (!marker.exists()) {
      graft.operators.Formats.wipe(dir)
      new java.io.File(dir).mkdirs()
      val ev = graft.sources.Tables.events(spark, sfDir).select("event_id", "ts")
      (0 until k).foreach { i =>
        val tmp = new java.io.File(dir, s"_tmp$i")
        ev.where(pmod(col("event_id"), lit(k)) === i)
          .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = tmp.listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no part file staged in $tmp"))
        val dst = new java.io.File(dir, f"arr$i%03d.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        assert(dst.setLastModified(1700000000000L + i * 60000L))
        graft.operators.Formats.wipe(tmp.toString)
      }
      assert(marker.createNewFile())
    }
    dir
  }

  /** WATERMARK LATE-DATA ACCOUNTING: the event-time observability
    * monitor a production stream alerts on BEFORE anyone tunes a
    * watermark delay — per event-hour, how many rows arrived, and how
    * many arrived LATE (older than the watermark in force when their
    * micro-batch ran). The engine itself drops late rows silently;
    * this audit is the foreachBatch pass that counts them instead.
    *
    * Watermark semantics mirrored exactly: Spark computes the
    * watermark from data seen in PRIOR batches (it advances at batch
    * completion), so batch b's rows are judged against
    * `max(ts over batches < b) − delay` — batch 0 can never be late.
    * The driver-side running max is the same bounded scalar the real
    * WatermarkTracker keeps; per-batch lateness tags are written to a
    * batchId-keyed overwrite sink (the q147 replay-idempotent shape).
    *
    * 100 TB: per batch this adds one max() aggregate (map-side
    * partials, one scalar to the driver) and one narrow tagged
    * projection — no state store, no extra shuffle; the audit output
    * is window-cardinality, not event-cardinality.
    *
    * Oracle: the staged arrival assignment is `event_id % k`, so
    * DuckDB rebuilds per-batch maxima, lags the running max one batch
    * (the watermark's one-batch lag), and tags each row with the same
    * strict µs comparison. */
  def streamLateAudit(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stageOrderedEventArrivals(spark, sfDir)
    val sink = graft.operators.Formats.scratchDir("graft_late_sink", sfDir)
    graft.operators.Formats.wipe(sink)
    val runningMax = new java.util.concurrent.atomic.AtomicLong(Long.MinValue)
    withStreamShufflePartitions(spark) {
      val stream = spark.readStream.schema("event_id BIGINT, ts TIMESTAMP")
        .option("maxFilesPerTrigger", 1).parquet(dir)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], bid: Long) =>
          val priorMax = runningMax.get()
          val isLate =
            if (priorMax == Long.MinValue) lit(false)
            else unix_micros(col("ts")) < lit(priorMax - lateDelayMicros)
          batch.select(col("ts"), isLate.as("is_late"))
            .write.mode("overwrite").parquet(s"$sink/batch=$bid")
          val mx = batch.agg(max(unix_micros(col("ts")))).first()
          if (!mx.isNullAt(0))
            runningMax.getAndUpdate(m => math.max(m, mx.getLong(0)))
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.read.parquet(sink).select("ts", "is_late")
      .groupBy(date_trunc("hour", col("ts")).as("win"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("is_late").cast("long")).as("n_late"))
      .orderBy("win")
  }

  val qStreamLateAudit: GraftQuery = GraftQuery(
    "q203_stream_late_audit",
    s"""WITH arr AS (
       |  SELECT event_id, ts, event_id % $lateArrivalFiles AS b FROM events),
       |bmax AS (
       |  SELECT b, max(ts) AS mt FROM arr GROUP BY b),
       |wm AS (
       |  SELECT b, max(mt) OVER (ORDER BY b
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max
       |  FROM bmax),
       |tagged AS (
       |  SELECT a.ts,
       |    CASE WHEN w.prior_max IS NOT NULL
       |          AND a.ts < w.prior_max - INTERVAL 1 HOUR THEN 1 ELSE 0 END AS late
       |  FROM arr a JOIN wm w ON a.b = w.b)
       |SELECT date_trunc('hour', ts) AS win,
       |  CAST(count(*) AS BIGINT) AS n_events,
       |  CAST(sum(late) AS BIGINT) AS n_late
       |FROM tagged GROUP BY date_trunc('hour', ts)
       |ORDER BY win""".stripMargin) { (s, d) =>
    streamLateAudit(s, d)
  }

  /** STREAMED q208 HISTOGRAM — the proof that the quantile sketch's
    * "merges by addition" claim survives real micro-batched execution:
    * the per-(type, unit-bin) counts run as a streaming groupBy (state
    * = one counter row per occupied bin, bounded by |types|·|bins|
    * regardless of stream volume — no watermark needed because the
    * state IS the sketch), and the CDF estimates are read off the
    * final streamed state. The oracle recomputes the same estimates
    * from batch SQL, so a hash match proves streamed-partial-merge ≡
    * batch for the whole histogram, every occupied bin.
    *
    * n_bins/n_events are emitted as the bounded-state evidence: a
    * production dashboard alerts when n_bins grows toward its cap
    * (someone started logging unbounded values). */
  def streamQuantileSketch(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val name = "graft_stream_qsketch"
    withStreamShufflePartitions(spark) {
      val bins = readEventsStream(spark, sfDir)
        .groupBy(col("event_type"), floor(col("value")).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"))
      val q = bins.writeStream.outputMode("complete")
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    }
    val wCum = Window.partitionBy("event_type").orderBy("bin")
    val wTot = Window.partitionBy("event_type")
    spark.table(name)
      .withColumn("cum", sum("n").over(wCum))
      .withColumn("total", sum("n").over(wTot))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_bins"),
        max("total").as("n_events"),
        min(when(col("cum") * 100 >= col("total") * 50, col("bin"))).as("p50_est"),
        min(when(col("cum") * 100 >= col("total") * 90, col("bin"))).as("p90_est"),
        min(when(col("cum") * 100 >= col("total") * 99, col("bin"))).as("p99_est"))
      .orderBy("event_type")
  }

  val qStreamQuantileSketch: GraftQuery = GraftQuery(
    "q210_stream_quantile_sketch",
    """WITH bins AS (
      |  SELECT event_type, CAST(floor(value) AS BIGINT) AS bin,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY event_type, CAST(floor(value) AS BIGINT)),
      |cdf AS (
      |  SELECT event_type, bin, n,
      |    CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY bin) AS BIGINT) AS cum,
      |    CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS total
      |  FROM bins)
      |SELECT event_type,
      |  CAST(count(*) AS BIGINT) AS n_bins,
      |  MAX(total) AS n_events,
      |  MIN(CASE WHEN cum * 100 >= 50 * total THEN bin END) AS p50_est,
      |  MIN(CASE WHEN cum * 100 >= 90 * total THEN bin END) AS p90_est,
      |  MIN(CASE WHEN cum * 100 >= 99 * total THEN bin END) AS p99_est
      |FROM cdf
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    streamQuantileSketch(s, d)
  }

  // ---- q224: streaming event-transition matrix ----

  /** STREAMING TRANSITION MATRIX: q221's first-order Markov census
    * computed incrementally with flatMapGroupsWithState — per-user
    * state is ONE (ts_us, event_id, event_type) triple (the last event
    * seen), so the transition that SPANS a micro-batch boundary is
    * emitted when its second half arrives. Within a batch the group's
    * rows are sorted by (event-time µs, event_id) — the q43
    * discipline, since the file source guarantees no intra-batch
    * order.
    *
    * Ingestion contract (documented, spec-exercised): per-user event-
    * time order must hold ACROSS micro-batches (the log-shipping
    * assumption); a deployment with reordered arrivals puts a
    * watermark re-order buffer in front (q203's audit is the monitor
    * for exactly that). Under the contract the drained stream's
    * census is row-identical to the batch q221 — same oracle.
    *
    * 100 TB: state is O(users), emissions are the transition pairs
    * themselves (bounded by input rows); the final census aggregate is
    * map-side combinable into |types|² groups. */
  def streamTransitions(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val name = "graft_stream_transitions"
    val stream = (srcDir match {
      case Some(dir) =>
        val fileSchema = spark.read.parquet(dir).schema
        val reader = spark.readStream.schema(fileSchema)
        maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
        graft.sources.Tables.normalizeEventsTs(reader.parquet(dir))
      case None => readEventsStream(spark, sfDir)
    })
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
    def update(user: Long, rows: Iterator[(Long, Long, Long, String)],
        state: GroupState[(Long, Long, String)]): Iterator[(String, String)] = {
      val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
      val out = Seq.newBuilder[(String, String)]
      var last = state.getOption
      sorted.foreach { case (_, ts, eid, tpe) =>
        last.foreach { case (_, _, lt) => out += ((lt, tpe)) }
        last = Some((ts, eid, tpe))
      }
      last.foreach(state.update)
      out.result().iterator
    }
    withStreamShufflePartitions(spark) {
      val q = stream.groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
        .toDF("from_type", "to_type")
        .writeStream.outputMode("update").format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    }
    // census over ALL emitted transitions (each batch emits only its
    // NEW pairs, so the memory sink accumulates exactly the q221 set).
    // localCheckpoint: the totals join references the census twice and
    // the MemoryPlan leaf reuses its exprIds across references —
    // materializing the ≤|types|² census breaks the conflict
    val pairs = spark.table(name)
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val totals = pairs.groupBy("from_type").agg(sum("n").as("from_total"))
    pairs.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"), col("from_total"),
        expr("(n * 1000000) div from_total").as("p_ppm"))
      .orderBy("from_type", "to_type")
  }

  val qStreamTransitions: GraftQuery = GraftQuery(
    "q224_stream_transitions",
    graft.operators.EventFlow.qTransitions.oracle.get) { (s, d) =>
    streamTransitions(s, d)
  }

  // ---- q261: streaming ordered funnel ----

  /** STREAMING ORDERED FUNNEL: q255's view→click→purchase chain
    * maintained incrementally. Per-user state is the three earliest
    * step-completion timestamps (µs; MinValue = not reached); each
    * micro-batch replays its rows in (event-time µs, event_id) order
    * against that state and EMITS a (step) marker exactly once, when
    * the user first completes the step — so the memory sink
    * accumulates each user's funnel reach with no duplicates and the
    * drained census equals batch q255 row-for-row (same oracle).
    * Sequential replay is equivalent to q255's earliest-completion
    * joins because under the q224 ingestion contract (per-user
    * event-time order across micro-batches) the first qualifying
    * event seen IS the earliest qualifying event.
    *
    * 100 TB: state is O(users) × 24 bytes; emissions are at most
    * |steps| per user over the stream's lifetime; the serving census
    * is map-side combinable into |steps| rows. */
  def streamFunnel(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val name = "graft_stream_funnel"
    val unset = Long.MinValue
    val stream = (srcDir match {
      case Some(dir) =>
        val fileSchema = spark.read.parquet(dir).schema
        val reader = spark.readStream.schema(fileSchema)
        maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
        graft.sources.Tables.normalizeEventsTs(reader.parquet(dir))
      case None => readEventsStream(spark, sfDir)
    })
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .as[(Long, Long, Long, String)]
    def update(user: Long, rows: Iterator[(Long, Long, Long, String)],
        state: GroupState[(Long, Long, Long)]): Iterator[Int] = {
      val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
      var (v, c, p) = state.getOption.getOrElse((unset, unset, unset))
      val out = Seq.newBuilder[Int]
      sorted.foreach { case (_, ts, _, tpe) =>
        tpe match {
          case "view" if v == unset =>
            v = ts; out += 1
          case "click" if c == unset && v != unset && ts > v =>
            c = ts; out += 2
          case "purchase" if p == unset && c != unset && ts > c =>
            p = ts; out += 3
          case _ => ()
        }
      }
      state.update((v, c, p))
      out.result().iterator
    }
    withStreamShufflePartitions(spark) {
      val q = stream.groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
        .toDF("step")
        .writeStream.outputMode("update").format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    }
    // left join a literal step spine so an unreached step still emits
    // its zero row (batch q255 unions three aggregates and always has 3)
    val spine = Seq((1, "view"), (2, "click"), (3, "purchase"))
      .toDF("step", "step_name")
    val counts = spark.table(name)
      .groupBy(col("step").cast("int").as("step"))
      .agg(count(lit(1)).as("n"))
    val census = spine.join(counts, Seq("step"), "left")
      .select(col("step"), col("step_name"),
        coalesce(col("n"), lit(0L)).as("n_users"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("step")
    census
      .withColumn("first_n", first("n_users").over(w))
      .withColumn("conv_ppm", expr("(n_users * 1000000) div first_n"))
      .drop("first_n")
      .orderBy("step")
  }

  val qStreamFunnel: GraftQuery = GraftQuery(
    "q261_stream_funnel",
    graft.operators.Funnel.qFunnelSteps.oracle.get) { (s, d) =>
    streamFunnel(s, d)
  }

  // ---- q271: streaming peak concurrency ----

  /** STREAMING PEAK CONCURRENCY: q256's sweep line fed by stateful
    * incremental sessionization. Per-user state is the OPEN session
    * (start_us, last_us); each micro-batch replays its rows in
    * event-time order and emits an UPSERT (user_id, start_us, end_us)
    * for every session it touches — a session spanning k micro-batches
    * emits k monotonically-growing versions, and the serving read
    * keeps max(end_us) per (user_id, start_us). Open sessions at
    * drain time are correct because every version was already
    * emitted — there is no end-of-stream flush problem. Under the
    * q224 time-order contract the reconstructed session set equals
    * batch sessionize exactly, so the two-level sweep over it matches
    * q256's oracle.
    *
    * 100 TB: state is O(users) × 16 bytes; emissions per trigger are
    * bounded by sessions touched in that trigger; the serving dedup
    * is one map-side-combinable max per session. */
  def streamConcurrency(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val name = "graft_stream_concurrency"
    val gapUs = 1800000000L
    val stream = (srcDir match {
      case Some(dir) =>
        val fileSchema = spark.read.parquet(dir).schema
        val reader = spark.readStream.schema(fileSchema)
        maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
        graft.sources.Tables.normalizeEventsTs(reader.parquet(dir))
      case None => readEventsStream(spark, sfDir)
    })
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .as[(Long, Long, Long)]
    def update(user: Long, rows: Iterator[(Long, Long, Long)],
        state: GroupState[(Long, Long)]): Iterator[(Long, Long, Long)] = {
      val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
      val out = Seq.newBuilder[(Long, Long, Long)]
      var open = state.getOption // (start_us, last_us)
      sorted.foreach { case (_, ts, _) =>
        open match {
          case Some((st, last)) if ts - last <= gapUs =>
            open = Some((st, ts))
          case Some((st, last)) =>
            out += ((user, st, last))
            open = Some((ts, ts))
          case None =>
            open = Some((ts, ts))
        }
      }
      open.foreach { case (st, last) =>
        out += ((user, st, last)) // upsert the (possibly still open) tail
        state.update((st, last))
      }
      out.result().iterator
    }
    withStreamShufflePartitions(spark) {
      val q = stream.groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
        .toDF("user_id", "start_us", "end_us")
        .writeStream.outputMode("update").format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    }
    val sessions = spark.table(name)
      .groupBy("user_id", "start_us").agg(max("end_us").as("end_us"))
    graft.operators.Funnel.sweepSessions(sessions)
  }

  val qStreamConcurrency: GraftQuery = GraftQuery(
    "q271_stream_concurrency",
    graft.operators.Funnel.qConcurrency.oracle.get) { (s, d) =>
    streamConcurrency(s, d)
  }

  // ---- q291: streaming session KPIs ----

  /** STREAMING SESSION KPIs: q264's report maintained over the live
    * stream. Same open-session state machine as q271 with the event
    * COUNT carried too — upserts are monotone in (end_us, n_events),
    * so serve keeps the max per (user, start) and hands the
    * reconstructed sessions to q264's census math. Batch q264's
    * oracle is the contract.
    *
    * 100 TB: q271's physics + one serve-side fold; the KPI census
    * never touches raw events at serve time. */
  def streamSessionKpis(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val name = "graft_stream_session_kpis"
    val gapUs = 1800000000L
    val stream = (srcDir match {
      case Some(dir) =>
        val fileSchema = spark.read.parquet(dir).schema
        val reader = spark.readStream.schema(fileSchema)
        maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
        graft.sources.Tables.normalizeEventsTs(reader.parquet(dir))
      case None => readEventsStream(spark, sfDir)
    })
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"))
      .as[(Long, Long, Long)]
    def update(user: Long, rows: Iterator[(Long, Long, Long)],
        state: GroupState[(Long, Long, Long)]): Iterator[(Long, Long, Long, Long)] = {
      val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
      val out = Seq.newBuilder[(Long, Long, Long, Long)]
      var open = state.getOption // (start_us, last_us, n)
      sorted.foreach { case (_, ts, _) =>
        open match {
          case Some((st, last, n)) if ts - last <= gapUs =>
            open = Some((st, ts, n + 1))
          case Some((st, last, n)) =>
            out += ((user, st, last, n))
            open = Some((ts, ts, 1L))
          case None =>
            open = Some((ts, ts, 1L))
        }
      }
      open.foreach { case (st, last, n) =>
        out += ((user, st, last, n))
        state.update((st, last, n))
      }
      out.result().iterator
    }
    withStreamShufflePartitions(spark) {
      val q = stream.groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(update)
        .toDF("user_id", "start_us", "end_us", "n_events")
        .writeStream.outputMode("update").format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    }
    val sessions = spark.table(name)
      .groupBy("user_id", "start_us")
      .agg(max("end_us").as("end_us"), max("n_events").as("n_events"))
    graft.operators.Funnel.sessionKpisFrom(sessions)
  }

  val qStreamSessionKpis: GraftQuery = GraftQuery(
    "q291_stream_session_kpis",
    graft.operators.Funnel.qSessionKpis.oracle.get) { (s, d) =>
    streamSessionKpis(s, d)
  }

  // ---- q265: streaming OLS trend monitor ----

  /** STREAMING TREND MONITOR: q257's per-type OLS maintained over the
    * arriving event stream. Each micro-batch appends its own
    * (event_type, day, n_partial) census slice — counts are ADDITIVE,
    * so the serving read re-sums the partial log into the exact daily
    * census and runs the same closed-form moment combination; the
    * result is hash-identical to batch q257 REGARDLESS of arrival
    * order or batch boundaries (no ordering contract — contrast
    * q261). This is the q233/q239 partial-log posture applied to a
    * statistic whose moments are NOT batch-additive (n appears
    * squared): the additive layer is the census, the non-additive
    * math runs only at serve time over O(types × days) rows.
    *
    * 100 TB/day: per trigger the exchange carries the batch's own
    * (type, day) cells; sink growth is O(types × days) per trigger
    * and compacts by the same re-sum (a q239-style fold bounds it). */
  def streamOlsTrend(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val outDir = graft.operators.Formats.scratchDir(
      "graft_stream_ols", srcDir.getOrElse(sfDir))
    graft.operators.Formats.wipe(outDir)
    withStreamShufflePartitions(spark) {
      val stream = srcDir match {
        case Some(dir) =>
          val fileSchema = spark.read.parquet(dir).schema
          val reader = spark.readStream.schema(fileSchema)
          maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
          graft.sources.Tables.normalizeEventsTs(reader.parquet(dir))
        case None => readEventsStream(spark, sfDir)
      }
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          graft.operators.TrendStats.dailyCensus(batch.toDF())
            .write.mode("append").parquet(outDir)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val daily = spark.read.parquet(outDir)
      .groupBy("event_type", "d").agg(sum("n").as("n"))
    graft.operators.TrendStats.olsFromDaily(daily)
  }

  val qStreamOlsTrend: GraftQuery = GraftQuery(
    "q265_stream_ols_trend",
    graft.operators.TrendStats.qOlsTrend.oracle.get) { (s, d) =>
    streamOlsTrend(s, d)
  }

  // ---- q278: streaming PSI drift ----

  /** STREAMING PSI: q269's population-stability report fed by the
    * document stream. The additive layer is the (n_chars, is-src0,
    * count) length census — each micro-batch appends its own slice —
    * and the NON-additive steps (global decile boundaries, bin
    * assignment, PSI terms) run only at serve time over the merged
    * census. Like q265, there is no ordering contract: counts merge
    * under any arrival slicing, and the drained report is
    * hash-identical to batch q269 (same oracle). This matters for PSI
    * specifically because the bins are data-dependent quantiles — a
    * naive streaming binner would freeze early-batch boundaries and
    * silently skew every later batch's shares.
    *
    * 100 TB/day: per trigger the exchange carries the batch's own
    * distinct (length, side) cells; sink growth is O(distinct
    * lengths) per trigger and compacts by re-aggregation. */
  def streamPsi(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val outDir = graft.operators.Formats.scratchDir(
      "graft_stream_psi", srcDir.getOrElse(sfDir))
    graft.operators.Formats.wipe(outDir)
    withStreamShufflePartitions(spark) {
      val stream = readDocsStream(spark, sfDir, srcDir, maxFilesPerTrigger)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          graft.operators.TrendStats.lengthCensus(batch.toDF())
            .write.mode("append").parquet(outDir)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    graft.operators.TrendStats.psiFromCensus(spark.read.parquet(outDir))
  }

  val qStreamPsi: GraftQuery = GraftQuery(
    "q278_stream_psi",
    graft.operators.TrendStats.qPsiDrift.oracle.get) { (s, d) =>
    streamPsi(s, d)
  }

  // ---- q282: streaming CDC apply ----

  /** STREAMING CDC APPLY: q281's MERGE semantics over an arriving
    * change stream. arg_max is a MONOID on a totally-ordered version
    * key — arg_max of per-batch arg_maxes IS the global arg_max — so
    * each micro-batch appends its own per-key latest-version partial
    * and the serve re-folds; no ordering contract (a late-arriving
    * OLD version loses the max either way), no per-key state store.
    * The drained table is hash-identical to batch q281 (same oracle).
    *
    * 100 TB/day: per trigger the exchange carries one row per key
    * TOUCHED IN THAT BATCH; the sink is the q239 partial log and
    * compacts by this same fold. This is exactly how Delta/Iceberg
    * CDC consumers stay exactly-once without replaying the log. */
  def streamCdcApply(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val outDir = graft.operators.Formats.scratchDir(
      "graft_stream_cdc", srcDir.getOrElse(sfDir))
    graft.operators.Formats.wipe(outDir)
    withStreamShufflePartitions(spark) {
      val stream = readDocsStream(spark, sfDir, srcDir, maxFilesPerTrigger)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          graft.operators.ModelQueries.cdcLatest(
            graft.operators.ModelQueries.cdcLog(batch.toDF()))
            .write.mode("append").parquet(outDir)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val folded = graft.operators.ModelQueries.cdcFold(spark.read.parquet(outDir))
    folded.where(col("op") =!= "D")
      .select(col("k").as("doc_id"), col("final_version"), col("payload"))
      .orderBy("doc_id")
  }

  val qStreamCdcApply: GraftQuery = GraftQuery(
    "q282_stream_cdc",
    graft.operators.ModelQueries.qCdcMerge.oracle.get) { (s, d) =>
    streamCdcApply(s, d)
  }

  // ---- q299: streaming RFM maintenance ----

  /** STREAMING RFM: q290's segmentation maintained over an arriving
    * order stream. Per-batch per-customer partials (max last-order
    * date, order count, cents) fold by (max, sum, sum) — a monoid —
    * and EVERYTHING data-dependent (the recency anchor, all three
    * quintile boundaries) recomputes at serve over the folded
    * metrics, never frozen from early batches (the q278 lesson at
    * segmentation scale: early-frozen boundaries would mis-bin every
    * later customer). Drained segments equal batch q290 (same
    * oracle) under any arrival slicing.
    *
    * 100 TB/day: per trigger the exchange carries one row per
    * customer TOUCHED in the batch; the sink compacts by the fold. */
  def streamRfm(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val outDir = graft.operators.Formats.scratchDir(
      "graft_stream_rfm", srcDir.getOrElse(sfDir))
    graft.operators.Formats.wipe(outDir)
    val dir = srcDir.getOrElse(
      stageAsStreamDir("graft_stream_orders", sfDir, "orders.parquet"))
    withStreamShufflePartitions(spark) {
      val fileSchema = spark.read.parquet(dir).schema
      val reader = spark.readStream.schema(fileSchema)
      maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
      val q = reader.parquet(dir).writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          graft.operators.Behavior.rfmMetrics(batch.toDF())
            .write.mode("append").parquet(outDir)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val folded = spark.read.parquet(outDir)
      .groupBy("o_custkey")
      .agg(max("last_d").as("last_d"), sum("f").cast("long").as("f"),
        sum("m").cast("long").as("m"))
    graft.operators.Behavior.rfmSegmentsFrom(folded)
  }

  val qStreamRfm: GraftQuery = GraftQuery(
    "q299_stream_rfm",
    graft.operators.Behavior.qRfmSegments.oracle.get) { (s, d) =>
    streamRfm(s, d)
  }

  // ---- q301: streaming zone-map maintenance ----

  /** STREAMING ZONE-MAP MAINTENANCE: q267's per-layout (min, max,
    * count) manifests kept current as lineitem rows arrive — exactly
    * how a lakehouse updates file statistics per commit instead of
    * rescanning the table. Zone maps are a MONOID (fold by min / max
    * / sum), so each micro-batch appends its own partial manifest and
    * the serve-time audit runs on the fold; the drained pruning
    * report is hash-identical to batch q267 under any arrival
    * slicing (same oracle).
    *
    * 100 TB/day: per trigger the exchange carries the batch's own
    * bucket cells; the manifest compacts by the same fold and the
    * audit NEVER touches the fact table. */
  def streamZoneMaps(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val outDir = graft.operators.Formats.scratchDir(
      "graft_stream_zones", srcDir.getOrElse(sfDir))
    graft.operators.Formats.wipe(outDir)
    val dir = srcDir.getOrElse(
      stageAsStreamDir("graft_stream_lineitem", sfDir, "lineitem.parquet"))
    withStreamShufflePartitions(spark) {
      val fileSchema = spark.read.parquet(dir).schema
      val reader = spark.readStream.schema(fileSchema)
      maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
      val q = reader.parquet(dir).writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          graft.operators.ZOrder.zoneMaps(batch.toDF())
            .write.mode("append").parquet(outDir)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val folded = spark.read.parquet(outDir)
      .groupBy("layout", "bucket")
      .agg(min("zmin").as("zmin"), max("zmax").as("zmax"),
        sum("n").cast("long").as("n"))
    graft.operators.ZOrder.auditZones(folded)
  }

  val qStreamZoneMaps: GraftQuery = GraftQuery(
    "q301_stream_zonemaps",
    graft.operators.ZOrder.qZoneMapAudit.oracle.get) { (s, d) =>
    streamZoneMaps(s, d)
  }

  // ---- q298: streaming PCA maintenance ----

  /** STREAMING PCA: q275's top principal component maintained over an
    * arriving embedding stream. The eigensolver's INPUTS are a monoid
    * — Gram cells, coordinate sums, and the row count are all
    * additive — so each micro-batch appends one ≤ d·(d+1)/2-row
    * moment partial (the GramMatrix one-pass aggregate over just the
    * batch) and the serve folds the partials and runs the fixed
    * 8-iteration integer solver. The drained component is
    * hash-identical to batch q275 under ANY arrival slicing (same
    * oracle): the non-linear iteration never sees partial state, only
    * the exactly-folded moments. This is the q265/q278 partial-log
    * posture reaching an EIGENSOLVER — the strongest form of the
    * "additive layer below, non-additive math at serve" argument.
    *
    * 100 TB/day: per trigger the exchange carries one 2,080-cell
    * partial; sink growth is O(d²) per trigger and compacts by the
    * same fold. */
  def streamPca(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val outDir = graft.operators.Formats.scratchDir(
      "graft_stream_pca", srcDir.getOrElse(sfDir))
    graft.operators.Formats.wipe(outDir)
    val dir = srcDir.getOrElse(
      stageAsStreamDir("graft_stream_emb", sfDir, "embeddings.parquet"))
    withStreamShufflePartitions(spark) {
      val reader = spark.readStream
        .schema("vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
      maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
      val q = reader.parquet(dir).writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          graft.operators.Pca.gramPartial(batch.toDF())
            .write.mode("append").parquet(outDir)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    graft.operators.Pca.pcaReport(
      graft.operators.Pca.pcaFromPartials(spark, spark.read.parquet(outDir)))
  }

  val qStreamPca: GraftQuery = GraftQuery(
    "q298_stream_pca",
    graft.operators.Pca.qPcaTop.oracle.get) { (s, d) =>
    streamPca(s, d)
  }

  // ---- q288: streaming Merkle maintenance ----

  /** STREAMING MERKLE MAINTENANCE: q266's additive bucket
    * fingerprints kept current as documents arrive. The per-bucket
    * (count, Σleaf-hash) summary is a MONOID, so each micro-batch
    * appends its own partial fingerprint slice and the serve re-sums
    * — the audit side never replays the corpus. The drained diff
    * against the same deterministic v2 re-crawl is hash-identical to
    * batch q266 (same oracle), under any arrival slicing.
    *
    * 100 TB/day: per trigger the exchange carries ≤ 256 partial
    * cells; the sink compacts by the same re-sum. This is how a
    * replication auditor keeps table fingerprints warm without
    * rescanning — the q239 partial-log posture on the q266 algebra. */
  def streamMerkle(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val outDir = graft.operators.Formats.scratchDir(
      "graft_stream_merkle", srcDir.getOrElse(sfDir))
    graft.operators.Formats.wipe(outDir)
    withStreamShufflePartitions(spark) {
      val stream = readDocsStream(spark, sfDir, srcDir, maxFilesPerTrigger)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          graft.operators.ModelQueries.merkleLeaf(
            batch.toDF().select(col("doc_id"), md5(col("text")).as("fp")),
            "n_a", "f_a")
            .write.mode("append").parquet(outDir)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val a = spark.read.parquet(outDir).groupBy("bucket")
      .agg(sum("n_a").cast("long").as("n_a"),
        sum("f_a").cast("decimal(38,0)").as("f_a"))
    val b = graft.operators.ModelQueries.merkleLeaf(
      graft.operators.ModelQueries.merkleV2(
        graft.sources.Tables.documents(spark, sfDir)), "n_b", "f_b")
    a.join(b, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        coalesce(col("f_a"), lit(0L).cast("decimal(38,0)")).as("f_a"),
        coalesce(col("f_b"), lit(0L).cast("decimal(38,0)")).as("f_b"))
      .where(col("f_a") =!= col("f_b") || col("n_a") =!= col("n_b"))
      .select(expr("bucket div 16").as("node1"), col("bucket"),
        col("n_a"), col("n_b"),
        graft.operators.ModelQueries.merkleHex(col("f_a")).as("f_a"),
        graft.operators.ModelQueries.merkleHex(col("f_b")).as("f_b"))
      .orderBy("bucket")
  }

  val qStreamMerkle: GraftQuery = GraftQuery(
    "q288_stream_merkle",
    graft.operators.ModelQueries.qMerkleDiff.oracle.get) { (s, d) =>
    streamMerkle(s, d)
  }

  // ---- q312: streaming CDC chunk-census maintenance ----

  /** STREAMING CDC CENSUS: q308's chunk-hash dedup census maintained
    * as documents arrive. Each micro-batch CDC-chunks ONLY its own
    * docs and appends a per-chunk partial (n_occurrences, n_docs,
    * min_doc, max_len) — all four are monoid components (the file
    * stream partitions docs across batches, so per-batch distinct-doc
    * counts SUM exactly), so the serve-side fold is hash-identical to
    * batch q308 under any arrival slicing. The corpus is never
    * re-chunked: per trigger the exchange carries 16-byte chunk keys
    * of the batch only — the q288 partial-log posture on the q308
    * algebra (boilerplate detection that stays warm at ingest). */
  def streamCdcCensus(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val outDir = graft.operators.Formats.scratchDir(
      "graft_stream_cdc_census", srcDir.getOrElse(sfDir))
    graft.operators.Formats.wipe(outDir)
    withStreamShufflePartitions(spark) {
      val stream = readDocsStream(spark, sfDir, srcDir, maxFilesPerTrigger)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          graft.operators.CdcChunking.cdcChunks(batch.toDF())
            .groupBy("chunk_md5")
            .agg(count(lit(1)).as("n_occurrences"),
              countDistinct(col("doc_id")).as("n_docs"),
              min(col("doc_id")).as("min_doc"),
              max(col("chunk_len")).as("chunk_len"))
            .write.mode("append").parquet(outDir)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.read.parquet(outDir)
      .groupBy("chunk_md5")
      .agg(sum("n_occurrences").cast("long").as("n_occurrences"),
        sum("n_docs").cast("long").as("n_docs"),
        min("min_doc").as("min_doc"),
        max("chunk_len").cast("int").as("chunk_len"))
      .where(col("n_occurrences") > 1)
      .orderBy("chunk_md5")
  }

  val qStreamCdcCensus: GraftQuery = GraftQuery(
    "q312_stream_cdc_census",
    graft.operators.CdcChunking.qCdcDedup.oracle.get) { (s, d) =>
    streamCdcCensus(s, d)
  }

  // ---- q229: streaming KMV sketch merge ----

  /** STREAMING KMV SKETCHES: q218's per-source K-minimum-values
    * synopses maintained over an arriving document stream. KMV is a
    * MONOID — merge(sketchA, sketchB) = K smallest of the union — so
    * each micro-batch contributes its own bounded partial sketch
    * (TopKByScore heaps over just the batch) appended to a sink, and
    * the serving read folds partials with one more bounded rank. The
    * drained summary is hash-identical to the batch q218 sketch over
    * the full corpus REGARDLESS of arrival order or batch boundaries —
    * the no-contract streaming operator (contrast q224, which needs
    * time-ordered arrivals).
    *
    * 100 TB/day: per batch the exchange carries ≤ K rows per source
    * per partition; sink growth is ≤ K·sources per trigger and
    * compacts at read time (or via a q146-style fold). */
  def streamKmvSketch(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val outDir = graft.operators.Formats.scratchDir(
      "graft_stream_kmv", srcDir.getOrElse(sfDir))
    graft.operators.Formats.wipe(outDir)
    withStreamShufflePartitions(spark) {
      val stream = srcDir match {
        case Some(dir) =>
          val reader = spark.readStream.schema(
            "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
          maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
          reader.parquet(dir)
        case None => readDocsStream(spark, sfDir)
      }
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          graft.operators.KmvSketch.partialSketch(batch.toDF())
            .write.mode("append").parquet(outDir)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    val partials = spark.read.schema("source STRING, h BIGINT").parquet(outDir)
    graft.operators.KmvSketch.summarize(
      graft.operators.KmvSketch.foldSketches(partials))
  }

  val qStreamKmv: GraftQuery = GraftQuery(
    "q229_stream_kmv_sketch",
    graft.operators.KmvSketch.summarySql) { (s, d) =>
    streamKmvSketch(s, d)
  }

  // ---- q233: streaming MV maintenance ----

  /** STREAMING MV MAINTENANCE — q226's batch increment run as a
    * continuous pipeline: each arriving micro-batch of fact rows is
    * folded to DISTRIBUTIVE partials at the MV grain (count, exact
    * DECIMAL sums, min/max — the [[graft.plans.MvRewrite]] partial
    * set) inside `foreachBatch` and APPENDED to the summary store;
    * the serving read merges partials with one bounded re-aggregate
    * (count=Σn, sum=Σs — decimal addition is associative, so any
    * micro-batch slicing reconstructs the exact batch answer;
    * min=min(mn), max=max(mx)). The q229 monoid-fold pattern applied
    * to the MV lifecycle: build → serve (q214's rewrite rule) →
    * maintain, now with arrival-order independence — the drained
    * summary is hash-identical to a from-scratch recompute REGARDLESS
    * of how the corpus is split into triggers (contrast q224, which
    * needs time-ordered arrivals).
    *
    * 100 TB/day: each trigger's exchange carries ≤ grain-cardinality
    * rows per partition (map-side partial aggregation), sink growth is
    * ≤ |grain| rows per trigger, and the serving merge reads KBs. A
    * production deployment compacts the partial log periodically with
    * the same merge expression (q146-style fold) instead of at read
    * time. */
  def streamMvMaintain(spark: SparkSession, sfDir: String,
      srcDir: Option[String] = None,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val outDir = graft.operators.Formats.scratchDir(
      "graft_stream_mv", srcDir.getOrElse(sfDir))
    graft.operators.Formats.wipe(outDir)
    withStreamShufflePartitions(spark) {
      val stream = srcDir match {
        case Some(dir) =>
          val fileSchema = spark.read.parquet(dir).schema
          val reader = spark.readStream.schema(fileSchema)
          maxFilesPerTrigger.foreach(n => reader.option("maxFilesPerTrigger", n))
          reader.parquet(dir)
        case None =>
          val streamDir = stageAsStreamDir("graft_stream_li", sfDir, "lineitem.parquet")
          val fileSchema = spark.read.parquet(streamDir).schema
          spark.readStream.schema(fileSchema).parquet(streamDir)
      }
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          graft.plans.MvRewrite.mvPartial(batch.toDF())
            .write.mode("append").parquet(outDir)
          ()
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    graft.plans.MvRewrite.mvServe(spark.read.parquet(outDir))
  }

  /** Oracle = full-corpus MV recompute (q226's oracle verbatim): the
    * hash match proves streamed maintenance ≡ recompute. */
  val qStreamMvMaintain: GraftQuery = GraftQuery(
    "q233_stream_mv_maintain",
    graft.plans.MvRewrite.qMvIncrement.oracle.get) { (s, d) =>
    streamMvMaintain(s, d)
  }

  // ---- q242: stream-stream LEFT OUTER join ----

  /** Stage the full events table PLUS a far-future sentinel pair
    * (user_id = −1, one view + one click, +30 days) as arrival file 0,
    * followed by a second sentinel pair (+60 days) as arrival file 1,
    * with strictly increasing mtimes — the q203 ordered-arrival
    * technique. The sentinels drive the WATERMARK past every real
    * event: the watermark updates from the batch MAX at END of batch
    * (so sentinel 1 riding WITH the events advances it past all real
    * rows when batch 0 closes), and batch 1 (sentinel 2) is the
    * trigger in which the engine evicts expired join state and EMITS
    * the null-padded rows. Without them an outer join over a finite
    * file stream holds every unmatched row forever — the part of
    * outer-join semantics inner joins (q67) never exercise. (r12
    * staged three arrivals — events, s1, s2 — paying a third stateful
    * trigger for nothing: watermark semantics only need the sentinel
    * in the SAME batch as the rows it expires, since the update
    * happens after the batch's join anyway. q242 measured 6.2 s → see
    * OPTIMIZATION_r13.md.) */
  private def stageEventsWithSentinels(spark: SparkSession,
      sfDir: String): String = {
    val dir = graft.operators.Formats.scratchDir("graft_stream_outer2", sfDir)
    val marker = new java.io.File(dir, "_staged")
    if (!marker.exists()) {
      graft.operators.Formats.wipe(dir)
      new java.io.File(dir).mkdirs()
      import spark.implicits._
      val ev = graft.sources.Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      val maxUs = ev.agg(max(unix_micros(col("ts")))).first().getLong(0)
      def sentinels(i: Int): DataFrame = {
        val ts = maxUs + i * 30L * 86400L * 1000000L
        Seq((-2L * i, ts, -1L, "view"), (-2L * i - 1, ts, -1L, "click"))
          .toDF("event_id", "ts_us", "user_id", "event_type")
          .select(col("event_id"), timestamp_micros(col("ts_us")).as("ts"),
            col("user_id"), col("event_type"))
      }
      def writeArrival(df: DataFrame, i: Int): Unit = {
        val tmp = new java.io.File(dir, s"_tmp$i")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = tmp.listFiles()
          .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no part file staged in $tmp"))
        val dst = new java.io.File(dir, f"arr$i%03d.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        assert(dst.setLastModified(1700000000000L + i * 60000L))
        graft.operators.Formats.wipe(tmp.toString)
      }
      writeArrival(ev.unionByName(sentinels(1)), 0)
      writeArrival(sentinels(2), 1)
      assert(marker.createNewFile())
    }
    dir
  }

  /** STREAM-STREAM LEFT OUTER JOIN with watermark-bounded state: q67's
    * view⋈click interval join, keeping every view — matched rows emit
    * on match, UNMATCHED views emit null-padded only once the
    * watermark proves no qualifying click can still arrive (state
    * eviction, the semantics that make outer streaming joins hard).
    * The drained result equals the batch LEFT JOIN over the real
    * events — so the oracle hash match is a proof the engine's
    * eviction emitted exactly the unmatched set, no more, no less,
    * with sentinels (user_id < 0) filtered from the serving read.
    *
    * 100 TB: state is bounded to the 1-hour interval + watermark delay
    * per side (same physics as q67); the null-emission adds no state —
    * it is the eviction path itself. */
  def streamStreamLeftJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = stageEventsWithSentinels(spark, sfDir)
    val name = "graft_stream_louter"
    withStreamShufflePartitions(spark) {
      def src(): DataFrame = spark.readStream
        .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING")
        .option("maxFilesPerTrigger", 1).parquet(dir)
      val views = src().where(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("view_ts"))
        .withWatermark("view_ts", "1 hour")
      val clicks = src().where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
        .withWatermark("click_ts", "1 hour")
      val q = views.join(clicks,
          col("user_id") === col("c_user") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") + expr("INTERVAL 1 HOUR"),
          "leftOuter")
        .select("user_id", "view_id", "click_id")
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
    }
    spark.table(name).where(col("user_id") >= 0)
      .orderBy(col("user_id"), col("view_id"), col("click_id").asc_nulls_first)
  }

  val qStreamStreamLeftJoin: GraftQuery = GraftQuery(
    "q242_stream_stream_left_join",
    """SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id
      |FROM events v LEFT JOIN events c
      |  ON v.user_id = c.user_id AND c.event_type = 'click'
      | AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 1 HOUR
      |WHERE v.event_type = 'view'
      |ORDER BY v.user_id, view_id, click_id NULLS FIRST""".stripMargin) { (s, d) =>
    streamStreamLeftJoin(s, d)
  }

  def all: Seq[GraftQuery] =
    Seq(qStreamHourly, qStreamDedup, qStreamDedupWatermark, qStreamSessions,
      qStreamStaticJoin, qStreamStreamJoin, qStreamImageDecode,
      qStreamSessionWindow, qStreamIncrementalFunnel, qStreamAnnIngest,
      qStreamCountMin, qStreamDrift, qStreamZorderIngest,
      qStreamDecayedCounts, qStreamLateAudit, qStreamQuantileSketch,
      qStreamTransitions, qStreamKmv, qStreamMvMaintain,
      qStreamStreamLeftJoin, qStreamFunnel, qStreamOlsTrend,
      qStreamConcurrency, qStreamPsi, qStreamCdcApply, qStreamMerkle,
      qStreamCdcCensus, qStreamBatchServe, qStreamPlannedServe,
      qStreamCompactionPolicy, qStreamHardNegatives,
      qStreamSessionKpis, qStreamPca, qStreamRfm, qStreamZoneMaps,
      qStreamSimhashCensus, qStreamSimhashProbe,
      qStreamImageCensus, qStreamImageProbe, qStreamRefreshPolicy,
      qStreamAudioCensus, qStreamAudioProbe,
      qStreamVideoWideCensus, qStreamVideoWideProbe,
      qStreamMinhashBands, qStreamMinhashProbe,
      qStreamMinhashCompactProbe, qStreamMultiMaintenance)
}
