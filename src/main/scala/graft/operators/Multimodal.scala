package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star): media as opaque `binary`
  * payloads alongside a typed metadata struct, with a partition-batched
  * featurize step. The media decode itself is STUBBED (no image/audio
  * libs in this container) behind [[FakeDecoder]] — a deterministic
  * stand-in with the same interface a real decoder would have. The
  * Spark-side plumbing — schema, batch shape, partition-parallel
  * featurize, pushdown-friendly metadata — is real and tested.
  *
  * Scale design: payloads never shuffle. Featurization is
  * mapPartitions (one decoder init per partition, the Scala analog of
  * a Pandas-UDF batch), metadata-only queries prune the binary column
  * at the parquet scan, and derived features are small fixed-width
  * columns safe to aggregate/join downstream.
  */
object Multimodal {

  /** Metadata carried with every media payload. */
  case class MediaMeta(mediaType: String, nBytes: Int, sourceId: Long)

  case class MediaRow(doc_id: Long, meta: MediaMeta, payload: Array[Byte])

  /** Fixed-width feature record a real decoder would emit
    * (e.g. CLIP-style embedding head + dimensions). */
  case class MediaFeatures(doc_id: Long, mediaType: String, width: Int,
      height: Int, nFrames: Int, featNorm: Double)

  /** Deterministic fake decoder: derives pseudo width/height/frames and
    * a feature norm from the md5 digest of the payload — deliberately
    * md5-based (not JVM hashCode) so the derivation is reproducible in
    * any engine and the t2 oracle can hash-check the whole mapPartitions
    * featurize path. A real deployment swaps this one object for an
    * actual codec binding; everything around it is unchanged. */
  object FakeDecoder {
    private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

    /** Unsigned big-endian 32-bit value at byte offset `off` of digest. */
    private def be32(h: Array[Byte], off: Int): Long =
      ((h(off) & 0xffL) << 24) | ((h(off + 1) & 0xffL) << 16) |
        ((h(off + 2) & 0xffL) << 8) | (h(off + 3) & 0xffL)

    def decode(meta: MediaMeta, payload: Array[Byte]): MediaFeatures = {
      val d = mdLocal.get()
      d.reset()
      val h = d.digest(payload)
      val w = 64 + (be32(h, 0) % 1024)
      val ht = 64 + (be32(h, 4) % 1024)
      val frames = if (meta.mediaType == "video") 1 + (be32(h, 8) % 120) else 1L
      val norm = be32(h, 12).toDouble / 4294967296.0
      MediaFeatures(meta.sourceId, meta.mediaType, w.toInt, ht.toInt, frames.toInt, norm)
    }

    /** Batch entry point (one call per Arrow-style batch): a real
      * vectorized decoder would run the whole batch through the codec/
      * model at once; the stub maps row-wise. */
    def decodeBatch(batch: Seq[MediaRow]): Seq[MediaFeatures] =
      batch.map(r => decode(r.meta, r.payload))
  }

  /** Build a media table from `documents`: payload = UTF-8 bytes of the
    * text (an opaque blob as far as the pipeline is concerned),
    * metadata derived per row. */
  def mediaTable(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        col("text").cast("binary").as("payload"),
        // media type assigned round-robin for pipeline-shape coverage
        element_at(lit(Array("image", "audio", "video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"))
      .as[(Long, Array[Byte], String)]
      .map { case (id, payload, mt) =>
        MediaRow(id, MediaMeta(mt, payload.length, id), payload)
      }
  }

  /** Partition-batched featurize: one decoder per partition, payloads
    * consumed locally, only fixed-width features survive. */
  def featurize(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // decoder init happens once per partition here (stubbed: no-op)
      rows.map(r => FakeDecoder.decode(r.meta, r.payload))
    }
  }

  /** Batch-shaped featurize — the Scala analog of `mapInPandas`: the
    * decoder sees fixed-size BATCHES of rows (the Arrow-batch calling
    * convention a vectorized/NN decoder wants), not single rows. Same
    * output as [[featurize]]; batch size bounds peak payload memory
    * per task at batchSize × max payload. */
  def featurizeBatched(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap(FakeDecoder.decodeBatch)
    }
  }

  /** Oracle-paired slice of the plumbing: binary payload length and a
    * content digest — byte-level semantics both engines agree on.
    * (The stubbed decode features are covered rows-only + ScalaTest.) */
  val qBinaryMeta: GraftQuery = GraftQuery(
    "q33_multimodal_meta",
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
      |  md5(text) AS payload_md5,
      |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |       ELSE 'video' END AS media_type
      |FROM documents
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      octet_length(col("text").cast("binary")).as("n_bytes"),
      md5(col("text")).as("payload_md5"),
      element_at(lit(Array("image", "audio", "video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"))
      .orderBy("doc_id")
  }

  /** Exact BIGINT value of the 8 hex chars of md5 at 1-based position
    * `start` (32-bit word of the digest) — nibble arithmetic, since
    * DuckDB has no hex-string-to-int cast shared with Spark. */
  private def hexValSql(start: Int): String =
    (0 until 8).map { i =>
      s"CAST(strpos('0123456789abcdef', substring(hx, ${start + i}, 1)) - 1 AS BIGINT) * ${1L << (4 * (7 - i))}"
    }.mkString(" + ")

  /** Decoded features, oracle-checked end to end: the mapPartitions
    * featurize path (typed Dataset, per-partition decoder) against
    * DuckDB's rebuild of the md5-derived fake features. */
  val qMediaFeatures: GraftQuery = GraftQuery(
    "q34_multimodal_features",
    s"""WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
       |v AS (SELECT doc_id,
       |  ${hexValSql(1)} AS v1,
       |  ${hexValSql(9)} AS v2,
       |  ${hexValSql(17)} AS v3,
       |  ${hexValSql(25)} AS v4
       |  FROM h)
       |SELECT doc_id,
       |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       |       ELSE 'video' END AS "mediaType",
       |  CAST(64 + v1 % 1024 AS INTEGER) AS width,
       |  CAST(64 + v2 % 1024 AS INTEGER) AS height,
       |  CAST(CASE WHEN doc_id % 3 = 2 THEN 1 + v3 % 120 ELSE 1 END AS INTEGER) AS "nFrames",
       |  CAST(v4 AS DOUBLE) / 4294967296.0 AS "featNorm"
       |FROM v
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    featurize(mediaTable(s, d)).toDF().orderBy("doc_id")
  }

  def all: Seq[GraftQuery] = Seq(qBinaryMeta, qMediaFeatures)
}
