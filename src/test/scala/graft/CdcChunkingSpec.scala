package graft

import graft.operators.CdcChunking
import org.apache.spark.sql.functions._

/** The property CDC chunking exists for: chunk identity SURVIVES
  * edits that shift offsets. */
class CdcChunkingSpec extends SparkSpecBase {
  import spark.implicits._

  private def chunkHashes(docs: org.apache.spark.sql.DataFrame): Map[Long, Seq[String]] =
    CdcChunking.cdcChunks(docs)
      .groupBy("doc_id").agg(collect_list("chunk_md5").as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap

  test("a prefix edit: CDC retains most chunk hashes, fixed windows lose all") {
    // a deterministic ~1.5k-char text with enough entropy for ~20 cuts
    val body = (0 until 220).map(i => f"w${(i * 2654435761L % 9973)}%04d").mkString(" ")
    val edited = "BREAKING BANNER INSERTED 2026 " + body
    val docs = Seq((1L, body), (2L, edited)).toDF("doc_id", "text")
    val cdc = chunkHashes(docs)
    val shared = cdc(1L).toSet.intersect(cdc(2L).toSet).size
    // every chunk after the cutter resyncs is identical; only the
    // chunk(s) containing the insertion differ
    assert(shared >= cdc(1L).size - 3,
      s"CDC must retain chunk identity past the resync point: " +
        s"shared=$shared of ${cdc(1L).size}")
    // the fixed-offset q122 windows lose essentially everything: the
    // 30-char prefix shifts every 150-stride window off alignment
    val fixed = graft.operators.TrainingPipeline.chunkRelationOf(docs)
      .select(col("doc_id"), md5(col("chunk")).as("h"))
      .groupBy("doc_id").agg(collect_list("h").as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val fixedShared = fixed(1L).intersect(fixed(2L)).size
    assert(fixedShared == 0,
      s"fixed windows should share no chunks after a prefix shift, got $fixedShared")
    assert(shared > fixedShared)
  }

  test("fused CdcBounds equals the composed boundary pipeline element-for-element") {
    val edgy = Seq(
      "a", "ab", "abcdefg", "abcdefgh", // below/at the window width
      "x" * 500, // degenerate repetition
      "unicode éèê and 𝄞 supplementary plane chars mixed in 𝄢 here",
      (0 until 300).map(i => f"tok$i%03d").mkString(" "))
    val docs = graft.sources.Tables.documents(spark, sf001)
      .select(col("text")).limit(200)
      .unionByName(edgy.toDF("text"))
    val both = docs.where(length(col("text")) >= 1)
      .select(CdcChunking.boundsColComposed(col("text")).as("c"),
        CdcChunking.boundsColFused(col("text")).as("f"))
    // the composed form emits INT via the sequence (Spark types them
    // int already); compare as sequences
    val bad = both.where(not(col("c") === col("f"))).count()
    assert(bad == 0, s"$bad rows differ between fused and composed bounds")
  }

  test("chunks partition the text exactly: offsets contiguous, lengths sum to len") {
    val docs = graft.sources.Tables.documents(spark, sf001).limit(50)
    val rows = CdcChunking.cdcChunks(docs)
      .orderBy("doc_id", "chunk_idx").collect()
    rows.groupBy(_.getLong(0)).foreach { case (docId, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.head.getInt(2) == 1, s"doc $docId must start at 1")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getInt(2) + a.getInt(3) == b.getInt(2),
            s"doc $docId chunks must be contiguous")
        case _ => ()
      }
    }
    // lengths sum to the doc length
    val sums = CdcChunking.cdcChunks(docs)
      .groupBy("doc_id").agg(sum("chunk_len").as("total"))
      .join(docs.select(col("doc_id"), length(col("text")).as("len")), "doc_id")
      .where(col("total") =!= col("len")).count()
    assert(sums == 0, "chunk lengths must sum to the text length")
  }
}
