package graft

import org.apache.spark.sql.functions._

/** q122: chunk-geometry invariants on a planted doc + corpus-wide. */
class ChunkSpec extends SparkSpecBase {

  test("planted doc: offsets, overlap, tail length, chunk bytes") {
    import spark.implicits._
    val text = ('a' to 'z').mkString * 14 // 364 chars -> chunks at 1,151,301
    val covered = "x" * 200 // one full window covers it: exactly 1 chunk,
    // no redundant 151-200 tail inside chunk 0
    val tmp = java.nio.file.Files.createTempDirectory("graft_chunk").toString
    Seq((7L, text, "en", "s", text.length.toLong),
      (8L, covered, "en", "s", 200L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q122_chunk_documents")(spark, tmp).collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq ===
      Seq((7L, 0, 1, 200), (7L, 1, 151, 200), (7L, 2, 301, 64),
        (8L, 0, 1, 200)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1).getString(4) === hex(text.substring(150, 350)))
    assert(out(2).getString(4) === hex(text.substring(300)))
  }

  test("corpus-wide: every doc fully covered, strides exact") {
    val chunks = SparkEntry.queries("q122_chunk_documents")(spark, sf001)
    val bad = chunks.where(
      col("chunk_start") =!= lit(1) + lit(150) * col("chunk_idx") ||
        col("chunk_len") < 1 || col("chunk_len") > 200).count()
    assert(bad === 0L)
    // last chunk of each doc reaches the end of the text
    val docs = graft.sources.Tables.documents(spark, sf001)
      .select(col("doc_id"), length(col("text")).as("len"))
    val uncovered = chunks.groupBy("doc_id")
      .agg(max(col("chunk_start") + col("chunk_len") - 1).as("covered"))
      .join(docs, "doc_id")
      .where(col("covered") =!= col("len")).count()
    assert(uncovered === 0L)
  }
}
