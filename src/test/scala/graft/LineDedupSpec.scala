package graft

import org.apache.spark.sql.functions._

/** q126: removal decisions and byte-exact reconstruction. */
class LineDedupSpec extends SparkSpecBase {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("planted duplicates: first occurrence survives, rewrite is exact") {
    import spark.implicits._
    val b1 = "a b c d e f g h i j" // block 1 (10 tokens)
    val b2 = "k l m n o p q r s t" // block 2
    val b3 = "u v w x y z aa bb cc dd" // unique to doc 3
    val docs = Seq(
      (1L, s"$b1 $b2", "en", "s", 0L), // keeps both blocks
      (2L, s"$b1 $b2", "en", "s", 0L), // exact dup doc: loses both
      (3L, s"$b1 $b3", "en", "s", 0L)) // loses b1, keeps b3
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_linededup").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q126_line_dedup")(spark, tmp)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq ===
      Seq((1L, 2, 0), (2L, 2, 2), (3L, 2, 1)))
    assert(out(0).getString(3) === md5hex(s"$b1 $b2"))
    assert(out(1).getString(3) === md5hex("")) // fully deduplicated away
    assert(out(2).getString(3) === md5hex(b3)) // only the unique block
  }

  test("corpus invariants: counts conserved; near-dup docs lose blocks") {
    val r = SparkEntry.queries("q126_line_dedup")(spark, sf001).cache()
    assert(r.where(col("n_removed") > col("n_blocks") || col("n_blocks") <= 0)
      .count() === 0L)
    assert(r.count() ===
      graft.sources.Tables.documents(spark, sf001).count())
    // the fixture plants near-duplicate documents whose aligned blocks
    // collide — corpus-wide line dedup must fire on them
    assert(r.agg(sum("n_removed")).first().getLong(0) > 0L)
  }
}
