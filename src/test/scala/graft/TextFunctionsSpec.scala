package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("t")

  private def evalInt(text: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Int =
    one(text).select(c(col("t"))).first().getInt(0)

  test("tokenCount on whitespace tokenizer") {
    assert(evalInt("the fast key", tokenCount) === 3)
    assert(evalInt("solo", tokenCount) === 1)
  }

  test("bpeish token count splits words, digit runs, punctuation") {
    assert(evalInt("ab12 cd!", bpeishTokenCount) === 4) // ab,12,cd,!
  }

  test("extractNumbers matches ints and decimals (T1 parity)") {
    val got = one("go 12 then 3.5 end 7")
      .select(extractNumbers(col("t"))).first().getSeq[String](0)
    assert(got === Seq("12", "3.5", "7"))
  }

  test("stopword ratio and quality score are bounded") {
    val r = one("the a of junk")
      .select(stopwordRatio(col("t")), qualityScore(col("t"))).first()
    assert(r.getDouble(0) === 0.75)
    assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
  }

  test("punctRatio counts non-alphanumeric non-space chars") {
    val r = one("ab!?").select(punctRatio(col("t"))).first().getDouble(0)
    assert(r === 0.5)
  }

  test("langGuess argmax with fixed precedence") {
    val r = one("the the data spark")
      .select(langGuess(col("t"))).first().getString(0)
    assert(r === "en") // en hits 2 beats es/de 1
    val r2 = one("data table row query")
      .select(langGuess(col("t"))).first().getString(0)
    assert(r2 === "es")
  }

  test("normalized fingerprint is word-order and duplication invariant") {
    val fps = Seq("b a a c", "c b a", "a b c x")
      .toDF("t").select(normalizedFingerprint(col("t"))).collect().map(_.getString(0))
    assert(fps(0) === fps(1))
    assert(fps(0) !== fps(2))
  }

  test("content fingerprint is case-insensitive exact md5") {
    val fps = Seq("Hello World", "hello world")
      .toDF("t").select(contentFingerprint(col("t"))).collect().map(_.getString(0))
    assert(fps(0) === fps(1))
    assert(fps(0) === "5eb63bbbe01eeed093cb22bb8f5acdc3") // md5("hello world")
  }

  test("nfc_normalize composes decomposed sequences, is idempotent, preserves ASCII") {
    import org.apache.spark.sql.graftshim.NfcNormalize
    val decomposed = "cafe\u0301" // e + combining acute U+0301
    val composed = "caf\u00e9"    // precomposed e-acute
    val got = Seq((decomposed, composed, "plain ascii", null: String))
      .toDF("dec", "comp", "ascii", "nul")
      .select(
        NfcNormalize(col("dec")).as("n_dec"),
        NfcNormalize(col("comp")).as("n_comp"),
        NfcNormalize(NfcNormalize(col("dec"))).as("n_idem"),
        NfcNormalize(col("ascii")).as("n_ascii"),
        NfcNormalize(col("nul")).as("n_nul"),
        length(col("dec")).as("len_dec"),
        length(NfcNormalize(col("dec"))).as("len_norm")).first()
    assert(got.getString(0) === composed)
    assert(got.getString(1) === composed)
    assert(got.getString(2) === composed)
    assert(got.getString(3) === "plain ascii")
    assert(got.isNullAt(4))
    assert(got.getInt(5) === 5 && got.getInt(6) === 4)
  }

  test("q205: a planted always-adjacent pair dominates frequent-but-independent pairs") {
    import spark.implicits._
    // 6 docs "foo bar the*20": foo/bar occur ONLY as the pair
    // (c_xy = c_x = c_y = 6) while "the the" is frequent but expected
    // under independence. N_u = 132, N_b = 126.
    val text = "foo bar " + Seq.fill(20)("the").mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("graft_pmi").toString
    (0L until 6L).map(i => (i, text, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q205_pmi_bigrams")(spark, tmp).collect()
    assert(out.head.getString(0) === "foo" && out.head.getString(1) === "bar",
      s"planted collocation must rank first: ${out.head}")
    // exact integer-quantized score: 6*132*132*1e6 div (126*6*6)
    assert(out.head.getAs[Long]("pmi_q") ===
      6L * 132 * 132 * 1000000 / (126L * 6 * 6))
    // the frequent independent pair scores near 1e6 (= PMI ratio ~1.09)
    val theThe = out.find(r => r.getString(0) == "the" && r.getString(1) == "the").get
    assert(theThe.getAs[Long]("pmi_q") < 2000000L)
  }
}
