package graft

import graft.operators.TextVector
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.CharGramVector

class TextVectorSpec extends SparkSpecBase {

  /** Reference reimplementation of the hash pipeline (independent of
    * the expression's internals). */
  private def refVector(text: String, dim: Int): Array[Long] = {
    val v = new Array[Long](dim)
    val cps = text.codePoints().toArray
    for (i <- 0 until math.max(0, cps.length - 2)) {
      val g = cps(i).toLong * 961L + cps(i + 1).toLong * 31L + cps(i + 2).toLong
      val h = (g * 2654435761L) % 4294967296L
      if (((h >>> 16) & 1L) == 0L) v((h % dim).toInt) += 1L
      else v((h % dim).toInt) -= 1L
    }
    v
  }

  test("CharGramVector matches the reference hash pipeline, incl. edge cases") {
    import spark.implicits._
    val samples = Seq(
      "the quick brown fox jumps over the lazy dog",
      "",      // no grams
      "ab",    // under 3 code points
      "aaa",   // single gram
      "naïve café — déjà vu",          // non-ASCII, combining-free
      "日本語の文" // CJK (3-byte UTF-8 code points)
    )
    val got = samples.toDF("text")
      .select(CharGramVector(col("text"), 64).as("v"))
      .as[Array[Long]].collect()
    samples.zip(got).foreach { case (s, v) =>
      assert(v.toSeq === refVector(s, 64).toSeq, s"text: $s")
    }
  }

  test("CharGramVector supplementary code points count as single grams") {
    import spark.implicits._
    // U+1F600 is two UTF-16 units but ONE code point: "a😀b😀c" has
    // 5 code points → 3 grams
    val s = "a😀b😀c"
    val v = Seq(s).toDF("text")
      .select(CharGramVector(col("text"), 64).as("v"))
      .as[Array[Long]].collect().head
    assert(v.map(math.abs).sum === 3L)
    assert(v.toSeq === refVector(s, 64).toSeq)
  }

  test("codegen and interpreted evaluation agree") {
    import spark.implicits._
    val df = graft.sources.Tables.documents(spark, sf001).select("text")
    val code = df.select(CharGramVector(col("text"), 64).as("v"))
      .as[Array[Long]].collect().toSeq
    val interp = withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      df.select(CharGramVector(col("text"), 64).as("v"))
        .as[Array[Long]].collect().toSeq
    }
    assert(code.map(_.toSeq) === interp.map(_.toSeq))
  }

  test("near-dup gate margin: no cosine score sits near the 0.955 threshold") {
    val vecs = graft.sources.Tables.documents(spark, sf001)
      .select(col("doc_id"), CharGramVector(col("text"), TextVector.dim).as("vl"))
      .where(aggregate(col("vl"), lit(0L), (acc, x) => acc + abs(x)) > 0)
      .select(col("doc_id"), col("vl").cast("array<float>").as("embedding"))
    val sigs = vecs.select(col("doc_id"), col("embedding"),
      graft.operators.Similarity.lshSignature(col("embedding")).as("bucket"))
    val a = sigs.select(col("doc_id").as("doc_a"), col("embedding").as("e_a"), col("bucket"))
    val b = sigs.select(col("doc_id").as("doc_b"), col("embedding").as("e_b"),
      col("bucket").as("bucket_b"))
    val scores = a.join(b, col("bucket") === col("bucket_b") && col("doc_a") < col("doc_b"))
      .select(graft.operators.Similarity.cosine(col("e_a"), col("e_b")).as("cos"))
      .collect().map(_.getDouble(0))
    assert(scores.nonEmpty)
    // threshold stability: an engine-level ulp difference cannot flip
    // membership when nothing scores within ±0.005 of the gate
    assert(!scores.exists(s => s > 0.95 && s < 0.96),
      s"scores near gate: ${scores.filter(s => s > 0.93 && s < 0.98).mkString(",")}")
  }

  private def withSQLConf[T](kvs: (String, String)*)(f: => T): T = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
