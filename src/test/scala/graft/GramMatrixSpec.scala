package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GramMatrix

/** One-pass Gram aggregate: exact equality with a driver-side BigInt
  * outer-product sum, and a LOUD throw on long overflow instead of a
  * silent wrap. */
class GramMatrixSpec extends SparkSpecBase {

  import spark.implicits._

  test("gram equals the BigInt outer-product sum on planted vectors") {
    val d = 5
    val vecs = Seq(
      Array(1L, -2L, 3L, 0L, 7L),
      Array(4L, 5L, -6L, 2L, -1L),
      Array(0L, 0L, 9L, -3L, 8L))
    val df = vecs.map(v => Tuple1(v.toSeq)).toDF("qv")
      .repartition(3) // force per-partition partials + a merge
    val got = df.agg(GramMatrix(col("qv"), d).as("t"))
      .select(explode(col("t")).as("e"))
      .select("e.i", "e.j", "e.g").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    for (i <- 1 to d; j <- i to d) {
      val want = vecs.map(v => BigInt(v(i - 1)) * BigInt(v(j - 1))).sum
      assert(BigInt(got((i, j))) == want, s"cell ($i,$j)")
    }
    assert(got.size == d * (d + 1) / 2, "upper triangle only")
  }

  test("long overflow throws instead of wrapping") {
    val big = 3037000500L // floor(sqrt(Long.MaxValue)) + 1 → big*big overflows
    val df = Seq(Tuple1(Seq(big, 0L))).toDF("qv")
    val ex = intercept[Exception] {
      df.agg(GramMatrix(col("qv"), 2).as("t")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(ex).exists(_.isInstanceOf[ArithmeticException]),
      s"expected ArithmeticException in cause chain, got $ex")
  }

  test("dimension mismatch throws loudly") {
    val df = Seq(Tuple1(Seq(1L, 2L, 3L))).toDF("qv")
    val ex = intercept[Exception] {
      df.agg(GramMatrix(col("qv"), 2).as("t")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10).toSeq
    assert(chain(ex).exists(_.isInstanceOf[IllegalArgumentException]), s"got $ex")
  }
}
