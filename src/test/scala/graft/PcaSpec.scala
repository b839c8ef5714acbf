package graft

import graft.operators.Pca

/** Independent single-node replay of q275's integer power iteration:
  * same quantization, same scatter matrix, same renormalization rule,
  * computed in BigInt on the driver — the engine must match exactly,
  * and the result must behave like a dominant eigenvector. */
class PcaSpec extends SparkSpecBase {

  test("q275 equals a BigInt driver replay and the Rayleigh quotient is maximal-ish") {
    val rows = Pca.qPcaTop.fn(spark, sf001).collect()
    assert(rows.length == Pca.dim)
    val got = rows.map(r => r.getInt(0) -> r.getLong(1)).toMap
    val eig = rows.head.getDouble(3)

    // driver replay
    val embs = graft.sources.Tables.embeddings(spark, sf001)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val d = Pca.dim
    val scale = BigInt(Pca.scaleU)
    val q = embs.map(_.map(x => BigInt(math.floor(x.toDouble * Pca.scaleU).toLong)))
    val n = BigInt(q.length)
    val si = Array.tabulate(d)(i => q.map(_(i)).sum)
    val g = Array.tabulate(d, d)((i, j) => q.map(v => v(i) * v(j)).sum)
    val sMat = Array.tabulate(d, d)((i, j) => n * g(i)(j) - si(i) * si(j))
    var v = Array.fill(d)(scale)
    def matvec(x: Array[BigInt]) =
      Array.tabulate(d)(i => (0 until d).map(j => sMat(i)(j) * x(j)).sum)
    def rayleigh(x: Array[BigInt]): Double = {
      val w = matvec(x)
      val num = (0 until d).map(i => w(i) * x(i)).sum
      val den = x.map(c => c * c).sum
      (BigDecimal(num) / BigDecimal(den)).toDouble
    }
    val r0 = rayleigh(v)
    for (_ <- 1 to Pca.iters) {
      val w = matvec(v)
      val m = w.map(_.abs).max.max(BigInt(1))
      v = w.map(wi => (if (wi < 0) BigInt(-1) else BigInt(1)) * ((wi.abs * scale) / m))
    }
    val expect = (1 to d).map(i => i -> v(i - 1).toLong).toMap
    assert(got == expect, "engine iteration diverges from the BigInt replay")

    // dominant-direction behavior: iteration must not decrease the
    // Rayleigh quotient, and the reported eig matches the replay
    val rf = rayleigh(v)
    assert(rf >= r0, s"power iteration decreased the quotient: $r0 -> $rf")
    assert(math.abs(eig - rf) <= math.ulp(rf) * 64,
      s"reported eig $eig vs replay $rf")
    assert(eig > 0, "scatter matrix is PSD on real data")
  }

  test("q277: residual r = e(vᵀv) − (eᵀv)v is EXACTLY orthogonal to v") {
    // replay the residual construction in BigInt and check rᵀv = 0
    val embs = graft.sources.Tables.embeddings(spark, sf001)
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val d = Pca.dim
    val scale = BigInt(Pca.scaleU)
    val q = embs.map(_.map(x => BigInt(math.floor(x.toDouble * Pca.scaleU).toLong)))
    val n = BigInt(q.length)
    val si = Array.tabulate(d)(i => q.map(_(i)).sum)
    val g = Array.tabulate(d, d)((i, j) => q.map(vv => vv(i) * vv(j)).sum)
    val sMat = Array.tabulate(d, d)((i, j) => n * g(i)(j) - si(i) * si(j))
    var v = Array.fill(d)(scale)
    for (_ <- 1 to Pca.iters) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => sMat(i)(j) * v(j)).sum)
      val m = w.map(_.abs).max.max(BigInt(1))
      v = w.map(wi => (if (wi < 0) BigInt(-1) else BigInt(1)) * ((wi.abs * scale) / m))
    }
    val vtv = v.map(c => c * c).sum
    q.take(20).foreach { e =>
      val p = (0 until d).map(i => e(i) * v(i)).sum
      val r = Array.tabulate(d)(i => e(i) * vtv - p * v(i))
      val rv = (0 until d).map(i => r(i) * v(i)).sum
      assert(rv == BigInt(0), s"residual not orthogonal: rv=$rv")
    }

    // the engine's top-5 on residuals runs and self is never returned
    val out = Pca.qResidualTopK.fn(spark, sf001).collect()
    assert(out.nonEmpty && out.forall(r => r.getLong(0) != r.getLong(2)))
  }

  test("q300: exact deflation kills the top direction — S'u = 0 in BigInt") {
    // replay: u = top component re-quantized to 2^8;
    // S' = c²S − c(uwᵀ + wuᵀ) + r·uuᵀ must annihilate u exactly
    val embs = graft.sources.Tables.embeddings(spark, sf001)
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    val d = Pca.dim
    val scale = BigInt(Pca.scaleU)
    val q = embs.map(_.map(x => BigInt(math.floor(x.toDouble * Pca.scaleU).toLong)))
    val n = BigInt(q.length)
    val si = Array.tabulate(d)(i => q.map(_(i)).sum)
    val g = Array.tabulate(d, d)((i, j) => q.map(v => v(i) * v(j)).sum)
    val sMat = Array.tabulate(d, d)((i, j) => n * g(i)(j) - si(i) * si(j))
    var v1 = Array.fill(d)(scale)
    for (_ <- 1 to Pca.iters) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => sMat(i)(j) * v1(j)).sum)
      val m = w.map(_.abs).max.max(BigInt(1))
      v1 = w.map(wi => (if (wi < 0) BigInt(-1) else BigInt(1)) * ((wi.abs * scale) / m))
    }
    // floorDiv for BigInt (vj can be negative; (vj*256) div 2^20 is
    // trunc in Spark — non-negative only after * ... vj CAN be
    // negative: Spark div truncates toward zero, so mirror trunc
    def truncDiv(a: BigInt, b: BigInt) =
      (if (a < 0) -1 else 1) * (a.abs / b)
    val u = v1.map(vj => truncDiv(vj * 256, scale))
    val c = u.map(x => x * x).sum
    val w = Array.tabulate(d)(i => (0 until d).map(j => sMat(i)(j) * u(j)).sum)
    val r = (0 until d).map(i => w(i) * u(i)).sum
    val sp = Array.tabulate(d, d)((i, j) =>
      c * c * sMat(i)(j) - c * (u(i) * w(j) + w(i) * u(j)) + r * u(i) * u(j))
    (0 until d).foreach { i =>
      val spu = (0 until d).map(j => sp(i)(j) * u(j)).sum
      assert(spu == BigInt(0), s"S'u must vanish exactly, row $i: $spu")
    }

    // the engine's second component: reported u·v is small relative to
    // |u||v| (near-orthogonality survives the engine's quantizations)
    val rows = Pca.qPcaSecond.fn(spark, sf001).collect()
    assert(rows.length == d)
    val uv = rows.head.getLong(4)
    val vAbs = rows.map(r0 => math.abs(r0.getLong(1))).max
    assert(vAbs > 0, "second component must be non-degenerate")
    val uAbs = u.map(_.abs.toLong).max
    assert(math.abs(uv).toDouble <= 0.05 * uAbs.toDouble * 64 * 1024,
      s"u.v=$uv too large — deflation failed")
  }
}
