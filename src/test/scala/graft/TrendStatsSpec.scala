package graft

import graft.operators.TrendStats

/** Internal-consistency checks for the exact-statistics family: the
  * rational and double renderings must agree, bounded statistics must
  * stay in range, and margins must re-add. (Cross-engine value
  * equality is the driver's DuckDB oracle; these pin the algebra.) */
class TrendStatsSpec extends SparkSpecBase {

  test("q257 OLS: slope double equals the exact rational; r2 in [0,1]") {
    val rows = TrendStats.qOlsTrend.fn(spark, sf001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val num = r.getLong(2); val den = r.getLong(3)
      assert(den > 0, "more than one day per type in the corpus")
      assert(r.getDouble(4) == num.toDouble / den.toDouble)
      val r2 = r.getDouble(6)
      assert(r2 >= 0.0 && r2 <= 1.0, s"r2 out of range: $r2")
    }
  }

  test("q258 ACF: 7 lags, |acf| <= 1, sign agrees with the exact numerator") {
    val rows = TrendStats.qAcf.fn(spark, sf001).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 7L))
    rows.foreach { r =>
      val num = r.getLong(2); val acf = r.getDouble(3)
      assert(math.abs(acf) <= 1.0)
      assert(math.signum(acf) == math.signum(num.toDouble),
        s"acf $acf disagrees with exact numerator $num")
    }
  }

  test("q259 Spearman: rho in [-1,1] and rho_ppm is the floor of rho*1e6") {
    val rows = TrendStats.qSpearman.fn(spark, sf001).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val n = r.getLong(1); val sd2 = r.getLong(2)
      val ppm = r.getLong(3); val rho = r.getDouble(4)
      assert(rho >= -1.0 && rho <= 1.0)
      // exact check: ppm = 1e6 - floor(6e6*sd2 / (n^3-n))
      val exact = BigInt(1000000) -
        (BigInt(6000000) * BigInt(sd2)) / (BigInt(n).pow(3) - BigInt(n))
      assert(BigInt(ppm) == exact, s"rho_ppm $ppm != exact $exact")
      assert(math.abs(rho - ppm / 1e6) < 2e-6)
    }
  }

  test("q260 chi-square: margins re-add and the total is the contribution sum") {
    val rows = TrendStats.qChiSquare.fn(spark, sf001).collect()
    val cells = rows.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    // per-lang observed sums equal the reported row margin
    cells.groupBy(_._1).foreach { case (lang, cs) =>
      val o = cs.map(_._3).sum
      assert(cs.forall(_._4 == o), s"lang $lang margin mismatch")
    }
    cells.groupBy(_._2).foreach { case (src, cs) =>
      val o = cs.map(_._3).sum
      assert(cs.forall(_._5 == o), s"source $src margin mismatch")
    }
    val total = cells.map(_._6).sum
    assert(cells.forall(_._7 == total), "chi2_ppm_total must be the cell sum")
    assert(cells.forall(_._6 >= 0), "contributions are squares — non-negative")
  }
}
