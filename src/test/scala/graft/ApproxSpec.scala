package graft

class ApproxSpec extends SparkSpecBase {

  test("HLL approx distinct counts stay within the configured error bound") {
    val rows = SparkEntry.queries("q52_approx_distinct")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.10,
        s"flag=${r.getString(0)} approx=$approx exact=$exact")
    }
  }

  test("q184: winsorized stats recompute from a driver-side sort") {
    val rows = SparkEntry.queries("q184_winsorize")(spark, sf001).collect()
    assert(rows.nonEmpty)
    val vals = graft.sources.Tables.events(spark, sf001)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    rows.foreach { r =>
      val (tpe, n) = (r.getString(0), r.getLong(1))
      val vs = vals(tpe)
      assert(n === vs.length.toLong)
      // cume_dist >= q picks the ceil(q*n)-th order statistic
      def disc(q: Double): Double = vs(math.ceil(q * vs.length).toInt - 1)
      val (lo, hi) = (disc(0.05), disc(0.95))
      assert(r.getDouble(2) === lo && r.getDouble(3) === hi)
      assert(r.getLong(4) === vs.count(_ < lo).toLong)
      assert(r.getLong(5) === vs.count(_ > hi).toLong)
      val mean = vs.map(v => BigDecimal(math.max(lo, math.min(hi, v)))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum / vs.length
      assert(math.abs(r.getDouble(6) - mean.toDouble) < 1e-9,
        s"$tpe winsor_mean ${r.getDouble(6)} vs $mean")
    }
  }

  test("q187: planted orphans are counted; clean edges report zero") {
    import spark.implicits._
    import graft.operators.Extras
    // planted: 3 of 10 child rows reference a missing parent
    val child = Seq(1L, 1L, 2L, 3L, 4L, 5L, 99L, 99L, 98L, 2L).toDF("ck")
    val parent = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("pk")
    val r = Extras.fkCheck("t", child, "ck", parent, "pk",
      broadcastParent = true).collect().head
    assert(r.getLong(1) === 10L && r.getLong(2) === 3L)
    assert(r.getLong(3) === 300000L)
    // the real star schema is clean at sf0.001 (the oracle pins this
    // at every SF; here we pin the REPORT shape)
    val report = SparkEntry.queries("q187_referential_integrity")(spark, sf001)
      .collect()
    assert(report.length === 5)
    assert(report.forall(_.getLong(2) === 0L))
  }

  test("q208: sketch quantiles sit within one bin width below the exact value") {
    val rows = SparkEntry.queries("q208_quantile_sketch")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("p50", "p90", "p99").foreach { p =>
        val exact = r.getAs[Double](s"${p}_exact")
        val est = r.getAs[Long](s"${p}_est")
        val err = r.getAs[Double](s"${p}_err")
        assert(err === exact - est, s"$p err must be exact - est: $r")
        assert(err >= 0.0 && err < 1.0,
          s"$p estimate must sit within one bin width below exact: $r")
        assert(est === math.floor(exact).toLong,
          s"$p estimated bin must be the exact quantile's own bin: $r")
      }
    }
  }
}
