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
}
