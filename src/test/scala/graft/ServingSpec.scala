package graft

import graft.operators.Serving
import org.apache.spark.sql.functions._

/** Pins the serving capstone's parse/impute cascade against the
  * reference's documented behavior (Application.py:28-75): positional
  * numeric mapping, default values, inference order (defaults applied
  * before speed inference), int() truncation, and the
  * zero-duration ZeroDivisionError fallback. */
class ServingSpec extends SparkSpecBase {

  private def parse(texts: String*): Seq[(Double, Int, Double, Double, Int, Int, Int)] = {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "request")
    Serving.parseNlTrip(df).orderBy("doc_id")
      .select("trip_distance", "passenger_count", "trip_duration_minutes",
        "avg_speed_mph", "rate_code_id", "payment_type", "n_defaults")
      .collect()
      .map(r => (r.getDouble(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3), r.getInt(4), r.getInt(5), r.getInt(6))).toSeq
  }

  test("reference example: '10 miles, 3 passengers, 20 minutes' infers speed") {
    // Application.py's own docstring example: speed = 10/(20/60) = 30
    assert(parse("10 miles, 3 passengers, 20 minutes").head ==
      ((10.0, 3, 20.0, 30.0, 1, 1, 1)))
  }

  test("empty text gets every documented default") {
    // distance 5.0, passengers 1, duration 15.0 (Application.py:46-58),
    // speed inferred from the DEFAULTED values: 5/(15/60) = 20.0;
    // rate/payment default to 1 without counting as defaults-list
    // entries — four entries total (dist, pc, dur, speed)
    assert(parse("no numbers at all").head ==
      ((5.0, 1, 15.0, 20.0, 1, 1, 4)))
  }

  test("distance only: duration defaults, then speed infers from the defaulted duration") {
    assert(parse("7.5").head == ((7.5, 1, 15.0, 30.0, 1, 1, 3)))
  }

  test("zero duration hits the ZeroDivisionError arm: speed falls to 20.0") {
    // Application.py:59-65 — the try/except around distance/(dur/60)
    assert(parse("3 2 0").head == ((3.0, 2, 0.0, 20.0, 1, 1, 1)))
  }

  test("all six present: no defaults; int() truncates fractional counts") {
    assert(parse("1.5 2.9 30 12.5 5 6 99").head ==
      ((1.5, 2, 30.0, 12.5, 5, 6, 0)))
  }

  test("q338 fixture exercises every arity and doc 219 the zero-duration arm") {
    val rows = SparkEntry.queries("q338_nl_trip_parse")(spark, sf001)
      .collect()
    val byN = rows.groupBy(_.getInt(1)).view.mapValues(_.length).toMap
    assert((0 to 7).forall(byN.contains),
      s"every numeric arity 0..7 must appear, got ${byN.keySet}")
    val d219 = rows.find(_.getLong(0) == 219L).get
    assert(d219.getInt(1) == 3 && d219.getDouble(4) == 0.0 &&
      d219.getDouble(5) == 20.0,
      s"doc 219 must hit the zero-duration fallback: $d219")
  }

  test("q339 capstone: every valid request gets a 2dp fare; invalid rows get NULL") {
    val rows = SparkEntry.queries("q339_serving_capstone")(spark, sf001)
      .collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val valid = r.getBoolean(9)
      if (valid) {
        val fare = r.getDouble(8)
        assert(fare > 0 && java.lang.Double.isFinite(fare))
        // bround lands on the 2dp grid exactly like round(pred, 2)
        assert(math.rint(fare * 100) / 100 == fare)
      } else assert(r.isNullAt(8))
    }
    // the fixture contains both populations
    assert(rows.exists(_.getBoolean(9)) && rows.exists(!_.getBoolean(9)))
  }
}
