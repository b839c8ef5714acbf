package graft

import graft.model.Snapshot
import org.apache.spark.sql.functions._

class SnapshotSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = lit(s).cast("timestamp")

  test("SCD2: changed rows close + reopen, new keys append, unchanged untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap").toString + "/snap"
    // day 1
    val d1 = Seq((1, "alice", "NYC"), (2, "bob", "LA")).toDF("id", "name", "city")
    val s1 = Snapshot.run(spark, d1, dir, "id", ts("2026-01-01 00:00:00"))
    assert(s1.count() === 2)
    assert(s1.where(col("valid_to").isNull).count() === 2)

    // day 2: bob moves, carol appears, alice unchanged
    val d2 = Seq((1, "alice", "NYC"), (2, "bob", "SF"), (3, "carol", "CHI"))
      .toDF("id", "name", "city")
    val s2 = Snapshot.run(spark, d2, dir, "id", ts("2026-01-02 00:00:00"))

    assert(s2.count() === 4) // alice open, bob closed + bob open, carol open
    val open = s2.where(col("valid_to").isNull)
      .collect().map(r => (r.getInt(0), r.getString(2))).toSet
    assert(open === Set((1, "NYC"), (2, "SF"), (3, "CHI")))
    val closed = s2.where(col("valid_to").isNotNull).collect()
    assert(closed.length === 1)
    assert(closed(0).getInt(0) === 2 && closed(0).getString(2) === "LA")
    assert(closed(0).getAs[java.sql.Timestamp]("valid_to").toString.startsWith("2026-01-02"))
    // alice's open row still carries day-1 valid_from (untouched)
    val alice = s2.where(col("id") === 1).head()
    assert(alice.getAs[java.sql.Timestamp]("valid_from").toString.startsWith("2026-01-01"))
  }

  test("change hash distinguishes shifted field boundaries and null vs empty") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap3").toString + "/snap"
    Snapshot.run(spark, Seq((1, "ab", "c"), (2, null.asInstanceOf[String], "z"))
      .toDF("id", "a", "b"), dir, "id", ts("2026-01-01 00:00:00"))
    // ("ab","c") -> ("a","bc") and null -> "" are REAL changes, not hash collisions
    val s2 = Snapshot.run(spark, Seq((1, "a", "bc"), (2, "", "z"))
      .toDF("id", "a", "b"), dir, "id", ts("2026-01-02 00:00:00"))
    assert(s2.where(col("valid_to").isNotNull).count() === 2)
    assert(s2.where(col("valid_to").isNull).count() === 2)
  }

  test("SCD2 run is idempotent for an unchanged source") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap2").toString + "/snap"
    val d = Seq((1, "x")).toDF("id", "v")
    Snapshot.run(spark, d, dir, "id", ts("2026-01-01 00:00:00"))
    val again = Snapshot.run(spark, d, dir, "id", ts("2026-01-05 00:00:00"))
    assert(again.count() === 1)
    assert(again.head().getAs[java.sql.Timestamp]("valid_from").toString.startsWith("2026-01-01"))
  }

  test("q190: point-in-time lookup honors validity intervals exactly") {
    val rows = SparkEntry.queries("q190_pit_lookup")(spark, sf001).collect()
    assert(rows.nonEmpty)
    val snap = SparkEntry.queries("q88_scd2_snapshot")(spark, sf001).collect()
    val byProbe = rows.groupBy(_.getTimestamp(1).toString.take(10))
    // pre-history probe: nothing existed
    assert(!byProbe.contains("2025-12-31"), "a version predates history")
    // at most one version per (user, probe) — intervals never overlap
    rows.groupBy(r => (r.getLong(0), r.getTimestamp(1))).foreach { case (k, vs) =>
      assert(vs.length === 1, s"overlapping versions at $k")
    }
    // mid probe sees exactly the T1-opened rows; post probe sees every
    // user's single CURRENT row (valid_to null)
    val t1Users = snap.filter(_.getTimestamp(3).toString.startsWith("2026-01-01"))
      .map(_.getLong(0)).toSet
    assert(byProbe("2026-01-01").map(_.getLong(0)).toSet === t1Users)
    val currentUsers = snap.filter(_.isNullAt(4)).map(_.getLong(0)).toSet
    assert(byProbe("2026-01-03").map(_.getLong(0)).toSet === currentUsers)
  }

  test("q202: snapshot diff classes partition the delta exactly") {
    val ids = graft.sources.Tables.documents(spark, sf001)
      .select("doc_id").collect().map(_.getLong(0))
    val out = SparkEntry.queries("q202_snapshot_diff")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.isNullAt(2), r.isNullAt(3)))
    val byKind = out.groupBy(_._2)
    // the derivation rule fixes every class cardinality
    assert(byKind("removed").length === ids.count(_ % 13 == 5))
    assert(byKind("changed").length === ids.count(_ % 13 == 3))
    assert(byKind("added").length === ids.count(_ % 13 == 7))
    // null pattern per class: removed has no v2, added no v1, changed both
    assert(byKind("removed").forall(r => !r._3 && r._4))
    assert(byKind("added").forall(r => r._3 && !r._4))
    assert(byKind("changed").forall(r => !r._3 && !r._4))
    // added rows live in the new-id space, disjoint from v1
    val idSet = ids.toSet
    assert(byKind("added").forall(r => !idSet.contains(r._1)))
  }
}
