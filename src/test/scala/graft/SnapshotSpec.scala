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
}
