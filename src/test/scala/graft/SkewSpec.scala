package graft

import graft.operators.Skew
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted aggregate equals the direct group-by exactly") {
    val direct = Tables.events(spark, sf001)
      .groupBy("event_type")
      .agg(sum(col("value").cast("decimal(14,2)")).as("total"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
    val salted = Skew.saltedAggregate(Tables.events(spark, sf001),
        col("event_type"), col("value").cast("decimal(14,2)"), salts = 8)
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2))).toSet
    assert(salted === direct)
  }

  /** AQE's skew-join path exercised FOR REAL (docs/SCALE.md claims it;
    * this proves it): a planted hot key makes one shuffle partition
    * ~50x the median; with test-sized thresholds OptimizeSkewedJoin
    * must split it — the executed sort-merge join reports skew=true —
    * and the split must not change the result. */
  test("AQE splits the planted hot key's partition (skew=true) with identical results") {
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "128k",
      "spark.sql.shuffle.partitions" -> "8")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // ~83% of 120k rows land on key 0 with an ~90-byte payload: the
      // hot partition is ~9 MB vs a ~40 KB median
      val left = spark.range(120000).select(
        when(col("id") % 6 =!= 0, lit(0L)).otherwise(col("id") % 97).as("k"),
        concat(lit("x" * 80), col("id").cast("string")).as("payload"))
      val right = spark.range(97).select(col("id").as("k"), (col("id") * 7).as("dim"))

      // the consumer after the join must not REQUIRE the join key's
      // hash partitioning (a groupBy(k) would — AQE then reverts the
      // split to keep the guarantee). A global aggregate's partial
      // phase accepts any distribution, so the split is legal; the
      // hash-sum is an order-insensitive row checksum.
      def joined = left.join(right, "k").agg(
        count(lit(1)).as("n"), sum(col("dim")).as("dim_sum"),
        sum(hash(col("k"), col("payload"), col("dim")).cast("long")).as("chk"))
      val skewRun = joined
      val got = skewRun.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val finalPlan = skewRun.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected a skew-split sort-merge join in:\n$finalPlan")

      // identical result with the skew path off
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      val plain = joined
      val want = plain.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(!plain.queryExecution.executedPlan.toString.contains("skew=true"))
      assert(got === want)
    } finally {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("salted join equals the plain join (every row matched exactly once)") {
    val big = Seq.tabulate(1000)(i => (i % 3, i.toLong)).toDF("k", "payload")
    val small = Seq((0, "zero"), (1, "one"), (2, "two"), (9, "unmatched")).toDF("k", "label")
    val plain = big.join(small, Seq("k"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val salted = Skew.saltedJoin(big, small, "k", salts = 8)
      .select("k", "payload", "label")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(salted === plain)
    assert(salted.length === 1000) // 3 hot keys fully matched, nothing duplicated
  }

  test("q170: skew report arithmetic is the exact cross-multiplied form") {
    val rows = SparkEntry.queries("q170_skew_report")(spark, sf001).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    // ppm shares floor-sum to ≤ 1e6 and each row's derived columns
    // recompute from (cnt, total) alone
    assert(rows.map(_.getLong(2)).sum <= 1000000L)
    rows.foreach { r =>
      val cnt = r.getLong(1)
      assert(r.getLong(2) === cnt * 1000000L / total)
      val expectSalt = ((cnt * Skew.skewParts + total - 1) / total).toInt
      assert(r.getInt(3) === expectSalt)
      assert(r.getBoolean(4) === (cnt * Skew.skewParts > Skew.skewFactor * total))
      // a salted key's per-reducer load returns to ≤ the average
      // partition load: cnt/salt ≤ total/parts (cross-multiplied)
      assert(cnt * Skew.skewParts <= expectSalt.toLong * total,
        s"salt factor $expectSalt under-sized for cnt $cnt")
    }
  }
}
