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
}
