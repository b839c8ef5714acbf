package graft

import graft.sources.{Bucketing, Tables}

class BucketingSpec extends SparkSpecBase {

  /** The in-memory catalog forgets tables between JVMs but the
    * warehouse directory persists — clear both before writing. */
  private def resetTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = java.nio.file.Paths.get(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
  }

  test("co-located join on same-bucketed tables runs shuffle-free") {
    resetTable("b_lineitem")
    resetTable("b_orders")
    val li = Tables.lineitem(spark, sf001)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val o = Tables.orders(spark, sf001)
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .select("l_orderkey", "o_totalprice")
    Bucketing.writeBucketed(li, "b_lineitem", "l_orderkey", 8)
    Bucketing.writeBucketed(o, "b_orders", "l_orderkey", 8)

    val bucketed = Bucketing.coLocatedJoin(spark, "b_lineitem", "b_orders", "l_orderkey")
    val plain = li.hint("merge").join(o, "l_orderkey") // unbucketed sort-merge

    assert(bucketed.count() === plain.count())
    assert(Bucketing.isShuffleFree(bucketed),
      s"expected no exchange:\n${bucketed.queryExecution.executedPlan}")
    assert(!Bucketing.isShuffleFree(plain)) // sanity: plain join shuffles
  }

  test("signature-index re-run path: near-dup pairs with zero exchange, q48 parity") {
    import org.apache.spark.sql.functions._
    resetTable("b_sig_index")
    graft.operators.Similarity.writeSignatureIndex(spark, sf001, "b_sig_index")

    val rerun = graft.operators.Similarity
      .nearDupPairsFromIndex(spark, "b_sig_index", 0.3)
    assert(Bucketing.isShuffleFree(rerun),
      s"expected no exchange on the re-run path:\n${rerun.queryExecution.executedPlan}")

    // parity with the from-scratch q48 pipeline (signature recompute +
    // shuffled self-join)
    val scratch = graft.operators.Similarity.qEmbeddingNearDup
      .fn(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val indexed = rerun.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(indexed === scratch)
  }
}
