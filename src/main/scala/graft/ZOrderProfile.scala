package graft

import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of q173's pipeline (base layout
  * write, stream maintain, census read) — the r13 breakdown behind the
  * incremental-maintain optimization. */
object ZOrderProfile {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(16)
    val spark = graft.spark.Sessions.local("zorderprofile", cpus)
    import graft.operators.ZOrder
    def t(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"ZPROF $tag%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    val basePath = graft.operators.Formats.scratchDir("graft_zprof", d)
    graft.operators.Formats.wipe(basePath)
    val corpus = ZOrder.eventCells(graft.sources.Tables.events(spark, d))
      .where(pmod(col("event_id"), lit(5L)) =!= 4L)
    val batch = ZOrder.eventCells(graft.sources.Tables.events(spark, d))
      .where(pmod(col("event_id"), lit(5L)) === 4L)
    t("corpus_count")(corpus.count())
    t("write_layout")(ZOrder.writeLayout(corpus, basePath))
    t("maintain")(ZOrder.incrementalMaintain(spark, basePath, batch))
    val schema = "event_id BIGINT, user_id BIGINT, ub BIGINT, tb BIGINT, " +
      "morton BIGINT, cell BIGINT"
    t("census_read") {
      spark.read.schema(schema).parquet(basePath)
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_events"), min("user_id").as("min_user"))
        .orderBy("cell").count()
    }
    // second maintain on a small batch slice: the locality-footprint
    // claim — how much does maintaining 1/50 of the data cost?
    val small = batch.where(pmod(col("event_id"), lit(50L)) === 4L)
    t("maintain_small")(ZOrder.incrementalMaintain(spark, basePath, small))

    // write-cost anatomy: same rows, one dir (no partitionBy) vs the
    // 1020-dir partitioned write vs partitioned with committer v2
    val flat = graft.operators.Formats.scratchDir("graft_zprof_flat", d)
    t("write_flat") {
      corpus.repartition(col("cell")).sortWithinPartitions("cell", "morton")
        .write.mode("overwrite").parquet(flat)
    }
    val v2 = graft.operators.Formats.scratchDir("graft_zprof_v2", d)
    t("write_part_v2") {
      corpus.repartition(col("cell")).sortWithinPartitions("cell", "morton")
        .write.option("mapreduce.fileoutputcommitter.algorithm.version", "2")
        .partitionBy("cell").mode("overwrite").parquet(v2)
    }
    // more write tasks: if the cost is per-task SEQUENTIAL parquet
    // writer inits (one per cell dir), spreading cells over 256 tasks
    // should collapse the wall time
    val p256 = graft.operators.Formats.scratchDir("graft_zprof_p256", d)
    t("write_part_256") {
      corpus.repartition(256, col("cell")).sortWithinPartitions("cell", "morton")
        .write.partitionBy("cell").mode("overwrite").parquet(p256)
    }
    // AQE off for the repartition (AQE coalesces the 256 back down)
    val p256b = graft.operators.Formats.scratchDir("graft_zprof_p256b", d)
    t("write_part_256_noaqe") {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try corpus.repartition(256, col("cell")).sortWithinPartitions("cell", "morton")
        .write.partitionBy("cell").mode("overwrite").parquet(p256b)
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
    Seq(flat, v2, p256, p256b).foreach(graft.operators.Formats.wipe)
    spark.stop()
  }
}
