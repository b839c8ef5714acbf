package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Memory-pressure posture probe — run in its OWN constrained JVM (a
  * small -Xmx plus a squeezed spark.memory.fraction, which is a
  * context-creation-time conf and so can't be toggled inside the main
  * bench session). The 100 TB claim everywhere else in the repo is
  * "spill, never OOM"; this is the measurement: the full headline
  * suite plus the MinHash verify join over a synthetic corpus are
  * driven to completion under execution-memory starvation, and the
  * stage-level spill counters must come back POSITIVE — proof the
  * operators degrade to disk instead of dying.
  *
  * Launched by ScaleBench via ProcessBuilder (same classpath, the
  * JDK-17 add-opens Spark needs, SPARK_GRAFT_SPILL_MEM heap). Prints
  * exactly one `SPILL {...}` JSON line; exit 0 means everything
  * completed.
  */
object SpillProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val targetDocs = if (args.length > 1) args(1).toInt else 300000
    val t0 = System.nanoTime()
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-spillprobe")
      // the squeeze: unified memory = 6% of a small heap, so the
      // shuffle hash/sort buffers and window sorters MUST spill
      // the squeeze is calibrated, not maximal: broadcast variables
      // (the engine's deliberate bounded dims/aggregates, built with
      // explicit hints) allocate LONG-TERM storage memory and fail
      // hard — not spill — when the unified pool can't hold even a
      // few MB (measured at fraction 0.04–0.06). 0.25 of a small heap
      // keeps those legitimate bounded builds alive while the
      // DATA-PROPORTIONAL consumers (shuffle sorts, aggregation maps)
      // still starve and spill. AQE's own broadcast demotion is
      // capped so it cannot promote a mid-size join into the
      // constrained pool.
      .config("spark.memory.fraction", "0.12")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxPlanStringLength", (1 << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mem = new java.util.concurrent.atomic.AtomicLong
    val disk = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        mem.addAndGet(s.stageInfo.taskMetrics.memoryBytesSpilled)
        disk.addAndGet(s.stageInfo.taskMetrics.diskBytesSpilled)
        ()
      }
    })

    // the full headline suite, once, to completion
    var headlineRows = 0L
    SparkEntry.headlines.foreach { q =>
      headlineRows += q.fn(spark, sfDir).count()
    }

    // the dedup verify join at targetDocs synthetic documents — the
    // widest shuffle in the engine (shingle sets ride the exchange)
    val docs = graft.ScaleBench.synthDocs(spark, sfDir, targetDocs)._1
    val bands = graft.operators.Dedup.docBands(
      docs, graft.operators.MinHashScheme.default)
    val pairs = graft.operators.Dedup.candidatePairsFromBands(bands)
    val verified = graft.operators.Dedup
      .withJaccardToks(pairs, graft.operators.Dedup.shingleSets(docs))
      .where(col("jaccard") >= 0.9)
      .count()

    val wall = (System.nanoTime() - t0) / 1e9
    println(s"""SPILL {"spill_mem_mb":${mem.get() / 1048576},""" +
      s""""spill_disk_mb":${disk.get() / 1048576},""" +
      s""""headline_rows":$headlineRows,"verified_pairs":$verified,""" +
      s""""wall_sec":${math.round(wall * 10) / 10.0}}""")
    spark.stop()
  }
}
