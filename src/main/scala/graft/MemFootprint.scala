package graft

/** Dev tool: build the session's long-lived memoized indexes (by
  * invoking the queries that create them) and report every persisted
  * RDD's memory/disk footprint — the measurement behind the catalog
  * interference fix (r13): mid-catalog queries ran 5–25x slower than
  * isolated because accumulated index caches pressured the unified
  * pool. Args: query names (comma list) to warm; default = a spread
  * of the index-building queries. */
object MemFootprint {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(16)
    val spark = graft.spark.Sessions.local("memfootprint", cpus)
    val names =
      if (args.nonEmpty) args(0).split(",").toSeq
      else Seq(
        "q27_dedup_minhash_buckets", "q28_dedup_minhash_pairs",
        "q94_dedup_batch_vs_corpus", "q218_kmv_source_overlap",
        "q48_embedding_neardup", "q85_quantize_int8",
        "q101_image_decode", "q107_image_resize",
        "q334_image_neardup_values", "q335_audio_neardup_values",
        "q143_neural_ann_topk", "q144_semdedup_prune",
        "q328_planned_batch_serve", "q337_simhash_neardup_values",
        "q120_bpe_merge_table", "q125_bpe_encode",
        "q77_dedup_components", "q216_apss_exact_pairs")
    names.foreach { n =>
      val t0 = System.nanoTime()
      try { SparkEntry.queries(n)(spark, d).count(); () }
      catch { case e: Throwable =>
        println(s"WARMFAIL $n ${e.getMessage.take(60)}")
      }
      println(f"WARMED $n%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    val infos = spark.sparkContext.getRDDStorageInfo
    val totMem = infos.map(_.memSize).sum / 1e6
    val totDisk = infos.map(_.diskSize).sum / 1e6
    println(f"STORAGE total: mem ${totMem}%.0f MB  disk ${totDisk}%.0f MB  rdds ${infos.length}")
    infos.sortBy(-_.memSize).take(40).foreach { i =>
      println(f"STORAGE ${i.memSize / 1e6}%9.1f MB mem ${i.diskSize / 1e6}%9.1f MB disk  " +
        f"lvl=${i.storageLevel.description}%-30s ${i.name.take(90)}")
    }
    spark.stop()
  }
}
