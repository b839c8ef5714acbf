package graft.spark

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Centralizes the configs that matter for both local testing
  * (local[32], 128 GiB single JVM) and the 100 TB design target:
  *   - AQE on (runtime shuffle-partition coalescing, skew-join splitting)
  *   - UTC session time zone (oracle parity with DuckDB)
  *   - shuffle partitions sized to the local core count; on a real
  *     cluster this is overridden per-deploy (AQE coalesces anyway)
  */
object Sessions {
  def local(appName: String = "graft", cores: Int = defaultCores): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // iterative operators (connected components, BPE) can build
      // deeply-nested plans; an uncapped explain/event-log rendering
      // of such a plan OOMs the driver before the query itself would.
      // 1 MB is plenty for any legitimate diagnostic read.
      .config("spark.sql.maxPlanStringLength", (1 << 20).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def defaultCores: Int =
    sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(4)
}
