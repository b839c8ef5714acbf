package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times the headline queries on SPARK_GRAFT_SF_DIR.
  * Each query is run once to warm the JVM/scan caches (JIT, codegen,
  * parquet footer cache), then the whole headline suite is timed five
  * times; the reported figure is the per-query MEDIAN across the five
  * passes — this box shows ±15% ambient variance, so the median (plus
  * the five per-pass totals for spread) is what makes round-over-round
  * deltas signal rather than noise.
  *
  * Output layout matters: the driver keeps only the LAST 2000 chars of
  * stdout, so the long diagnostic blocks are printed FIRST, each as its
  * own JSON line, and the short headline line is printed LAST:
  *   {"metric":"catalog", ...}   one warm-pass wall time per catalog
  *                               query, for cross-round regression diffs
  *   {"metric":"scale", ...}     ScaleBench asymptotics probe over
  *                               synthesized ≥100k-doc / ≥100k-vector
  *                               corpora (bucket distributions, pair
  *                               growth exponent, planted recall)
  *   {"metric":"total_median","value":N,"unit":"sec","queries":{...},
  *    "runs":[...],"spread":N,"sf":...}   — the driver-parsed line
  * SPARK_GRAFT_CATALOG=0 / SPARK_GRAFT_SCALE=0 skip the diagnostic
  * stages for quick local runs; SPARK_GRAFT_PASSES overrides the 5.
  *
  * Round-13 budget discipline (the r12 driver bench timed out, rc 124):
  *  - SPARK_GRAFT_SCALE_DEEP=1 re-enables the expensive operator-
  *    independent A/B baselines (JL brute force, exact-L2 recall
  *    baseline, naive 8M rank window, spill posture probe — ≈505 s);
  *    default runs skip them and docs/BENCH_FULL.json carries their
  *    last recorded values forward (merge on write) so the doc-claims
  *    gate keeps checking every cited key.
  *  - SPARK_GRAFT_BENCH_BUDGET_SEC (default 2400) is a wall-clock
  *    degrade guard: once exceeded, remaining catalog queries and scale
  *    probe blocks are skipped (loudly, with marker keys) and the
  *    parsed headline line still prints — a slow box produces a partial
  *    artifact, never a timeout.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val benchStart = System.nanoTime()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.toInt).getOrElse(32)
    val withCatalog = sys.env.getOrElse("SPARK_GRAFT_CATALOG", "1") != "0"
    val withScale = sys.env.getOrElse("SPARK_GRAFT_SCALE", "1") != "0"
    // deep tier: the expensive always-on A/B baselines (JL brute force,
    // exact-L2 re-rank baseline, naive rank window, spill posture probe —
    // ≈505 s of the r12 scale stage) re-measure OPERATOR-INDEPENDENT
    // physics and only need re-running when their operator changes; the
    // r12 driver bench timed out (rc 124) carrying them every round.
    // Their last recorded values are carried forward into the merged
    // docs/BENCH_FULL.json below so doc claims stay gated.
    val deep = sys.env.getOrElse("SPARK_GRAFT_SCALE_DEEP", "0") != "0"
    // wall-clock degrade guard: a slow box (the driver also benches at a
    // LOWER core count) must produce a partial artifact + parsed headline,
    // never rc 124. Checked between catalog queries and between scale
    // probe blocks; the headline passes run FIRST so they always finish.
    val budgetSec = sys.env.get("SPARK_GRAFT_BENCH_BUDGET_SEC")
      .map(_.toLong).getOrElse(2400L)
    val deadline = benchStart + budgetSec * 1000000000L
    val spark = graft.spark.Sessions.local("graft-bench", cpus)

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def jsonObj(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

    val passes = sys.env.get("SPARK_GRAFT_PASSES").map(_.toInt).getOrElse(5)
    val qs = SparkEntry.headlines
    qs.foreach(q => try q.fn(spark, sfDir).count() catch { case _: Throwable => }) // warm-up
    // `passes` timed suite passes; per-query MEDIAN is the reported value
    val samples: Seq[Seq[(String, Double)]] = (1 to passes).map { _ =>
      qs.map { q =>
        val sec = try time(q.fn(spark, sfDir).count())
        catch { case _: Throwable => -1.0 }
        q.name -> sec
      }
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n == 0) -1.0 else if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val results = qs.map { q =>
      val ts = samples.map(_.toMap.apply(q.name)).filter(_ >= 0)
      q.name -> median(ts)
    }
    val runTotals = samples.map(_.map(_._2).filter(_ >= 0).sum)
    val total = median(runTotals)
    val spread = if (runTotals.isEmpty) 0.0 else runTotals.max - runTotals.min

    // Long diagnostic blocks FIRST (each its own line) — the driver's
    // 2000-char tail must land on the short headline line below.

    // full-catalog single warm pass (warm = the run itself for
    // non-headline queries; relative cross-round diffs are what matter).
    // The spark.ml fits are timed FIRST: their driver-side job storms
    // (200 trees x depth levels) are sensitive to accumulated JVM/
    // session state — measured 9 s on a fresh-ish session vs 108 s
    // after ~300 query executions, with the plain SQL queries
    // unaffected. Timing them before the backlog measures the
    // operator, not the harness history.
    var catalogKvs: Seq[(String, Double)] = Nil
    if (withCatalog) {
      // explicit set: every query that triggers a spark.ml iterative fit
      // (q50's KMeans included — a bare "_ml_" name filter missed it)
      val mlFitting = Set("q36_ml_rf_fit", "q50_ivf_topk")
      val (mlQs, restQs) = SparkEntry.catalog.partition(q => mlFitting(q.name))
      var skipped = 0
      val catalog: Seq[(String, Double)] = (mlQs ++ restQs).flatMap { q =>
        if (System.nanoTime() >= deadline) { skipped += 1; None }
        else {
          val sec = try {
            q.fn(spark, sfDir).count() // warm
            time(q.fn(spark, sfDir).count())
          } catch { case e: Throwable =>
            // a failed entry records -1.0; say WHY on stderr (two
            // r12 entries were silently -1 in BENCH_FULL with no
            // trace to debug from)
            System.err.println(s"[bench] catalog ${q.name} failed: " +
              s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}")
            -1.0
          }
          Some(q.name -> sec)
        }
      }
      catalogKvs =
        if (skipped > 0) {
          System.err.println(
            s"[bench] catalog budget exhausted: $skipped queries skipped")
          catalog :+ ("catalog_budget_skipped" -> skipped.toDouble)
        } else catalog
      println(s"""{"metric":"catalog","unit":"sec","queries":${jsonObj(catalog)},"sf":"$sfDir"}""")
    }

    var scaleKvs: Seq[(String, Double)] = Nil
    if (withScale) {
      val scale: Seq[(String, Double)] =
        try ScaleBench.run(spark, sfDir, deep = deep, deadlineNanos = deadline)
        catch { case e: Throwable =>
          System.err.println(s"[bench] scale stage failed: ${e.getMessage}")
          Seq("scale_failed" -> 1.0)
        }
      scaleKvs = scale
      println(s"""{"metric":"scale","values":${jsonObj(scale)},"sf":"$sfDir"}""")
    }

    // Locale.ROOT: the f-interpolator uses the default locale, and a
    // decimal-comma locale would corrupt the driver-parsed JSON
    val runsStr = runTotals
      .map(t => String.format(java.util.Locale.ROOT, "%.3f", Double.box(t)))
      .mkString("[", ",", "]")
    // total_min = the min-of-passes statistic rounds 1-4 reported, for
    // cross-round continuity; total_median is the headline going forward
    val totalMin = if (runTotals.isEmpty) -1.0 else runTotals.min
    // canary: q01 is code-untouched since round 1, so its median is a
    // pure box-speed probe; total/canary is the box-normalized headline
    // (this machine's ambient speed swings 30-60% round-to-round, and
    // raw deltas kept reading as phantom regressions)
    val canary = results.toMap.getOrElse("q01_pricing_summary", -1.0)
    val totalPerCanary = if (canary > 0) total / canary else -1.0
    // the 12-query headline is FROZEN as of r12 (VERDICT r12 #8); the
    // 10-query figure (the rounds-3..11 set, i.e. minus the two r12
    // additions) is reported alongside for cross-round continuity
    val addedInR12 = Set("q328_planned_batch_serve", "q337_simhash_neardup_values")
    val runTotals10 =
      samples.map(_.collect { case (n, s) if s >= 0 && !addedInR12(n) => s }.sum)
    val total10 = median(runTotals10)
    val total10PerCanary = if (canary > 0) total10 / canary else -1.0
    val headlineLine =
      s"""{"metric":"total_median","value":$total,"unit":"sec","total_min":$totalMin,"canary":$canary,"total_median_per_canary":$totalPerCanary,"total_median_10q":$total10,"total_median_10q_per_canary":$total10PerCanary,"queries":${jsonObj(results)},"runs":$runsStr,"spread":$spread,"sf":"$sfDir"}"""
    // persist the COMPLETE key/value map to a file: the driver records
    // only the last 2000 chars of stdout, so which stdout keys survive
    // depends on probe emission order — the file is the durable,
    // truncation-free artifact that README/SCALE numeric claims cite
    // (and that scripts/check_doc_claims.py gates against). ONLY a
    // full, successful run may write it: a headline-only smoke
    // (SPARK_GRAFT_SCALE=0) or a failed scale stage must not replace
    // the citable artifact with an empty/failed key map.
    val scaleOk = withScale && !scaleKvs.exists(_._1 == "scale_failed")
    val benchOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "docs/BENCH_FULL.json")
    if (scaleOk) try {
      val p = java.nio.file.Paths.get(benchOut)
      // merge: scale keys NOT produced this run (deep-tier probes on a
      // default run, or blocks skipped by the wall-clock guard) keep
      // their last recorded value, so scripts/check_doc_claims.py keeps
      // gating every cited key. Keys produced this run always win.
      val prevScale: Seq[(String, Double)] =
        if (java.nio.file.Files.exists(p)) try {
          val s = new String(java.nio.file.Files.readAllBytes(p),
            java.nio.charset.StandardCharsets.UTF_8)
          """"scale":\{([^}]*)\}""".r.findFirstMatchIn(s).toSeq.flatMap(m =>
            """"([^"]+)":(-?[0-9][0-9.eE+-]*)""".r.findAllMatchIn(m.group(1))
              .map(g => g.group(1) -> g.group(2).toDouble).toSeq)
        } catch { case _: Throwable => Nil }
        else Nil
      val freshKeys = scaleKvs.map(_._1).toSet
      val carried = prevScale
        .filterNot(kv => freshKeys(kv._1) || kv._1 == "scale_carried_keys")
      val mergedScale =
        if (carried.isEmpty) scaleKvs
        else scaleKvs ++ carried :+ ("scale_carried_keys" -> carried.size.toDouble)
      val full =
        s"""{"catalog":${jsonObj(catalogKvs)},"scale":${jsonObj(mergedScale)},"headline":$headlineLine}"""
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.write(p,
        full.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[bench] full key map written to $benchOut")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $benchOut: ${e.getMessage}")
    } else System.err.println(
      s"[bench] $benchOut NOT written (scale stage skipped or failed)")
    // the driver-parsed headline line stays LAST on stdout
    println(headlineLine)
    spark.stop()
  }
}
