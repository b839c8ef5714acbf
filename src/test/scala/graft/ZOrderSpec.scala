package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._

/** q169: Morton interleave correctness and the measured layout claim
  * (Z-sorted parquet prunes on the NON-prefix dimension too). */
class ZOrderSpec extends SparkSpecBase {
  import spark.implicits._

  test("column morton matches the bit-by-bit reference across the grid") {
    val probes = Seq(
      (0, 0), (1, 0), (0, 1), (65535, 65535), (4660, 43981),
      (255, 256), (32768, 1), (12345, 54321))
    val viaExpr = probes.toDF("x", "y")
      .select(ZOrder.morton(col("x").cast("long"), col("y").cast("long")))
      .collect().map(_.getLong(0))
    probes.zip(viaExpr).foreach { case ((x, y), got) =>
      assert(got === ZOrder.mortonRef(x, y), s"morton($x, $y)")
    }
  }

  test("morton is a bijection onto 32 bits (roundtrip decode)") {
    def decode(m: Long): (Int, Int) = {
      var x = 0; var y = 0
      for (i <- 0 until 16) {
        x |= (((m >> (2 * i)) & 1L) << i).toInt
        y |= (((m >> (2 * i + 1)) & 1L) << i).toInt
      }
      (x, y)
    }
    for (x <- Seq(0, 1, 255, 4660, 65535); y <- Seq(0, 1, 256, 43981, 65535))
      assert(decode(ZOrder.mortonRef(x, y)) === ((x, y)))
  }

  test("z-sorted layout prunes the non-prefix dimension; time-sorted cannot") {
    val metrics = ScaleBench.zorderProbe(spark, sf001, 200000, 64).toMap
    // user-range query: the time-sorted layout has NO correlation to
    // prune on — it scans everything; the Morton layout reads only
    // the tile-column intersecting the user stripe
    val full = metrics("zorder_userbox_scan_rows_timesorted")
    val pruned = metrics("zorder_userbox_scan_rows_zsorted")
    assert(full === 200000.0, s"time-sorted layout unexpectedly pruned: $full")
    assert(pruned * 4 < full,
      s"z-layout should scan <1/4 of rows on the user box, scanned $pruned")
    // time-range query: BOTH layouts prune (z gives up some of the
    // 1-d layout's perfection but stays far from a full scan)
    assert(metrics("zorder_timebox_scan_rows_zsorted") * 2 < full,
      "z-layout must still prune the time box")
    // 2-d box: at least as tight as the user box on the z layout
    assert(metrics("zorder_box2d_scan_rows_zsorted") <=
      metrics("zorder_userbox_scan_rows_zsorted"))
  }

  test("q171: maintenance rewrites only touched tiles; elsewhere byte-identical") {
    import graft.operators.ZOrder
    val coded = ZOrder.eventCells(graft.sources.Tables.events(spark, sf001))
    val corpus = coded.where(pmod(col("event_id"), lit(5L)) =!= 4L)
    val batch = coded.where(pmod(col("event_id"), lit(5L)) === 4L)
    val incPath = graft.operators.Formats.scratchDir("graft_zorder_inc", "spec")
    ZOrder.writeLayout(corpus, incPath)

    def fileHashes(p: String): Map[String, String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.startsWith("part-")) Seq(f) else Nil
      walk(new java.io.File(p)).map { f =>
        val bytes = java.nio.file.Files.readAllBytes(f.toPath)
        val rel = f.getAbsolutePath.stripPrefix(p)
        rel -> java.security.MessageDigest.getInstance("MD5").digest(bytes)
          .map("%02x".format(_)).mkString
      }.toMap
    }
    val before = fileHashes(incPath)
    assert(before.nonEmpty)

    val manifest = SparkEntry.queries("q171_zorder_maintenance")(spark, sf001).collect()
    val rewriteCells = manifest.filter(_.getString(4) == "rewrite")
      .map(_.getLong(0)).toSet
    val keepCells = manifest.filter(_.getString(4) == "keep")
      .map(_.getLong(0)).toSet
    assert(rewriteCells.nonEmpty && keepCells.nonEmpty,
      "sf0.001 must exercise both actions")

    val touched = ZOrder.incrementalMaintain(spark, incPath, batch)
    assert(touched === rewriteCells.size.toLong)

    val after = fileHashes(incPath)
    def cellOf(rel: String): Long =
      "cell=(\\d+)".r.findFirstMatchIn(rel).get.group(1).toLong
    // tiles the manifest marked keep: same files, same BYTES
    val beforeKeep = before.filter(kv => keepCells(cellOf(kv._1)))
    val afterKeep = after.filter(kv => keepCells(cellOf(kv._1)))
    assert(beforeKeep === afterKeep, "an untouched tile's files changed")
    // every rewrite tile got fresh files
    rewriteCells.foreach { c =>
      val beforeFiles = before.keySet.filter(cellOf(_) == c)
      val afterFiles = after.keySet.filter(cellOf(_) == c)
      assert(afterFiles.nonEmpty, s"rewritten tile $c vanished")
      assert(beforeFiles.intersect(afterFiles).forall(f => before(f) != after(f)) ||
        beforeFiles.intersect(afterFiles).isEmpty,
        s"tile $c kept stale files")
    }
    // read-back ≡ full rebuild of corpus+batch, row for row
    val schema = "event_id BIGINT, user_id BIGINT, ub BIGINT, tb BIGINT, " +
      "morton BIGINT, cell BIGINT"
    val readBack = spark.read.schema(schema).parquet(incPath)
      .select("event_id", "morton", "cell")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    val expected = coded.select("event_id", "morton", "cell")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(readBack === expected)
  }
}
