package graft.spark

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Scheme-aware directory swap primitives over the Hadoop FileSystem
  * API — correct for local paths AND any URI the active Hadoop conf
  * can open (HDFS, object-store connectors); `java.io.File` handles
  * only the former.
  *
  * Swaps are rename-aside, never delete-then-rename:
  *   target → target.__old ; staging → target ; delete target.__old
  * so the previous data is never gone before the new data is in place.
  * A failure mid-swap leaves either the old target or its `.__old`
  * aside copy on disk for recovery (with rollback attempted), and the
  * reader-visible gap is two metadata renames, not a recursive delete
  * plus a full rename.
  */
object FsOps {

  def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  def deleteDir(spark: SparkSession, path: String): Unit =
    fs(spark, path).delete(new Path(path), true)

  /** Replace `target` (which may not exist yet) with `staging`. */
  def swapInto(spark: SparkSession, staging: String, target: String): Unit = {
    val f = fs(spark, target)
    renameAside(f, new Path(staging), new Path(target))
  }

  /** Replace ONLY the leaf partition directories present under
    * `staging` (`depth` = number of partition columns, so a leaf is
    * e.g. `p1=a/p2=b`), leaving every other partition of `target`
    * physically untouched — the file-level half of a partition-pruned
    * incremental write. */
  def swapPartitions(spark: SparkSession, staging: String, target: String,
      depth: Int): Unit = {
    require(depth > 0, "swapPartitions needs at least one partition column")
    val f = fs(spark, target)
    val stgRoot = f.makeQualified(new Path(staging))
    // A partition leaf is exactly a Hive-style `col=value` directory;
    // selecting on that shape (rather than excluding `_`/`.` prefixes)
    // keeps partition columns with unusual names (`_day=...`) while
    // still skipping `_SUCCESS`, `_temporary`, `.spark-staging-*`.
    def leaves(p: Path, d: Int): Seq[Path] =
      if (d == 0) Seq(p)
      else f.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
        .flatMap(s => leaves(s.getPath, d - 1))
    for (leaf <- leaves(stgRoot, depth)) {
      val rel = leaf.toString.stripPrefix(stgRoot.toString).stripPrefix("/")
      val tgtLeaf = new Path(target, rel)
      f.mkdirs(tgtLeaf.getParent)
      renameAside(f, leaf, tgtLeaf)
    }
    f.delete(stgRoot, true)
  }

  private def renameAside(f: FileSystem, staging: Path, target: Path): Unit = {
    val aside = target.suffix(".__old")
    if (f.exists(aside)) f.delete(aside, true)
    val hadOld = f.exists(target)
    if (hadOld) require(f.rename(target, aside), s"rename-aside failed for $target")
    if (!f.rename(staging, target)) {
      if (hadOld) f.rename(aside, target) // roll back: previous data stays live
      sys.error(s"staging swap failed for $target")
    }
    if (hadOld) f.delete(aside, true)
  }
}
