package graft

/** Dev tool: emit the catalog as TSV (name, oracle?, headline?) for
  * scripts/gen_catalog_md.py, which joins in source locations and
  * writes docs/CATALOG.md. */
object CatalogDump {
  def main(args: Array[String]): Unit = {
    SparkEntry.catalog.foreach { q =>
      println(s"${q.name}\t${if (q.oracle.nonEmpty) "oracle" else "rows-only"}\t${if (q.headline) "headline" else ""}")
    }
  }
}
