package graft

/** Driver-contract smoke: entry rows > 0, every oracle key has a query,
  * every query runs non-empty-schema at sf0.001. */
class SparkEntrySpec extends SparkSpecBase {

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("headlines are oracle-backed") {
    assert(SparkEntry.headlines.nonEmpty)
    assert(SparkEntry.headlines.forall(_.oracle.nonEmpty))
  }

  test("query names are unique") {
    assert(SparkEntry.catalog.map(_.name).distinct.size === SparkEntry.catalog.size)
  }

  test("query numbering is well-formed and collision-free") {
    val nums = SparkEntry.catalog.map { q =>
      val m = "^q(\\d+)_[a-z0-9_]+$".r.findFirstMatchIn(q.name)
      assert(m.isDefined, s"bad query name: ${q.name}")
      m.get.group(1).toInt
    }
    assert(nums.distinct.size === nums.size, "duplicate query numbers")
  }

  test("every oracle references only known testdata tables") {
    val known = graft.sources.Tables.all.toSet
    // negative lookbehind excludes IS [NOT] DISTINCT FROM comparisons
    // \b keeps identifiers like tf_join from matching the JOIN keyword
    val tableRef = "(?i)\\b(?:(?<!distinct )FROM|(?<![a-z0-9_])JOIN)\\s+([a-z_][a-z0-9_]*)".r
    val cteOrAlias = Set("unnest", "range", "generate_series")
    SparkEntry.catalog.flatMap(q => q.oracle.map(q.name -> _)).foreach {
      case (name, rawSql) =>
        val sql = rawSql.linesIterator // strip -- comments before scanning
          .map(l => l.indexOf("--") match { case -1 => l; case i => l.take(i) })
          .mkString("\n")
        // CTE names defined in this SQL are legal reference targets
        // optional (cols) list covers recursive CTE headers like reach(n, m);
        // optional MATERIALIZED covers DuckDB's inlining barrier (q142-q144)
        val ctes = "(?i)([a-z_][a-z0-9_]*)\\s*(?:\\([^)]*\\))?\\s+AS\\s*(?:MATERIALIZED\\s*)?\\(".r
          .findAllMatchIn(sql).map(_.group(1)).toSet
        tableRef.findAllMatchIn(sql).map(_.group(1)).foreach { t =>
          assert(known(t) || ctes(t) || cteOrAlias(t),
            s"$name references unknown relation '$t'")
        }
    }
  }
}
