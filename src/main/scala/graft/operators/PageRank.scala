package graft.operators

import graft.GraftQuery
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over the Jaccard-verified near-dup graph
  * ([[Dedup.verifiedPairs]], symmetric) — the centrality complement to
  * q219's k-core and q220's BFS depth: a high-rank document is the hub
  * many mirrors copy from (keep it, drop its satellites), independent
  * of whether the neighborhood is dense enough to form a core.
  *
  * Determinism (the repo's cross-engine discipline): ranks are BIGINT
  * micro-units (S = 10^12 per node at init), every step is integer
  * arithmetic — share = r div deg (floor; all values non-negative so
  * Spark's truncating `div` and DuckDB's floor `//` agree), then
  * r' = 0.15*S + (85 * sum(shares)) div 100. No floating point
  * anywhere, so the result is bit-identical regardless of engine,
  * partitioning, or summation order. Fixed ROUNDS iterations, unrolled
  * in the oracle as a CTE chain (the q180/q219 convention).
  *
  * Scale (100 TB):
  *  - Each round is ONE hash aggregate over the edge relation (group
  *    by destination) plus a node-keyed left join — the standard
  *    synchronous-PageRank shape; nothing is quadratic and no state
  *    ever leaves the cluster.
  *  - The rank state is node-keyed and co-partitioned with the degree
  *    relation (carried inside the same row), so the per-round join
  *    is rank-state x edges only.
  *  - Per-round lineage is localCheckpoint-truncated with deterministic
  *    block release (the q133 discipline) — plan depth stays O(1) in
  *    rounds, not O(rounds).
  *  - The symmetric near-dup graph has no dangling nodes (every node
  *    has deg >= 1 by construction), so no dangling-mass redistribution
  *    term is needed; a general web-graph deployment would add the
  *    standard dangling-sum broadcast.
  */
object PageRank {

  /** Fixed synchronous rounds; the oracle unrolls exactly this many. */
  val rounds = 5

  /** Initial rank per node, in micro-units (10^12). */
  val initR = 1000000000000L

  private val teleport = initR * 15 / 100

  private def sym(pairs: DataFrame): DataFrame =
    pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .unionByName(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))

  /** One unrolled oracle round: shares = prev rank div degree, summed
    * per destination; damped integer update. DuckDB SUM(BIGINT) is
    * HUGEINT, so the final cast pins BIGINT. */
  private def roundSql(prev: String, cur: String): String =
    s"""$cur AS MATERIALIZED (
       |  SELECT d.node,
       |    CAST($teleport + (85 * COALESCE(s.contrib, 0)) // 100 AS BIGINT) AS r
       |  FROM deg d
       |  LEFT JOIN (
       |    SELECT e.v AS node, SUM(p.r // dd.deg) AS contrib
       |    FROM e0 e
       |    JOIN $prev p ON p.node = e.u
       |    JOIN deg dd ON dd.node = e.u
       |    GROUP BY e.v) s ON s.node = d.node)""".stripMargin

  private def chainSql: String =
    (1 to rounds).map(i => roundSql(if (i == 1) "pr0" else s"pr${i - 1}", s"pr$i"))
      .mkString(",\n")

  /** q248: per-document PageRank after [[rounds]] integer rounds, with
    * degree alongside. */
  val qPageRank: GraftQuery = GraftQuery(
    "q248_pagerank",
    s"""WITH ${Dedup.pairsCte},
       |e0 AS MATERIALIZED (
       |  SELECT doc_a AS u, doc_b AS v FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs),
       |deg AS (SELECT u AS node, COUNT(*) AS deg FROM e0 GROUP BY u),
       |pr0 AS (SELECT node, CAST($initR AS BIGINT) AS r FROM deg),
       |$chainSql
       |SELECT d.node AS doc_id, CAST(d.deg AS BIGINT) AS deg, p.r AS pagerank
       |FROM deg d JOIN pr$rounds p ON p.node = d.node
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val release = org.apache.spark.sql.graftshim.Checkpoints.release _
    val e0 = sym(Dedup.verifiedPairs(s, d)).persist()
    e0.count()
    try {
      val deg = e0.groupBy("u").agg(count(lit(1)).as("deg"))
        .select(col("u").as("node"), col("deg"))
      // state carries the static degree with the rank so each round is
      // a single edges-x-state join plus one destination aggregate
      var state = deg.select(col("node"), lit(initR).as("r"), col("deg"))
        .localCheckpoint()
      for (_ <- 1 to rounds) {
        val shares = e0
          .join(state, e0("u") === state("node"))
          .select(col("v"), expr("r div deg").as("share"))
        val contrib = shares.groupBy("v").agg(sum(col("share")).as("contrib"))
        val next = state
          .join(contrib, state("node") === contrib("v"), "left")
          .select(
            col("node"),
            (lit(teleport) + expr("85 * coalesce(contrib, 0L) div 100")).as("r"),
            col("deg"))
          .localCheckpoint()
        release(state)
        state = next
      }
      state
        .select(col("node").as("doc_id"), col("deg").cast("bigint").as("deg"),
          col("r").as("pagerank"))
        .orderBy("doc_id")
    } finally e0.unpersist(): Unit
  }

  val all: Seq[GraftQuery] = Seq(qPageRank)
}
