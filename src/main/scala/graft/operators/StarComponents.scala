package graft.operators

import graft.GraftQuery
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by alternating large-star / small-star
  * contraction (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14) — the diameter-INDEPENDENT scale path next to
  * [[Dedup.connectedComponents]]'s min-label propagation.
  *
  * Why a second algorithm: min-label propagation needs O(component
  * diameter) rounds — fine for near-dup clusters (tiny, dense), fatal
  * for chain-shaped components (a 1M-node path needs 1M rounds). The
  * star algorithm rewires every node toward its neighborhood minimum
  * each round, provably converging in O(log² n) rounds regardless of
  * topology (in practice < 10 for any input we can generate) to a
  * forest of stars centered at each component's minimum id.
  * StarComponentsSpec plants a 200-node path: this converges in ≤ 8
  * rounds where the propagation form provably cannot within 15.
  *
  * One round = two grouped aggregations + two shuffle joins, all keyed
  * by node id; edge-set cardinality never grows above the input edge
  * count + node count (each node contributes its min edge), so the
  * per-round shuffle is bounded by the input — the 100 TB shape.
  * Convergence is detected by set equality (count + empty except) on
  * the canonicalized edge list, and non-convergence THROWS like the
  * propagation form — a silent partial result would surface only as
  * wrong cluster ids downstream.
  */
object StarComponents {

  /** Undirected edges (a, b) → symmetric (u, v) view. */
  private def sym(e: DataFrame): DataFrame =
    e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))

  /** Canonical undirected form: a < b, self-loops dropped, distinct. */
  private def canon(e: DataFrame): DataFrame =
    e.select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .where(col("a") =!= col("b")).distinct()

  /** Large-star: every node connects its STRICTLY LARGER neighbors to
    * the minimum of its closed neighborhood — long tails collapse
    * toward small ids without ever disconnecting a component. */
  private def largeStar(e: DataFrame): DataFrame = {
    val s = sym(e)
    val mins = s.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("mn"), col("u")).as("m"))
    s.join(mins, "u").where(col("v") > col("u"))
      .select(col("v").as("a"), col("m").as("b"))
  }

  /** Small-star: each node rewires its smaller-or-equal neighbors (and
    * itself) to its smallest neighbor. */
  private def smallStar(e: DataFrame): DataFrame = {
    val o = e.select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      .where(col("u") =!= col("v"))
    val mins = o.groupBy("u").agg(min("v").as("m"))
    o.join(mins, "u").select(col("v").as("a"), col("m").as("b"))
      .union(mins.select(col("u").as("a"), col("m").as("b")))
  }

  /** Labels every node of `pairs` (cols doc_a, doc_b) with its
    * component's minimum id. Returns (labels(node, label), rounds);
    * the labels relation is persisted and OWNED BY THE CALLER
    * (unpersist when done) — same contract as
    * [[Dedup.connectedComponents]]. */
  def connectedComponentsStar(pairs: DataFrame, maxIters: Int = 25): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    // tiny iterative relation: size the loop's shuffles to the data,
    // not the CPU count (same session-global caveat as the propagation
    // form — single-threaded driver harness, newSession() if shared)
    val partKey = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(partKey)
    spark.conf.set(partKey, "8")
    // localCheckpoint (not persist): each round's plan embeds ~10
    // copies of the previous round's (sym unions + two joins + the
    // except), so lineage grows EXPONENTIALLY in rounds — truncate it
    // every round, exactly the Bpe trainer's pattern. Eager, so the
    // old generation's blocks can be released immediately after.
    // release via Checkpoints (a checkpointed frame's unpersist() is a
    // CacheManager no-op; blocks would otherwise wait on GC timing)
    val release = org.apache.spark.sql.graftshim.Checkpoints.release _
    var cur = canon(pairs.select(col("doc_a").as("a"), col("doc_b").as("b")))
      .localCheckpoint()
    var n = cur.count()
    var rounds = 0
    var converged = false
    try {
      while (!converged && rounds < maxIters) {
        val next = canon(smallStar(largeStar(cur))).localCheckpoint()
        try {
          val n2 = next.count()
          // set equality: same cardinality + empty difference (both
          // sides canonical-distinct, so one-sided except suffices)
          converged = n2 == n && next.except(cur).limit(1).count() == 0
          n = n2
        } catch {
          case t: Throwable => release(next); throw t
        }
        release(cur)
        cur = next
        rounds += 1
      }
    } catch {
      case t: Throwable => release(cur); throw t
    } finally spark.conf.set(partKey, prev)
    if (!converged) {
      release(cur)
      throw new IllegalStateException(
        s"star contraction did not converge in $maxIters rounds")
    }
    // fixpoint is a star forest: every node's closed-neighborhood min
    // IS its component min
    val labels = sym(cur).groupBy("u").agg(min("v").as("mn"))
      .select(col("u").as("node"), least(col("mn"), col("u")).as("label"))
      .persist()
    labels.count() // pin before releasing the edges it derives from
    // Cluster-mode tradeoff (same as Dedup.connectedComponents): the
    // released checkpoint blocks were labels' only recompute source —
    // an executor loss now fails the job instead of recomputing. Local
    // mode: fine. Multi-executor: keep the blocks or checkpoint() to
    // reliable storage.
    release(cur)
    (labels, rounds)
  }

  /** Component labels per (session, corpus), bounded like q77's. */
  private val index =
    new graft.spark.SessionMemo[String, DataFrame](
      "starcomponents.labels")(_.unpersist(): Unit)

  /** Near-dup clusters via star contraction — SAME contract and SAME
    * oracle as q77 (transitive closure of the Jaccard-verified pair
    * set), different physics: q77's propagation pays O(diameter)
    * rounds, this pays O(log² n). A hash match against the identical
    * recursive-CTE oracle proves the two algorithms agree cluster-for-
    * cluster on real pairs; StarComponentsSpec separates them on the
    * planted topologies where diameter bites. */
  val qComponentsStar: GraftQuery = GraftQuery(
    "q133_components_star",
    Dedup.qDedupComponents.oracle.get) { (s, d) =>
    val labels = index.getOrElseUpdate(s, d)({
        val pairs = Dedup.withJaccardToks(
            Dedup.candidatePairsFromBands(Dedup.indexedBands(s, d)),
            Dedup.indexedShingleSets(s, d))
          .where(col("jaccard") >= 0.9)
          .select("doc_a", "doc_b")
        connectedComponentsStar(pairs)._1
      })
    labels.select(col("node").as("doc_id"), col("label").as("cluster_id"))
      .withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("cluster_id")).cast("int"))
      .orderBy("doc_id")
  }

  /** Fixed iteration count and 2^20 rank scale for q180. */
  val prIters = 8
  val prScale = 1048576L
  /** base = ⌊0.15·2^20⌋; the damping split is 15/100, 85/100 in
    * integer floor arithmetic. */
  val prBase: Long = 15L * prScale / 100L

  /** INTEGER-ARITHMETIC PAGERANK over the Jaccard-verified near-dup
    * graph (Brin-Page damping 0.85, [[prIters]] power iterations) —
    * the authority score that picks which member of a duplicate
    * cluster is the "canonical" copy by link structure rather than by
    * quality logit (q161's rule). The graph is symmetric (undirected
    * pairs), so there are no dangling nodes and every node receives
    * mass each round.
    *
    * The exactness trick: ranks live on the 2^-20 integer grid and
    * EVERY operation is integer — contribution = r div deg, update =
    * base + (85·Σcontrib) div 100. Floor-division PageRank converges
    * to the same ordering as the real-valued iteration (errors are
    * bounded by deg·2^-20 per round) while being bit-reproducible
    * under ANY partitioning and in DuckDB, whose oracle UNROLLS the
    * [[prIters]] iterations as chained CTEs (recursive CTEs cannot
    * aggregate over the recursive reference — unrolling is the
    * standard-SQL spelling of a fixed-depth loop).
    *
    * 100 TB: per-iteration cost is one edges⋈ranks hash join + one
    * groupBy, both keyed and bounded by |E|; lineage is truncated per
    * round (localCheckpoint, the q133 discipline); iteration count is
    * FIXED — an ordering-stability convergence test would add a
    * per-round driver sync for no semantic gain at 8 rounds. */
  val qPageRank: GraftQuery = GraftQuery(
    "q180_pagerank", {
      val base = s"""edges AS (
         |  SELECT doc_a AS a, doc_b AS b FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |deg AS (SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS deg
         |        FROM edges GROUP BY a),
         |it0 AS (SELECT node, CAST($prScale AS BIGINT) AS r FROM deg)""".stripMargin
      val its = (1 to prIters).map { k =>
        s"""it$k AS (
           |  SELECT e.b AS node,
           |    CAST($prBase + (85 * CAST(SUM(p.r // d.deg) AS BIGINT)) // 100 AS BIGINT) AS r
           |  FROM edges e
           |  JOIN it${k - 1} p ON e.a = p.node
           |  JOIN deg d ON d.node = e.a
           |  GROUP BY e.b)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${Dedup.pairsCte},
         |$base,
         |$its
         |SELECT i.node AS doc_id, d.deg, i.r AS rank_q20
         |FROM it$prIters i JOIN deg d ON d.node = i.node
         |ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
    pageRankInt(Dedup.verifiedPairs(s, d), prIters)
      .select(col("node").as("doc_id"), col("deg"), col("r").as("rank_q20"))
      .orderBy("doc_id")
  }

  /** The integer power iteration behind q180, reusable on any
    * (doc_a, doc_b) pair relation. Returns (node, deg, r). */
  def pageRankInt(pairs: DataFrame, iters: Int = prIters): DataFrame = {
    val spark = pairs.sparkSession
    // tiny iterative relation (the near-dup pair graph is Zipf-compact,
    // ~10^2..10^3 nodes at the tested SFs): size the loop's shuffles
    // PER ROUND to the data, not the CPU count — the star-contraction
    // discipline (before: each round paid cores-many near-empty
    // shuffle tasks per stage).
    val partKey = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(partKey)
    spark.conf.set(partKey, "8")
    try {
      val edges = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
        .unionByName(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      val deg = edges.groupBy("a").agg(count(lit(1)).as("deg"))
      val edgesDeg = edges.join(deg, "a").persist()
      edgesDeg.count()
      val release = org.apache.spark.sql.graftshim.Checkpoints.release _
      // Checkpoint every FOURTH generation, not every one: unlike star
      // contraction (whose round plan embeds ~10 copies of the previous
      // round — exponential lineage), each rank generation references
      // its predecessor exactly ONCE (one join), so lineage grows
      // linearly and an eager materialization barrier per round just
      // pays 8 job launches for a 10^2-node relation. Four chained
      // (join ⋈ groupBy) rounds per plan keeps the tree small while
      // cutting the barrier count to iters/4. q180 isolated at sf0.1:
      // 6.2 s (r12, per-round ckpt + cores-wide shuffles) → 5.0 s
      // (tiny shuffles) → measured again after this change below.
      val ckptEvery = 4
      var ranks = deg.select(col("a").as("node"), lit(prScale).as("r"))
        .localCheckpoint()
      var lastCkpt = ranks
      try {
        (1 to iters).foreach { i =>
          var next = edgesDeg.join(ranks, col("a") === col("node"))
            .select(col("b"), expr("r div deg").as("contrib"))
            .groupBy("b")
            .agg(sum("contrib").as("s"))
            .select(col("b").as("node"),
              (lit(prBase) + expr("85 * s div 100")).as("r"))
          if (i % ckptEvery == 0 || i == iters) {
            next = next.localCheckpoint()
            release(lastCkpt)
            lastCkpt = next
          }
          ranks = next
        }
        // the final checkpointed generation rides into the caller's plan
        // (blocks bounded by the node set, freed with the session); the
        // intermediate generations were released eagerly above
        ranks.join(deg.select(col("a").as("node"), col("deg")), "node")
      } finally edgesDeg.unpersist(): Unit
    } finally spark.conf.set(partKey, prev)
  }

  /** GRAPH MOTIF CENSUS over the verified near-dup graph: per node,
    * its degree, wedge count C(deg,2), triangle participation, and
    * local clustering coefficient — the structure signal that separates
    * a mutual-copy CLIQUE (template boilerplate, clustering → 1) from a
    * hub-and-spoke CHAIN (one canonical page copied by many one-off
    * mirrors, clustering → 0). Curation policy can then differ: cliques
    * collapse to one representative; low-clustering hubs deserve a
    * look at the hub itself.
    *
    * Triangle enumeration uses DEGREE-ORDERED ORIENTATION (the classic
    * MapReduce-triangles result, Suri & Vassilvitskii WWW'11): each
    * undirected edge is directed from its lower (deg, id) endpoint to
    * the higher, which bounds every node's out-degree by O(√m), so the
    * wedge self-join generates at most O(m^1.5) candidates regardless
    * of skew — a star node with degree 10⁶ contributes ZERO wedges as
    * a source (all its edges point IN from its one-degree neighbors).
    * Each triangle {x<y<z} is produced exactly once, as the wedge
    * (x→y, x→z) closed by x→y→z's companion edge y→z. Wedge counts
    * come straight from the degree (C(deg,2), exact integers — no
    * join), and the clustering coefficient is one IEEE division of
    * exact integers. All joins are keyed on the Zipf-compact pair
    * graph, never the corpus.
    *
    * Oracle: same orientation + closure in DuckDB over the shared
    * verified-pair CTE; row-value comparisons mirror the Spark
    * (deg, id) lexicographic predicate. */
  val qGraphCensus: GraftQuery = GraftQuery(
    "q200_graph_census",
    s"""WITH ${Dedup.pairsCte},
       |deg AS (
       |  SELECT n, CAST(count(*) AS BIGINT) AS deg FROM (
       |    SELECT doc_a AS n FROM pairs UNION ALL SELECT doc_b FROM pairs)
       |  GROUP BY n),
       |ori AS (
       |  SELECT CASE WHEN (da.deg, p.doc_a) < (db.deg, p.doc_b)
       |              THEN p.doc_a ELSE p.doc_b END AS u,
       |         CASE WHEN (da.deg, p.doc_a) < (db.deg, p.doc_b)
       |              THEN p.doc_b ELSE p.doc_a END AS v
       |  FROM pairs p
       |  JOIN deg da ON p.doc_a = da.n
       |  JOIN deg db ON p.doc_b = db.n),
       |orid AS (SELECT o.u, o.v, d.deg AS dv FROM ori o JOIN deg d ON o.v = d.n),
       |tri AS (
       |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
       |  FROM orid e1
       |  JOIN orid e2 ON e1.u = e2.u AND (e1.dv, e1.v) < (e2.dv, e2.v)
       |  JOIN ori e3 ON e3.u = e1.v AND e3.v = e2.v),
       |tri_nodes AS (
       |  SELECT n, CAST(count(*) AS BIGINT) AS n_tri FROM (
       |    SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
       |    UNION ALL SELECT c FROM tri)
       |  GROUP BY n)
       |SELECT d.n AS doc_id, d.deg AS degree,
       |  CAST(d.deg * (d.deg - 1) // 2 AS BIGINT) AS n_wedges,
       |  COALESCE(t.n_tri, CAST(0 AS BIGINT)) AS n_triangles,
       |  CASE WHEN d.deg >= 2
       |    THEN CAST(COALESCE(t.n_tri, 0) AS DOUBLE)
       |         / CAST(d.deg * (d.deg - 1) // 2 AS BIGINT)
       |    ELSE CAST(0 AS DOUBLE) END AS clustering
       |FROM deg d LEFT JOIN tri_nodes t ON d.n = t.n
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    graphCensus(Dedup.verifiedPairs(s, d)).orderBy("doc_id")
  }

  /** The census behind q200, reusable on any (doc_a, doc_b) pair
    * relation. Returns (doc_id, degree, n_wedges, n_triangles,
    * clustering). */
  def graphCensus(pairs: DataFrame): DataFrame = {
    val deg = pairs.select(col("doc_a").as("n"))
      .unionByName(pairs.select(col("doc_b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val pairsDeg = pairs
      .join(deg.select(col("n").as("doc_a"), col("deg").as("da")), "doc_a")
      .join(deg.select(col("n").as("doc_b"), col("deg").as("db")), "doc_b")
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("doc_a") < col("doc_b"))
    val ori = pairsDeg.select(
      when(aFirst, col("doc_a")).otherwise(col("doc_b")).as("u"),
      when(aFirst, col("doc_b")).otherwise(col("doc_a")).as("v"))
    val orid = ori.join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
    // wedges at u: out-neighbor pairs in (deg, id) order — closed into
    // triangles by the companion oriented edge (b, c)
    val e1 = orid.select(col("u"), col("v").as("b"), col("dv").as("db_"))
    val e2 = orid.select(col("u"), col("v").as("c"), col("dv").as("dc_"))
    val tri = e1.join(e2, "u")
      .where(col("db_") < col("dc_") ||
        (col("db_") === col("dc_") && col("b") < col("c")))
      .join(ori.select(col("u").as("b"), col("v").as("c")), Seq("b", "c"))
    val triNodes = tri
      .select(explode(array(col("u"), col("b"), col("c"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("n_tri"))
    deg.join(triNodes, Seq("n"), "left")
      .select(col("n").as("doc_id"),
        col("deg").as("degree"),
        expr("deg * (deg - 1) div 2").as("n_wedges"),
        coalesce(col("n_tri"), lit(0L)).as("n_triangles"),
        when(col("deg") >= 2,
          coalesce(col("n_tri"), lit(0L)).cast("double")
            / expr("deg * (deg - 1) div 2"))
          .otherwise(lit(0.0)).as("clustering"))
  }

  def all: Seq[GraftQuery] = Seq(qComponentsStar, qPageRank, qGraphCensus)
}
