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

  def all: Seq[GraftQuery] = Seq(qComponentsStar)
}
