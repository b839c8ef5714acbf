package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Market-basket pair mining over the order fact: which parts
  * co-occur in the same order more often than chance — the relational
  * cousin of q205's token-PMI collocations, here with support
  * filtering and integer-ppm lift (the association-rule score).
  *
  * Scale (100 TB):
  *  - The pair expansion is a self-join WITHIN the order key: one
  *    shuffle by l_orderkey, output bounded by sum(per-order items²)
  *    — TPC-H orders hold ≤ 7 lines, so the blow-up is a small
  *    constant, and a long-basket deployment caps it by truncating
  *    baskets to top-N items per order (documented, not needed here).
  *  - The support HAVING is a map-side-combinable count; everything
  *    below the threshold dies in the aggregate, never reaching the
  *    frequency join.
  *  - Part frequencies are part-cardinality (dimension-sized) and
  *    broadcast; the total-orders count is a 1-row broadcast.
  *  - Lift is exact integer ppm by cross-multiplication
  *    (n_both·n_tot·10⁶ div n_a·n_b) — no fp ratios, so the output is
  *    partitioning-independent and engine-identical.
  */
object MarketBasket {

  val minSupport = 2

  val qBasketPairs: GraftQuery = GraftQuery(
    "q251_basket_pairs",
    s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n_tot FROM lineitem),
       |pf AS (SELECT l_partkey, COUNT(*) AS n_part FROM op GROUP BY l_partkey),
       |pairs AS (
       |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       |    COUNT(*) AS n_both
       |  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
       |    AND a.l_partkey < b.l_partkey
       |  GROUP BY a.l_partkey, b.l_partkey
       |  HAVING COUNT(*) >= $minSupport)
       |SELECT part_a, part_b, CAST(n_both AS BIGINT) AS n_both,
       |  CAST(fa.n_part AS BIGINT) AS n_a,
       |  CAST(fb.n_part AS BIGINT) AS n_b,
       |  CAST((n_both * t.n_tot * 1000000) // (fa.n_part * fb.n_part)
       |    AS BIGINT) AS lift_ppm
       |FROM pairs
       |JOIN pf fa ON fa.l_partkey = part_a
       |JOIN pf fb ON fb.l_partkey = part_b
       |CROSS JOIN tot t
       |ORDER BY part_a, part_b""".stripMargin) { (s, d) =>
    val op = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val opA = op.select(col("l_orderkey").as("ok_a"), col("l_partkey").as("part_a"))
    val opB = op.select(col("l_orderkey").as("ok_b"), col("l_partkey").as("part_b"))
    val pairs = opA
      .join(opB, col("ok_a") === col("ok_b") && col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("n_both"))
      .where(col("n_both") >= minSupport)
    val pf = op.groupBy("l_partkey").agg(count(lit(1)).as("n_part"))
    val tot = Tables.lineitem(s, d)
      .agg(countDistinct(col("l_orderkey")).as("n_tot"))
    pairs
      .join(broadcast(pf.select(col("l_partkey").as("pk_a"), col("n_part").as("n_a"))),
        col("part_a") === col("pk_a"))
      .join(broadcast(pf.select(col("l_partkey").as("pk_b"), col("n_part").as("n_b"))),
        col("part_b") === col("pk_b"))
      .crossJoin(broadcast(tot))
      .select(
        col("part_a"), col("part_b"), col("n_both"),
        col("n_a"), col("n_b"),
        expr("n_both * n_tot * 1000000 div (n_a * n_b)").as("lift_ppm"))
      .orderBy("part_a", "part_b")
  }

  /** Rule-generation step (the Apriori second phase): each qualifying
    * pair yields BOTH directional rules a=>b and b=>a, scored by exact
    * integer-ppm confidence (n_both·10⁶ div n_antecedent) and gated at
    * [[minConfidencePpm]]. Scale: runs entirely on q251's
    * support-filtered pair relation — the corpus never re-enters; the
    * direction union doubles a relation already pruned to qualifying
    * pairs, and the confidence gate is a per-row integer predicate. */
  val minConfidencePpm = 100000L

  val qBasketRules: GraftQuery = GraftQuery(
    "q252_basket_rules",
    s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |pf AS (SELECT l_partkey, COUNT(*) AS n_part FROM op GROUP BY l_partkey),
       |pairs AS (
       |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       |    COUNT(*) AS n_both
       |  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
       |    AND a.l_partkey < b.l_partkey
       |  GROUP BY a.l_partkey, b.l_partkey
       |  HAVING COUNT(*) >= $minSupport),
       |rules AS (
       |  SELECT part_a AS ante, part_b AS cons, n_both, f.n_part AS n_ante
       |  FROM pairs JOIN pf f ON f.l_partkey = part_a
       |  UNION ALL
       |  SELECT part_b, part_a, n_both, f.n_part
       |  FROM pairs JOIN pf f ON f.l_partkey = part_b)
       |SELECT ante, cons, CAST(n_both AS BIGINT) AS n_both,
       |  CAST(n_ante AS BIGINT) AS n_ante,
       |  CAST((n_both * 1000000) // n_ante AS BIGINT) AS conf_ppm
       |FROM rules
       |WHERE (n_both * 1000000) // n_ante >= $minConfidencePpm
       |ORDER BY ante, cons""".stripMargin) { (s, d) =>
    val op = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val opA = op.select(col("l_orderkey").as("ok_a"), col("l_partkey").as("part_a"))
    val opB = op.select(col("l_orderkey").as("ok_b"), col("l_partkey").as("part_b"))
    val pairs = opA
      .join(opB, col("ok_a") === col("ok_b") && col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("n_both"))
      .where(col("n_both") >= minSupport)
    val pf = op.groupBy("l_partkey").agg(count(lit(1)).as("n_part"))
    val fwd = pairs
      .join(broadcast(pf.select(col("l_partkey").as("pk"), col("n_part").as("n_ante"))),
        col("part_a") === col("pk"))
      .select(col("part_a").as("ante"), col("part_b").as("cons"),
        col("n_both"), col("n_ante"))
    val rev = pairs
      .join(broadcast(pf.select(col("l_partkey").as("pk"), col("n_part").as("n_ante"))),
        col("part_b") === col("pk"))
      .select(col("part_b").as("ante"), col("part_a").as("cons"),
        col("n_both"), col("n_ante"))
    fwd.unionByName(rev)
      .select(col("ante"), col("cons"), col("n_both"), col("n_ante"),
        expr("n_both * 1000000 div n_ante").as("conf_ppm"))
      .where(col("conf_ppm") >= minConfidencePpm)
      .orderBy("ante", "cons")
  }

  /** ITEM-ITEM SIMILARITY top-k (the classic collaborative-filtering
    * neighborhood): parts scored by co-occurrence COSINE
    * n_both/√(n_a·n_b) over order baskets, each part keeping its 3
    * nearest neighbors. The ranking key is cos² as exact integer ppm
    * ((n_both²·10⁶) div (n_a·n_b)) — monotone in cosine, so the
    * neighbor order is partitioning- and engine-independent with a
    * (cos2 desc, neighbor id) tie-break; the reported double cosine is
    * one sqrt of the exact rational, for humans.
    *
    * Scale (100 TB): reuses q251's bounded within-basket self-join and
    * support gate (pairs below minSupport never reach ranking). The
    * directional expansion doubles the PAIR census, not the corpus;
    * the top-k window partitions by item over that compact census —
    * at billions of items this is the standard sharded-ANN-free
    * item-CF layout (each item's candidate list is its co-occurrence
    * row, never an all-pairs scan). */
  val qItemSimTopK: GraftQuery = GraftQuery(
    "q262_item_sim_topk",
    s"""WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |pf AS (SELECT l_partkey, COUNT(*) AS n_part FROM op GROUP BY l_partkey),
       |pairs AS (
       |  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       |    CAST(COUNT(*) AS BIGINT) AS n_both
       |  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
       |    AND a.l_partkey < b.l_partkey
       |  GROUP BY a.l_partkey, b.l_partkey
       |  HAVING COUNT(*) >= $minSupport),
       |sym AS (
       |  SELECT part_a AS item, part_b AS neighbor, n_both FROM pairs
       |  UNION ALL
       |  SELECT part_b, part_a, n_both FROM pairs),
       |scored AS (
       |  SELECT s.item, s.neighbor, s.n_both,
       |    CAST(fa.n_part AS BIGINT) AS n_item,
       |    CAST(fb.n_part AS BIGINT) AS n_neighbor,
       |    CAST((n_both * n_both * 1000000) // (fa.n_part * fb.n_part)
       |      AS BIGINT) AS cos2_ppm
       |  FROM sym s
       |  JOIN pf fa ON fa.l_partkey = s.item
       |  JOIN pf fb ON fb.l_partkey = s.neighbor),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY item
       |    ORDER BY cos2_ppm DESC, neighbor) AS rk
       |  FROM scored)
       |SELECT item, rk, neighbor, n_both, n_item, n_neighbor, cos2_ppm,
       |  CAST(n_both AS DOUBLE)
       |    / sqrt(CAST(n_item AS DOUBLE) * CAST(n_neighbor AS DOUBLE)) AS cosine
       |FROM ranked WHERE rk <= 3
       |ORDER BY item, rk""".stripMargin) { (s, d) =>
    val op = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val opA = op.select(col("l_orderkey").as("ok_a"), col("l_partkey").as("part_a"))
    val opB = op.select(col("l_orderkey").as("ok_b"), col("l_partkey").as("part_b"))
    val pairs = opA
      .join(opB, col("ok_a") === col("ok_b") && col("part_a") < col("part_b"))
      .groupBy("part_a", "part_b")
      .agg(count(lit(1)).as("n_both"))
      .where(col("n_both") >= minSupport)
    val sym = pairs.select(col("part_a").as("item"), col("part_b").as("neighbor"), col("n_both"))
      .unionByName(pairs.select(col("part_b").as("item"), col("part_a").as("neighbor"), col("n_both")))
    val pf = op.groupBy("l_partkey").agg(count(lit(1)).as("n_part"))
    val scored = sym
      .join(broadcast(pf.select(col("l_partkey").as("pk_a"), col("n_part").as("n_item"))),
        col("item") === col("pk_a"))
      .join(broadcast(pf.select(col("l_partkey").as("pk_b"), col("n_part").as("n_neighbor"))),
        col("neighbor") === col("pk_b"))
      .select(col("item"), col("neighbor"), col("n_both"),
        col("n_item"), col("n_neighbor"),
        expr("(n_both * n_both * 1000000) div (n_item * n_neighbor)").as("cos2_ppm"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("item").orderBy(col("cos2_ppm").desc, col("neighbor"))
    scored.withColumn("rk", row_number().over(w))
      .where(col("rk") <= 3)
      .select(col("item"), col("rk"), col("neighbor"), col("n_both"),
        col("n_item"), col("n_neighbor"), col("cos2_ppm"),
        (col("n_both").cast("double")
          / sqrt(col("n_item").cast("double") * col("n_neighbor").cast("double")))
          .as("cosine"))
      .orderBy("item", "rk")
  }

  val all: Seq[GraftQuery] = Seq(qBasketPairs, qBasketRules, qItemSimTopK)
}
