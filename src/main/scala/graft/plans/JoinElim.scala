package graft.plans

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference, EqualTo, Expression, IsNotNull
}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, Filter, Join, LogicalPlan, Project
}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** PK/FK JOIN ELIMINATION — the second optimizer rule (next to
  * [[MvRewrite]]): a join to a dimension whose columns are never used
  * is dropped from the plan. Semantic layers and BI generators emit
  * exactly these joins (every query goes through the star-schema
  * model whether or not the dimension is referenced); at 100 TB each
  * redundant join is a broadcast build or a shuffle that returns
  * nothing. Classic warehouse machinery: Oracle/Snowflake eliminate
  * on RELY constraints, Calcite on declared unique keys.
  *
  * Soundness, by join type:
  *  - LEFT OUTER to a dim with a DECLARED-UNIQUE key: unconditionally
  *    safe. Uniqueness ⇒ no fact row duplicates; outerness ⇒ no fact
  *    row drops. The join is the identity on the fact side.
  *  - INNER on a declared FK edge (unique pk + referential integrity,
  *    RELY semantics — the q187 sweep is this engine's audit for the
  *    declaration): every non-NULL fk matches exactly one dim row, so
  *    the join ≡ `Filter(IsNotNull(fk))` on the fact side — which is
  *    exactly what the rewrite emits (a NULL fk row is dropped by an
  *    inner join, so the filter must stay).
  *  The rule fires only when the parent (Project or Aggregate) refers
  *  EXCLUSIVELY to fact-side attributes, the join condition is the
  *  single declared pk = fk equality, and the dim side is a bare
  *  (possibly pruned/null-filtered) scan of the declared dimension.
  *  Anything else passes through untouched.
  *
  * Constraints are declared against the testdata star schema below
  * and verified by q187's referential-integrity sweep; the oracle for
  * q230/q231 COMPUTES THE JOIN, so the hash match is a per-run proof
  * the declaration holds on the data the rule served.
  */
object JoinElim {

  /** pk-unique dimensions: parquet file name → unique key column. */
  val uniqueKeys: Map[String, String] = Map(
    "customer.parquet" -> "c_custkey",
    "supplier.parquet" -> "s_suppkey",
    "part.parquet" -> "p_partkey",
    "nation.parquet" -> "n_nationkey",
    "region.parquet" -> "r_regionkey",
    "orders.parquet" -> "o_orderkey")

  /** RELY FK edges: (fact fk column → dim parquet file). Integrity is
    * the q187-audited property of the testdata generator. */
  val fkEdges: Map[String, String] = Map(
    "o_custkey" -> "customer.parquet",
    "l_orderkey" -> "orders.parquet",
    "l_suppkey" -> "supplier.parquet",
    "l_partkey" -> "part.parquet",
    "c_nationkey" -> "nation.parquet",
    "s_nationkey" -> "nation.parquet",
    "n_regionkey" -> "region.parquet")

  final class FkJoinElimination extends Rule[LogicalPlan] {

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
      case p @ Project(_, j: Join) =>
        eliminate(j, p.references.map(_.exprId).toSet).map(nj =>
          p.copy(child = nj)).getOrElse(p)
      case a: Aggregate =>
        a.child match {
          case j: Join =>
            eliminate(j, a.references.map(_.exprId).toSet).map(nj =>
              a.copy(child = nj)).getOrElse(a)
          case _ => a
        }
    }

    /** The dim-side scan's file name, looking through attribute-only
      * Projects and join-key null filters. */
    private def dimFile(p: LogicalPlan): Option[String] = p match {
      case Project(pl, rest) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        dimFile(rest)
      case Filter(cond, rest) if isNullGuard(cond) => dimFile(rest)
      case lr: LogicalRelation =>
        lr.relation match {
          case h: HadoopFsRelation =>
            h.location.rootPaths.headOption.map(_.getName)
          case _ => None
        }
      case _ => None
    }

    private def isNullGuard(e: Expression): Boolean = e match {
      case IsNotNull(_: AttributeReference) => true
      case org.apache.spark.sql.catalyst.expressions.And(a, b) =>
        isNullGuard(a) && isNullGuard(b)
      case _ => false
    }

    private def eliminate(j: Join, parentRefs: Set[org.apache.spark.sql.catalyst.expressions.ExprId]): Option[LogicalPlan] = {
      // parent must use fact-side attrs only
      if (!parentRefs.subsetOf(j.left.outputSet.map(_.exprId).toSet)) return None
      val (fk, pk) = j.condition match {
        case Some(EqualTo(a: AttributeReference, b: AttributeReference)) =>
          if (j.left.outputSet.contains(a)) (a, b) else (b, a)
        case _ => return None
      }
      if (!j.left.outputSet.contains(fk) || !j.right.outputSet.contains(pk))
        return None
      val file = dimFile(j.right).getOrElse(return None)
      // dim key must be the declared unique key
      if (!uniqueKeys.get(file).contains(pk.name)) return None
      j.joinType match {
        case LeftOuter =>
          Some(j.left) // row-preserving by uniqueness alone
        case Inner if fkEdges.get(fk.name).contains(file) =>
          Some(Filter(IsNotNull(fk), j.left)) // FK RELY: join ≡ null filter
        case _ => None
      }
    }
  }

  /** Install the elimination rule around `body` (same session-global
    * discipline as [[MvRewrite.withRule]]). */
  def withRule[T](spark: SparkSession)(body: => T): T = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    val prev = exp.extraOptimizations
    exp.extraOptimizations = prev :+ new FkJoinElimination
    try body
    finally exp.extraOptimizations = prev
  }

  /** q230: the LEFT-OUTER elimination — a BI-style query that joins
    * the (unused) customer dimension onto orders. The rule drops the
    * join (JoinElimSpec pins the plan); the oracle COMPUTES it, so
    * the match proves row-preservation on this data. */
  val qLeftElim: GraftQuery = GraftQuery(
    "q230_join_elim_left",
    """SELECT o.o_orderpriority,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price
      |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |GROUP BY o.o_orderpriority
      |ORDER BY o.o_orderpriority""".stripMargin) { (s, d) =>
    withRule(s) {
      Tables.orders(s, d).as("o")
        .join(Tables.customer(s, d).as("c"),
          col("o.o_custkey") === col("c.c_custkey"), "left")
        .groupBy(col("o.o_orderpriority").as("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o.o_totalprice").cast("decimal(14,2)")).cast("double")
            .as("sum_price"))
        .orderBy("o_orderpriority")
        .localCheckpoint()
    }
  }

  /** q231: the INNER elimination under the FK RELY declaration — the
    * lineitem→orders integrity join rewritten to a not-null filter.
    * Again the oracle computes the real join. */
  val qInnerElim: GraftQuery = GraftQuery(
    "q231_join_elim_inner",
    """SELECT l.l_returnflag,
      |  CAST(COUNT(*) AS BIGINT) AS n_lines,
      |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,1))) AS DOUBLE) AS sum_qty
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |GROUP BY l.l_returnflag
      |ORDER BY l.l_returnflag""".stripMargin) { (s, d) =>
    withRule(s) {
      Tables.lineitem(s, d).as("l")
        .join(Tables.orders(s, d).as("o"),
          col("l.l_orderkey") === col("o.o_orderkey"))
        .groupBy(col("l.l_returnflag").as("l_returnflag"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("l.l_quantity").cast("decimal(12,1)")).cast("double")
            .as("sum_qty"))
        .orderBy("l_returnflag")
        .localCheckpoint()
    }
  }

  def all: Seq[GraftQuery] = Seq(qLeftElim, qInnerElim)
}
