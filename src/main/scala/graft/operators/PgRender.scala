package graft.operators

import graft.GraftQuery
import graft.models.TaxiModels
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.PgFloat8Text

/** E2 float-text parity (SURVEY §7.4): the reference's md5 surrogate
  * key concatenates float8 columns, so byte-parity with Postgres
  * requires PG's `float8out` rendering, not Java's. [[PgFloat8Text]]
  * is the renderer; these queries oracle-check it per-row AND inside
  * the production md5-key path over every float shape the testdata
  * exhibits: integral doubles (`25.0`→`25`), fractional fixed-range
  * (`13309.6`), small-scientific (`4e-06`), large-scientific
  * (`9.0063236e+16`), and zero.
  *
  * Oracle note: DuckDB 1.0's own double→VARCHAR keeps `.0` on integral
  * values and holds fixed notation up to 1e16 (PG switches at 1e15), so
  * the oracle spells PG's integral rule explicitly and the query domain
  * stays clear of [1e15, 1e16) — where the two engines' notations
  * diverge — by scaling with 1e14 (min l_extendedprice × 1e14 ≈ 9e16).
  * Everywhere else DuckDB's shortest-round-trip digits and notation
  * match PG exactly (probed: 0.1, 0.0001, 1e-05, 9e+16, 1e+100).
  */
object PgRender {

  private val pgCase: String => String = x =>
    s"""CASE WHEN $x = floor($x) AND abs($x) < 1e15
       |     THEN CAST(CAST($x AS BIGINT) AS VARCHAR)
       |     ELSE CAST($x AS VARCHAR) END""".stripMargin

  /** Per-row PG float8 rendering + the schema-aware md5 surrogate key
    * over a (bigint, double×3, timestamp, varchar) key tuple — the
    * taxi-model key shape (core_texi.sql:10-31) on lineitem columns. */
  val qPgFloat8Render: GraftQuery = GraftQuery(
    "q91_pg_float8_render",
    s"""SELECT l_orderkey, l_linenumber,
       |  ${pgCase("l_quantity")} AS qty_txt,
       |  ${pgCase("l_extendedprice")} AS price_txt,
       |  ${pgCase("l_discount")} AS disc_txt,
       |  ${pgCase("(l_extendedprice * 1e14)")} AS price_sci_txt,
       |  ${pgCase("(l_discount / 1e4)")} AS disc_sci_txt,
       |  md5(CAST(l_orderkey AS VARCHAR) || '-' || ${pgCase("l_quantity")}
       |      || '-' || ${pgCase("l_extendedprice")} || '-' || ${pgCase("l_discount")}
       |      || '-' || CAST(l_shipdate AS VARCHAR) || '-' || l_returnflag) AS unique_id
       |FROM lineitem
       |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d)
    val keyNames = Seq("l_orderkey", "l_quantity", "l_extendedprice",
      "l_discount", "l_shipdate", "l_returnflag")
    li.select(
      col("l_orderkey"), col("l_linenumber"),
      PgFloat8Text(col("l_quantity")).as("qty_txt"),
      PgFloat8Text(col("l_extendedprice")).as("price_txt"),
      PgFloat8Text(col("l_discount")).as("disc_txt"),
      PgFloat8Text(col("l_extendedprice") * 1e14).as("price_sci_txt"),
      PgFloat8Text(col("l_discount") / 1e4).as("disc_sci_txt"),
      TaxiModels.uniqueId(li, keyNames).as("unique_id"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  def all: Seq[GraftQuery] = Seq(qPgFloat8Render)
}
