package graft.operators

import graft.GraftQuery
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON parse + imputation-cascade queries (reference operators T3/T4,
  * /root/reference/Data-Insights/Application.py:44-124: json.loads with
  * required-key validation, then a default/derived-value fill chain). */
object JsonQueries {

  /** T3: schema-checked JSON parse. from_json with an explicit struct —
    * missing keys become NULL fields, malformed JSON becomes a NULL
    * struct (exactly the engine-side analog of the reference's
    * dict-validation). */
  val qJsonParse: GraftQuery = GraftQuery(
    "q38_json_parse",
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
      |  json_valid(props) AS is_valid,
      |  CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
      |       THEN true ELSE false END AS has_k
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    val schema = StructType(Seq(StructField("k", IntegerType)))
    Tables.events(s, d)
      .withColumn("parsed", from_json(col("props"), schema))
      .select(
        col("event_id"),
        col("parsed.k").as("k_val"),
        col("parsed").isNotNull.as("is_valid"),
        when(col("parsed.k").isNotNull, true).otherwise(false).as("has_k"))
      .orderBy("event_id")
  }

  /** T4: imputation cascade — coalesce(raw, derived, default), the
    * reference's fill-missing-features chain (Application.py:44-75):
    * value per k falls back to a per-type average and then a constant. */
  val qImputationCascade: GraftQuery = GraftQuery(
    "q39_imputation_cascade",
    """WITH typed AS (
      |  SELECT event_id, event_type, value,
      |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
      |  FROM events),
      |type_avg AS (
      |  SELECT event_type,
      |    CAST(SUM(CAST(value AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*) AS avg_value
      |  FROM typed GROUP BY event_type)
      |SELECT t.event_id, t.event_type,
      |  CASE WHEN t.k_val > 0 THEN t.value / t.k_val ELSE NULL END AS raw_ratio,
      |  COALESCE(
      |    CASE WHEN t.k_val > 0 THEN t.value / t.k_val ELSE NULL END,
      |    a.avg_value / 100.0,
      |    1.0) AS imputed_ratio
      |FROM typed t JOIN type_avg a ON t.event_type = a.event_type
      |ORDER BY t.event_id""".stripMargin) { (s, d) =>
    val typed = Tables.events(s, d).select(
      col("event_id"), col("event_type"), col("value"),
      get_json_object(col("props"), "$.k").cast("int").as("k_val"))
    val typeAvg = typed.groupBy("event_type").agg(
      (sum(col("value").cast("decimal(14,2)")).cast("double") / count(lit(1)))
        .as("avg_value"))
    val rawRatio = when(col("k_val") > 0, col("value") / col("k_val"))
      .otherwise(lit(null))
    typed.join(broadcast(typeAvg), "event_type")
      .select(
        col("event_id"), col("event_type"),
        rawRatio.as("raw_ratio"),
        coalesce(rawRatio, col("avg_value") / 100.0, lit(1.0)).as("imputed_ratio"))
      .orderBy("event_id")
  }

  def all: Seq[GraftQuery] = Seq(qJsonParse, qImputationCascade)
}
