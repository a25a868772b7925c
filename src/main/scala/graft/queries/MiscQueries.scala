package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.ext.Multimodal
import graft.operators.SkewedAgg
import graft.operators.ColOps._

/** q28 (salted skew aggregation) and q29 (multimodal binary pipeline). */
object MiscQueries {

  /** q28: per-user event stats through the salted two-phase aggregate —
    * results provably identical to a plain GROUP BY (the oracle). */
  def q28SaltedAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    SkewedAgg.saltedCountSum(Tables.loadEvents(s, dir), "user_id", dec($"value"))
      .select($"user_id", $"n", $"sum_value".cast("double").as("sum_value"))
      .orderBy($"user_id")
  }

  val q28Sql: String =
    """SELECT user_id, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q29: multimodal plumbing — pack documents as binary payloads with
    * typed metadata, run the (stubbed) per-partition feature extractor.
    * The oracle recomputes the features from the text directly (ASCII
    * corpus: byte values = code points). */
  def q29Multimodal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val packed = Multimodal.packBinary(Tables.load(s, dir, "documents"), "text", "source")
    Multimodal.extractFeatures(packed, "payload")
      .select($"doc_id", $"meta.format".as("format"), $"meta.n_bytes".as("meta_bytes"),
        $"n_bytes", $"first_byte", $"checksum", $"brightness")
      .orderBy($"doc_id")
  }

  val q29Sql: String =
    """SELECT doc_id, 'raw/utf-8' AS format,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS meta_bytes,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST(unicode(substr(text, 1, 1)) AS BIGINT) AS first_byte,
      |  CAST(list_sum(list_transform(generate_series(1, length(text)),
      |    i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))) % 256 AS BIGINT) AS checksum,
      |  CAST(list_sum(list_transform(generate_series(1, length(text)),
      |    i -> CAST(unicode(substr(text, i, 1)) AS BIGINT))) AS DOUBLE)
      |    / CAST(octet_length(encode(text)) AS DOUBLE) AS brightness
      |FROM documents ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q28_salted_agg" -> (q28SaltedAgg _),
    "q29_multimodal" -> (q29Multimodal _))

  val oracle: Map[String, String] = Map(
    "q28_salted_agg" -> q28Sql,
    "q29_multimodal" -> q29Sql)
}
