package graft.enrich

import org.apache.spark.sql.SparkSession
import org.apache.spark.util.LongAccumulator

/** A4/A6 (SURVEY.md §2.4): the reference's running counters —
  * current/completed/errors under a lock (`main.py:467-472,488-491`) —
  * and the /get_status throughput + ETA arithmetic (`main.py:654-657`).
  * Spark-native: LongAccumulators merged from executors; driver-side
  * arithmetic for rate/ETA. Register once, thread into the runners.
  */
final class EnrichMetrics(spark: SparkSession) extends Serializable {
  val processed: LongAccumulator = spark.sparkContext.longAccumulator("graft.enrich.processed")
  val errors: LongAccumulator = spark.sparkContext.longAccumulator("graft.enrich.errors")
  val retries: LongAccumulator = spark.sparkContext.longAccumulator("graft.enrich.retries")

  /** items/min given elapsed wall ms (main.py:654-655). */
  def ratePerMinute(elapsedMs: Long): Double =
    if (elapsedMs <= 0) 0.0 else processed.value.toDouble / (elapsedMs.toDouble / 60000.0)

  /** ETA seconds for `total` items at the current rate (main.py:656-657). */
  def etaSeconds(total: Long, elapsedMs: Long): Double = {
    val r = ratePerMinute(elapsedMs)
    if (r <= 0) Double.PositiveInfinity
    else (total - processed.value).max(0L).toDouble / r * 60.0
  }
}
