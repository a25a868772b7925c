package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Batch-side job control (SURVEY.md §2.2 P6, §2.8 T5/T6).
  *
  * The reference's cooperative pause/stop flags
  * (`/root/reference/main.py:388-392,631-647`) have no Spark-batch
  * equivalent; the engine maps them to job groups:
  *   - stop  → `cancelJobGroup` — running stages abort, the action
  *     throws, and anything already written by completed stages/sinks
  *     remains (stop-with-partial-results);
  *   - pause → batch has none (documented); the streaming module's
  *     checkpoint stop/resume is the real pause (StreamingDemo).
  */
object JobControl {

  /** Run `action` under a job group so it can be cancelled from another
    * thread. Returns Left(cancelMessage) if the group was cancelled. */
  def runCancellable[T](spark: SparkSession, jobGroup: String, description: String = "")
      (action: => T): Either[String, T] = {
    spark.sparkContext.setJobGroup(jobGroup, description, interruptOnCancel = true)
    try Right(action)
    catch {
      // cancellation surfaces with varying wording across Spark versions
      // ("cancelled"/"canceled", SPARK_JOB_CANCELLED, killed stages)
      case e: org.apache.spark.SparkException
          if e.getMessage != null && {
            val m = e.getMessage.toLowerCase
            m.contains("cancel") || m.contains("killed")
          } =>
        Left(e.getMessage)
    } finally spark.sparkContext.clearJobGroup()
  }

  /** T6: stop — cancel every active stage of the job group. */
  def stop(spark: SparkSession, jobGroup: String): Unit =
    spark.sparkContext.cancelJobGroup(jobGroup)
}
