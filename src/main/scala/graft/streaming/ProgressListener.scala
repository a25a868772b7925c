package graft.streaming

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** T1-T4 (SURVEY.md §2.8): the reference pushes per-item progress,
  * error, and completion events over Socket.IO
  * (`/root/reference/main.py:474-502`). The Spark-native equivalent is
  * a SparkListener aggregating task metrics; `onEvent` is the pluggable
  * emit (a UI would wire a websocket here; tests wire a buffer).
  *
  * Driver-side only, O(#tasks) — no data-plane cost at any scale.
  */
final class ProgressListener(onEvent: ProgressListener.Event => Unit)
    extends SparkListener {
  import ProgressListener._

  val recordsRead = new AtomicLong(0)
  val tasksCompleted = new AtomicLong(0)
  val tasksFailed = new AtomicLong(0)
  val lastStage = new AtomicReference[String]("")

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val ok = taskEnd.reason.toString == "Success"
    if (ok) tasksCompleted.incrementAndGet() else tasksFailed.incrementAndGet()
    if (taskEnd.taskMetrics != null)
      recordsRead.addAndGet(taskEnd.taskMetrics.inputMetrics.recordsRead)
    onEvent(ProgressUpdate(tasksCompleted.get(), tasksFailed.get(), recordsRead.get()))
  }

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    lastStage.set(sc.stageInfo.name)
    onEvent(StageCompleted(sc.stageInfo.stageId, sc.stageInfo.numTasks))
  }
}

object ProgressListener {
  sealed trait Event
  final case class ProgressUpdate(completed: Long, failed: Long, recordsRead: Long) extends Event
  final case class StageCompleted(stageId: Int, numTasks: Int) extends Event
}
