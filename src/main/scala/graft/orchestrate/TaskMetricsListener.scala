package graft.orchestrate

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Per-task metrics listener — native restatement of the reference's
  * `GOETaskListener` jar (`tools/spark-listener/src/main/scala/
  * GOETaskListener.scala:23-44`), which emitted JSON log lines that the
  * orchestrator scraped to count transported rows. In-process we just
  * collect the records and expose aggregates; the same listener attaches to
  * any cluster run via `spark.extraListeners`. */
class TaskMetricsListener extends SparkListener {

  final case class TaskRecord(
      stageId: Int, taskId: Long, durationMs: Long,
      recordsWritten: Long, bytesWritten: Long,
      recordsRead: Long, executorRunTimeMs: Long)

  private val records = new ConcurrentLinkedQueue[TaskRecord]()

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      records.add(TaskRecord(
        stageId = taskEnd.stageId,
        taskId = taskEnd.taskInfo.taskId,
        durationMs = taskEnd.taskInfo.duration,
        recordsWritten = m.outputMetrics.recordsWritten,
        bytesWritten = m.outputMetrics.bytesWritten,
        recordsRead = m.inputMetrics.recordsRead,
        executorRunTimeMs = m.executorRunTime))
    }
  }

  def snapshot: Seq[TaskRecord] = records.iterator().asScala.toSeq

  /** Rows written across all tasks — the number the reference scraped from
    * Spark logs to validate transport row counts
    * (`offload_transport.py:1811-1838`). */
  def totalRecordsWritten: Long = snapshot.map(_.recordsWritten).sum

  def reset(): Unit = records.clear()
}
