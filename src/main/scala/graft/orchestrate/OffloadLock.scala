package graft.orchestrate

import java.io.RandomAccessFile
import java.nio.channels.{FileLock, OverlappingFileLockException}
import java.nio.file.{Files, Paths}
import java.util.UUID

/** Per-table advisory lock + execution ids.
  *
  * The reference serialises concurrent orchestration commands per table with
  * a DB advisory lock (`orchestration/orchestration_lock.py`) and stamps
  * every command with an execution id (`orchestration/execution_id.py`).
  * File-system analogue: an OS file lock keyed by table name under the
  * metadata dir — works across JVMs on a shared driver host; a cluster
  * deployment swaps this for a database/ZK lock behind the same interface.
  */
object OffloadLock {

  final case class ExecutionId(value: String)
  def newExecutionId(): ExecutionId =
    ExecutionId(UUID.randomUUID().toString)

  final class TableLock private[OffloadLock] (
      raf: RandomAccessFile, lock: FileLock) {
    def release(): Unit = {
      try lock.release()
      finally raf.close()
    }
  }

  /** Try to acquire the per-table lock; None if another offload holds it. */
  def tryAcquire(lockDir: String, table: String): Option[TableLock] = {
    Files.createDirectories(Paths.get(lockDir))
    val f = Paths.get(lockDir,
      table.replaceAll("[^A-Za-z0-9_.]", "_") + ".lock").toFile
    val raf = new RandomAccessFile(f, "rw")
    try {
      Option(raf.getChannel.tryLock()) match {
        case Some(l) => Some(new TableLock(raf, l))
        case None => raf.close(); None
      }
    } catch {
      case _: OverlappingFileLockException => raf.close(); None
    }
  }

  /** Run `body` holding the table lock; fail fast if already locked (the
    * reference refuses concurrent offloads of one table rather than queue). */
  def withLock[T](lockDir: String, table: String)(body: ExecutionId => T): T =
    tryAcquire(lockDir, table) match {
      case Some(lock) =>
        try body(newExecutionId())
        finally lock.release()
      case None =>
        throw new IllegalStateException(
          s"table $table is locked by another offload")
    }

  // Same-JVM holders of the blocking lock, keyed by lock-file path. JVM
  // file locks are held process-wide and a second acquisition from the same
  // JVM throws OverlappingFileLockException instead of waiting, so in-JVM
  // contention (a foreachBatch thread vs a maintenance CLI call on one
  // driver) must serialize on a JVM mutex BEFORE touching the OS lock.
  private val inProcess =
    new java.util.concurrent.ConcurrentHashMap[String,
      java.util.concurrent.locks.ReentrantLock]()

  /** Run `body` holding the lock, WAITING for a current holder to release
    * (maintenance-vs-stream serialization wants queueing, not refusal:
    * a compact arriving mid-batch should run right after the batch, and a
    * batch arriving mid-compact should not crash the stream). Mutual
    * exclusion holds against both same-JVM threads (JVM mutex) and other
    * processes on the driver host (OS file lock). */
  def withBlockingLock[T](lockDir: String, table: String)(body: => T): T = {
    Files.createDirectories(Paths.get(lockDir))
    val file = Paths.get(lockDir,
      table.replaceAll("[^A-Za-z0-9_.]", "_") + ".lock")
    val jvmLock = inProcess.computeIfAbsent(file.toAbsolutePath.toString,
      _ => new java.util.concurrent.locks.ReentrantLock())
    jvmLock.lock()
    try {
      val raf = new RandomAccessFile(file.toFile, "rw")
      val osLock = raf.getChannel.lock() // blocks on cross-process holders
      try body
      finally {
        try osLock.release()
        finally raf.close()
      }
    } finally jvmLock.unlock()
  }
}
