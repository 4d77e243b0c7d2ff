package graft.sources

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame

/** Write-progress metering — the Spark-native analogue of the reference's
  * insert loop telemetry (`price_client.py:162-164`: per-batch progress %
  * and a final rows-in-seconds / rows-per-sec line). The reference meters
  * a driver-side row loop; here the write is distributed, so the unit of
  * progress is the TASK: a `SparkListener` accumulates the executors'
  * `outputMetrics` (records/bytes actually written by `FileFormatWriter`)
  * as task-end events stream back to the driver, and emits a progress
  * event every `logEveryTasks` completions — the distributed equivalent
  * of "log every 10 batches".
  *
  * Scale posture: metrics ride the existing task-status channel (no extra
  * job, no data movement, no `.count()` re-scan of the written output);
  * the listener holds three counters regardless of row count.
  */
object Metering {

  /** One progress tick: rows/bytes confirmed written so far, tasks done,
    * elapsed seconds, and percent of `expectedRows` when known. */
  case class ProgressEvent(rows: Long, bytes: Long, tasks: Long,
                           elapsedSec: Double, pctOfExpected: Option[Double])

  /** Final write telemetry — the reference's completion line
    * (`rows in Xs (N rows/sec)`) as data. */
  case class WriteMetrics(rows: Long, bytes: Long, tasks: Long,
                          seconds: Double) {
    def rowsPerSec: Double = if (seconds > 0) rows / seconds else 0.0
    /** The reference's completion-log line shape. */
    override def toString: String =
      f"$rows%d rows in $seconds%.2fs (${rowsPerSec}%,.0f rows/sec)"
  }

  /** Default progress sink: the reference's progress-log line shape. */
  def logProgress(e: ProgressEvent): Unit = {
    val pct = e.pctOfExpected.map(p => f"$p%.1f%% ").getOrElse("")
    System.err.println(
      f"[metered-write] $pct(${e.rows}%,d rows, ${e.tasks}%d tasks) - ${e.elapsedSec}%.1fs")
  }

  /** Run `write` on `df` with task-level output metering. Returns the
    * confirmed totals; `onProgress` fires (from the listener thread)
    * every `logEveryTasks` task completions.
    *
    * Listener events are delivered asynchronously, so after the write
    * returns this polls briefly until the task-end stream goes quiet
    * (bounded by `drainTimeoutMs`) before reading the totals — the same
    * reason the reference reads its counters after `insert_df` returns,
    * not during. */
  def meteredWrite(df: DataFrame, expectedRows: Option[Long] = None,
                   logEveryTasks: Int = 10,
                   onProgress: ProgressEvent => Unit = logProgress,
                   drainTimeoutMs: Long = 10000L)
                  (write: DataFrame => Unit): WriteMetrics = {
    val sc = df.sparkSession.sparkContext
    val rows = new AtomicLong(0L)
    val bytes = new AtomicLong(0L)
    val tasks = new AtomicLong(0L)
    val t0 = System.nanoTime()
    val failure = new AtomicReference[Throwable](null)
    val listener = new SparkListener {
      override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
        for (tm <- Option(taskEnd.taskMetrics); om <- Option(tm.outputMetrics)) {
          rows.addAndGet(om.recordsWritten)
          bytes.addAndGet(om.bytesWritten)
        }
        val n = tasks.incrementAndGet()
        if (logEveryTasks > 0 && n % logEveryTasks == 0) {
          val elapsed = (System.nanoTime() - t0) / 1e9
          val r = rows.get()
          try onProgress(ProgressEvent(r, bytes.get(), n, elapsed,
            expectedRows.filter(_ > 0).map(e => r.toDouble / e * 100)))
          catch { case t: Throwable => failure.compareAndSet(null, t) }
        }
      }
    }
    sc.addSparkListener(listener)
    try {
      write(df)
      // Drain: task-end events can trail the write's return; wait until
      // two consecutive polls see the same NON-ZERO task count (a zero
      // count only goes stable after a 1s grace — events may not have
      // started arriving yet), bounded by drainTimeoutMs.
      val start = System.nanoTime()
      val deadline = start + drainTimeoutMs * 1000000L
      val zeroGrace = start + 1000000000L
      var last = -1L
      var stable = false
      while (!stable && System.nanoTime() < deadline) {
        val cur = tasks.get()
        if (cur == last && (cur > 0 || System.nanoTime() > zeroGrace)) stable = true
        else { last = cur; Thread.sleep(100) }
      }
    } finally sc.removeSparkListener(listener)
    Option(failure.get()).foreach(throw _)
    WriteMetrics(rows.get(), bytes.get(), tasks.get(),
      (System.nanoTime() - t0) / 1e9)
  }
}
