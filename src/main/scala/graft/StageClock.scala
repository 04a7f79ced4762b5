package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-run stage attribution for [[Bench]] — converts "the residual is
  * per-stage scheduling floor" from assertion to measurement.
  *
  * For every benchmark execution it accumulates, across all jobs the
  * query triggers (including AQE re-plans and broadcast builds):
  *
  *  - `stages`: stages actually executed;
  *  - `taskSec`: Σ task executor run time (the work the cluster did);
  *  - `cpuSec`: Σ task executor CPU time (taskSec minus shuffle/IO
  *    blocking);
  *  - `stageWallSec`: Σ per-stage (completion − submission) wall time.
  *
  * The floor/compute split reported in BENCH_NOTES derives as:
  * ideal compute = taskSec / cores (perfect parallelism), floor =
  * measured wall − ideal compute — scheduling gaps, driver-side
  * broadcast collects, AQE stage materialization barriers, and task
  * dispatch for sub-millisecond tasks all land in the floor term.
  * Stages from concurrent jobs can overlap, so `stageWallSec` may
  * exceed the run's wall clock; it is a diagnostic, not a partition of
  * wall time.
  *
  * Listener events arrive asynchronously on the listener bus;
  * [[quiesce]] polls until all started jobs have ended and the counts
  * stop moving, so a snapshot taken after an action covers exactly that
  * action's work. Timing capture happens before quiesce, so the wait
  * never pollutes the measured wall time.
  */
final class StageClock extends SparkListener {
  private val lock = new Object
  private var stages = 0
  private var jobsCount = 0
  private var taskTimeMs = 0L
  private var cpuTimeNs = 0L
  private var stageWallMs = 0L
  private var shuffleRecs = 0L
  private var shuffleWriteBytes = 0L
  private var maxTaskShuffleReadRecs = 0L
  private var activeJobs = 0

  override def onTaskEnd(
      e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
    lock.synchronized {
      val m = e.taskMetrics
      if (m != null) {
        val r = m.shuffleReadMetrics.recordsRead
        if (r > maxTaskShuffleReadRecs) maxTaskShuffleReadRecs = r
      }
    }

  override def onJobStart(e: SparkListenerJobStart): Unit =
    lock.synchronized { activeJobs += 1; jobsCount += 1 }

  override def onJobEnd(e: SparkListenerJobEnd): Unit =
    lock.synchronized { activeJobs -= 1 }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
    lock.synchronized {
      stages += 1
      val si = e.stageInfo
      val m = si.taskMetrics
      if (m != null) {
        taskTimeMs += m.executorRunTime
        cpuTimeNs += m.executorCpuTime
        shuffleRecs += m.shuffleWriteMetrics.recordsWritten
        shuffleWriteBytes += m.shuffleWriteMetrics.bytesWritten
      }
      stageWallMs += (for {
        s <- si.submissionTime; c <- si.completionTime
      } yield c - s).getOrElse(0L)
    }

  def reset(): Unit = lock.synchronized {
    stages = 0; jobsCount = 0; taskTimeMs = 0L; cpuTimeNs = 0L
    stageWallMs = 0L; shuffleRecs = 0L; shuffleWriteBytes = 0L
    maxTaskShuffleReadRecs = 0L
  }

  /** Jobs started since the last reset — each job in local mode costs a
    * measured ~30-45 ms of scheduler floor regardless of task count, so
    * job count (AQE stage materializations + broadcast builds + the
    * final job) is the first-order floor model for sub-second queries.
    */
  def jobs: Int = lock.synchronized(jobsCount)

  /** Total shuffle records WRITTEN since the last reset — the
    * candidate-volume proxy the scale-growth property test fits its
    * exponent over.
    */
  def shuffleRecords: Long = lock.synchronized(shuffleRecs)

  /** Total shuffle bytes WRITTEN since the last reset — the wire-cost
    * meter (the packed-vector tier's saving lives here, not in
    * parquet-on-disk bytes, which snappy already squeezes).
    */
  def shuffleBytes: Long = lock.synchronized(shuffleWriteBytes)

  /** Largest shuffle-read record count of any single task since the
    * last reset — the skew diagnostic: a hot key that concentrates on
    * one reducer shows up here long before it OOMs a real executor.
    */
  def maxTaskShuffleRead: Long = lock.synchronized(maxTaskShuffleReadRecs)

  /** Wait (bounded) until the listener bus has drained this run's
    * events: no active jobs and stable counters twice in a row.
    */
  def quiesce(maxWaitMs: Long = 2000): Unit = {
    val deadline = System.nanoTime() + maxWaitMs * 1000000L
    var last = (-1, -1L)
    while (System.nanoTime() < deadline) {
      val cur = lock.synchronized {
        if (activeJobs == 0) (stages, taskTimeMs) else (-2, -2L)
      }
      if (cur == last && cur._1 >= 0) return
      last = cur
      Thread.sleep(5)
    }
  }

  /** (stages, taskSec, cpuSec, stageWallSec) since the last reset. */
  def snapshot(): (Int, Double, Double, Double) = lock.synchronized {
    (stages, taskTimeMs / 1e3, cpuTimeNs / 1e9, stageWallMs / 1e3)
  }
}
