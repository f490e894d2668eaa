package graft.ops

import java.util.concurrent.atomic.LongAdder
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Execution telemetry: run a block and report what the cluster actually
  * moved — input bytes, shuffle read/write bytes and records, spill.
  *
  * The plan audits (PlanAuditSpec) assert the SHAPE claims ("this join
  * broadcasts", "this agg combines map-side"); this harness asserts the
  * NUMBERS those shapes imply ("the broadcast variant shuffles an order
  * of magnitude fewer bytes than the shuffle join"). At 100 TB the
  * numbers are the difference between a plan that looks right and a job
  * that finishes — shuffle volume is the primary cost model, and spill
  * is the first sign a partition no longer fits an executor.
  */
object Metrics {

  final case class Report(inputBytes: Long, shuffleReadBytes: Long,
      shuffleWriteBytes: Long, shuffleWriteRecords: Long,
      spillBytes: Long) {
    def totalShuffleBytes: Long = shuffleReadBytes + shuffleWriteBytes
  }

  /** Runs `body`, returns (result, metrics aggregated over every task
    * that ENDED during the block). The listener is registered for the
    * duration of the block only; a final listener-bus flush makes late
    * task-end events count. CAVEAT: the listener is context-global —
    * tasks of concurrently running jobs on the same SparkContext (a
    * live streaming query, a parallel benchmark) are counted too, so
    * measure() assumes the context is otherwise quiet, which is how
    * the spec harness uses it.
    */
  def measure[T](spark: SparkSession)(body: => T): (T, Report) = {
    val input = new LongAdder; val sr = new LongAdder
    val sw = new LongAdder; val swr = new LongAdder
    val spill = new LongAdder
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          input.add(m.inputMetrics.bytesRead)
          sr.add(m.shuffleReadMetrics.totalBytesRead)
          sw.add(m.shuffleWriteMetrics.bytesWritten)
          swr.add(m.shuffleWriteMetrics.recordsWritten)
          spill.add(m.memoryBytesSpilled + m.diskBytesSpilled)
        }
      }
    }
    val sc = spark.sparkContext
    sc.addSparkListener(listener)
    try {
      val out = body
      // the listener bus delivers asynchronously and its flush API is
      // private[spark]: wait until two consecutive reads agree (bounded)
      def snapshot() = (input.sum, sr.sum, sw.sum, swr.sum, spill.sum)
      var prev = snapshot(); var stable = 0; var waited = 0
      while (stable < 2 && waited < 5000) {
        Thread.sleep(50); waited += 50
        val cur = snapshot()
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
      }
      (out, Report(input.sum, sr.sum, sw.sum, swr.sum, spill.sum))
    } finally sc.removeSparkListener(listener)
  }
}
