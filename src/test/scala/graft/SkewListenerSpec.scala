package graft

import org.apache.spark.Success
import org.apache.spark.scheduler.{SparkListenerTaskEnd, TaskInfo,
  TaskLocality}
import org.scalatest.funsuite.AnyFunSuite

/** SkewListener unit contract: both lenses (the stderr stage report and
  * the per-query `skew_worst_ratio` drain Bench emits) flag the same
  * straggler and ignore balanced or trivially small stages. Pure
  * listener-event test — no SparkSession needed.
  */
class SkewListenerSpec extends AnyFunSuite {

  private def end(stage: Int, durMs: Long, idx: Int): SparkListenerTaskEnd = {
    val info = new TaskInfo(idx.toLong, idx, 0, idx, 0L, "exec1", "host1",
      TaskLocality.ANY, false)
    info.finishTime = durMs // launched at 0 → duration == durMs
    new SparkListenerTaskEnd(stage, 0, "ResultTask", Success, info,
      null, null)
  }

  test("straggler stages are flagged; balanced and tiny ones are not") {
    val l = new SkewListener
    // stage 0: 8 balanced 300 ms tasks; stage 1: 7×100 ms + one 1000 ms
    // straggler (mean 212.5 → ratio 4.7×); stage 2: skewed but under the
    // minTasks floor (scheduling noise, must not count)
    (0 until 8).foreach(i => l.onTaskEnd(end(0, 300, i)))
    (0 until 7).foreach(i => l.onTaskEnd(end(1, 100, i)))
    l.onTaskEnd(end(1, 1000, 7))
    (0 until 2).foreach(i => l.onTaskEnd(end(2, if (i == 0) 900 else 100, i)))

    val report = l.skewedStages(ratio = 3.0, minTasks = 8, minMaxMs = 500)
    assert(report.size == 1 && report.head.contains("stage 1"), report)

    val worst = l.drainWorstRatio(minTasks = 8, minMaxMs = 200)
    assert(math.abs(worst - 1000.0 / (1700.0 / 8)) < 1e-9, worst.toString)
    // the drain cleared its window
    assert(l.drainWorstRatio(minTasks = 1, minMaxMs = 0) == 0.0)
  }
}
