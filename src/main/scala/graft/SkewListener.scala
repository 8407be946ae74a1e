package graft

import scala.collection.concurrent.TrieMap
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Per-stage task-time skew tracker (ROADMAP #7): at cluster scale a
  * partition-balance regression shows up as max-task ≫ mean-task long
  * before it shows in totals. Bench registers one and prints offenders
  * to stderr (the stdout JSON line stays machine-readable).
  */
class SkewListener extends SparkListener {

  // stageId -> (maxMs, sumMs, nTasks)
  private val stages = TrieMap.empty[Int, (Long, Long, Int)]

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val d = Option(taskEnd.taskInfo).map(_.duration).getOrElse(0L)
    stages.updateWith(taskEnd.stageId) {
      case Some((mx, sum, n)) => Some((mx max d, sum + d, n + 1))
      case None => Some((d, d, 1))
    }
  }

  /** Worst max/mean task-time ratio across stages recorded since the
    * last call, then clears the window — the per-query lens Bench
    * emits as `skew_worst_ratio` so a partition-balance regression is
    * diffable round-over-round instead of anecdotal. 0 when no stage
    * cleared the task-count/duration floors (tiny stages are all
    * "skewed" by scheduling noise). Listener delivery is async, so a
    * straggling task event may land in the next query's window —
    * acceptable slop for a diagnostic ratio.
    */
  def drainWorstRatio(minTasks: Int = 8, minMaxMs: Long = 200): Double = {
    val worst = stages.values.foldLeft(0.0) {
      case (w, (mx, sum, n)) if n >= minTasks && mx >= minMaxMs =>
        w max (mx.toDouble / (sum.toDouble / n))
      case (w, _) => w
    }
    stages.clear()
    worst
  }

  /** Stages where the slowest task ran ≥ `ratio`× the mean (only stages
    * with enough tasks and non-trivial work to matter).
    */
  def skewedStages(ratio: Double = 3.0, minTasks: Int = 8,
      minMaxMs: Long = 500): Seq[String] =
    stages.toSeq.sortBy(_._1).collect {
      case (id, (mx, sum, n))
          if n >= minTasks && mx >= minMaxMs &&
            mx.toDouble / (sum.toDouble / n) >= ratio =>
        f"stage $id: max ${mx}ms vs mean ${sum / n}ms over $n tasks " +
          f"(${mx.toDouble / (sum.toDouble / n)}%.1fx)"
    }
}
