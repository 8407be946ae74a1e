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
