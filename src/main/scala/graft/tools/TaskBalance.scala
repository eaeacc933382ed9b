package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Collects per-task run times between reset() and snapshot() — the
  * evidence collector for skew measurements. A skewed join shows up as
  * max-task ≫ median-task long before it moves total wall time on a
  * 32-thread local box, so TASK BALANCE (not wall clock) is the quantity
  * the SfScale skew replay reports into SCALING.md.
  *
  * Tasks are grouped by stage and the snapshot reports the HEAVIEST stage
  * (largest summed task time) separately: a query's scan and final-agg
  * stages would otherwise drown the join stage's imbalance in the
  * all-tasks max. */
final class TaskBalance extends SparkListener {
  private val times =
    scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
    if (t.taskInfo != null && t.taskInfo.successful)
      times += ((t.stageId, t.taskInfo.duration))
  }

  def reset(): Unit = synchronized(times.clear())

  final case class Stats(tasks: Int, p50Ms: Long, maxMs: Long) {
    def imbalance: Double = if (p50Ms > 0) maxMs.toDouble / p50Ms else -1.0
  }

  private def statsOf(ds: Seq[Long]): Stats = {
    val s = ds.sorted
    if (s.isEmpty) Stats(0, 0L, 0L) else Stats(s.size, s(s.size / 2), s.last)
  }

  /** (all tasks, heaviest stage) since reset. */
  def snapshot(): (Stats, Stats) = synchronized {
    val all = statsOf(times.map(_._2).toSeq)
    val heaviest =
      if (times.isEmpty) Stats(0, 0L, 0L)
      else statsOf(times.groupBy(_._1).values.maxBy(_.map(_._2).sum).map(_._2).toSeq)
    (all, heaviest)
  }

  /** Top `n` stages by summed task time, heaviest first — (stageId,
    * stats). For attributing WHICH stage carries an imbalance. */
  def topStages(n: Int): Seq[(Int, Stats)] = synchronized {
    times.groupBy(_._1).view
      .mapValues(ts => (ts.map(_._2).sum, statsOf(ts.map(_._2).toSeq))).toSeq
      .sortBy(-_._2._1).take(n)
      .map { case (sid, (_, st)) => (sid, st) }
  }
}
