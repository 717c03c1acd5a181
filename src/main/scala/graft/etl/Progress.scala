package graft.etl

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Live run-progress reporting — the Spark-native analog of the
  * reference's per-batch progress % (etlService.js:416-591 logs an
  * N-of-total line per 100k-row batch). The reference counts hand-rolled
  * batches; on Spark the engine owns batching, so the honest unit of
  * progress is the TASK: a SparkListener tallies completed vs launched
  * tasks for the jobs each named pipeline stage submits (correlated via
  * the job group id that [[Runner.run]] sets per stage).
  *
  * Listener callbacks are driver-side metadata events (a few per task,
  * zero data-path cost) — the same mechanism the Spark UI uses.
  */
object Progress {

  final case class StageProgress(stage: String, tasksDone: Long, tasksTotal: Long) {
    /** 0.0–1.0; stages that launched no job yet report 0. */
    def fraction: Double = if (tasksTotal == 0) 0.0 else tasksDone.toDouble / tasksTotal
  }

  private final class Counters {
    val total = new AtomicLong(0)
    val done = new AtomicLong(0)
  }

  /** group id → counters; spark stage id → group id (TaskEnd events don't
    * carry the group, JobStart's stageInfos do). */
  private val groups = new ConcurrentHashMap[String, Counters]()
  private val stageToGroup = new ConcurrentHashMap[Int, String]()
  @volatile private var attached = false

  private object listener extends SparkListener {
    // JobStart only maps stage ids to the group; totals are tallied at
    // StageSubmitted, because a job's stageInfos also list parent stages
    // whose shuffle output already exists — those are SKIPPED (their
    // tasks never run) and would otherwise inflate the denominator
    // forever (AQE submits many jobs per query, sharing stages).
    override def onJobStart(jobStart: SparkListenerJobStart): Unit =
      Option(jobStart.properties)
        .flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
        .filter(_.startsWith(GroupPrefix))
        .foreach { group =>
          groups.computeIfAbsent(group, _ => new Counters)
          jobStart.stageInfos.foreach(si => stageToGroup.put(si.stageId, group))
        }
    override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = {
      val group = stageToGroup.get(s.stageInfo.stageId)
      if (group != null)
        groups.get(group).total.addAndGet(s.stageInfo.numTasks.toLong)
    }
    override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
      val group = stageToGroup.get(taskEnd.stageId)
      // failed attempts are retried (and re-counted at resubmission), so
      // only successful tasks advance the numerator
      if (group != null && taskEnd.reason == org.apache.spark.Success)
        groups.get(group).done.incrementAndGet()
    }
  }

  private val GroupPrefix = "graft-stage-"
  private[etl] def groupId(stage: String): String = GroupPrefix + stage

  /** Idempotently attach the listener to this JVM's SparkContext. */
  def attach(sc: SparkContext): Unit = synchronized {
    if (!attached) { sc.addSparkListener(listener); attached = true }
  }

  /** Forget a stage's tallies (called by Runner at the start of a run so
    * a re-run reports fresh progress, not cumulative history). */
  private[etl] def reset(stage: String): Unit =
    groups.remove(groupId(stage))

  /** Current progress of a named stage, if it has launched any Spark job. */
  def of(stage: String): Option[StageProgress] =
    Option(groups.get(groupId(stage)))
      .map(c => StageProgress(stage, c.done.get(), c.total.get()))

  /** Snapshot of every tracked stage, for a status endpoint. */
  def snapshot(): Seq[StageProgress] = {
    import scala.jdk.CollectionConverters._
    groups.asScala.toSeq.map { case (g, c) =>
      StageProgress(g.stripPrefix(GroupPrefix), c.done.get(), c.total.get())
    }.sortBy(_.stage)
  }
}
