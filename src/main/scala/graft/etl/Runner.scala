package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.util.concurrent.atomic.AtomicReference

/** Pipeline runner — the reference's orchestration surface
  * (index.js:46-355: start/force-run/status, etlService.js:416-591:
  * retry ×3 with delay, per-entity totals) re-expressed for Spark.
  *
  * The reference hand-rolls batching (100k rows) and concurrency (4
  * connections); on Spark both are the engine's job (partitions ×
  * executors), so the runner keeps only what Spark doesn't own: stage
  * sequencing, bounded retry with backoff, and a machine-readable run
  * report of processed/skipped/failed per stage — the same totals the
  * reference logs at etlService.js:572-583.
  */
object Runner {

  /** One named unit of work: produces a DataFrame whose materialized row
    * count is the stage's `processed` metric. */
  case class Stage(name: String, run: SparkSession => DataFrame)

  case class StageResult(stage: String, ok: Boolean, attempts: Int,
                         rows: Long, durationMs: Long, error: String)

  case class RunReport(results: Seq[StageResult]) {
    def ok: Boolean = results.forall(_.ok)
    def totalRows: Long = results.map(_.rows).sum

    /** Report as a DataFrame (the queryable twin of etl_run_report). */
    def toDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      results.toDF()
    }
  }

  /** Last finished run, for a status endpoint ("is the ETL running / what
    * did the last run do" — index.js:96-141). */
  private val lastRun = new AtomicReference[Option[RunReport]](None)
  def status: Option[RunReport] = lastRun.get()

  /** Bounded run-log history — the queryable analog of the reference's SSE
    * log stream (index.js:200-240). */
  private val historyRef = new AtomicReference[List[RunReport]](Nil)
  private val HistoryLimit = 100
  def history: Seq[RunReport] = historyRef.get()

  /** Persist a finished run's report into a keyed parquet run-history
    * table — the durable twin of the reference's append-only run log
    * (utils/logger.js writes RSBSAetl.log; /api/logs serves it back,
    * index.js:200-240). One row per (run_id, stage), keyed upsert so a
    * re-persisted run replaces itself instead of duplicating; the table
    * survives session restarts, unlike the in-memory [[history]]. */
  def persistReport(spark: SparkSession, path: String, runId: Long,
                    report: RunReport, numBuckets: Int = 16): Unit = {
    val df = report.toDF(spark)
      .withColumn(
        "run_id", org.apache.spark.sql.functions.lit(runId))
    val keys = Seq("run_id", "stage")
    if (graft.sinks.KeyedParquetSink.tableExists(spark, path))
      graft.sinks.KeyedParquetSink.upsert(spark, path, df, keys, numBuckets)
    else graft.sinks.KeyedParquetSink.write(df, path, keys, numBuckets)
  }

  /** Read the persisted run history back (all runs, all stages) — the
    * queryable /api/logs surface over the stored table. */
  def runHistory(spark: SparkSession, path: String): DataFrame =
    graft.sinks.KeyedParquetSink.read(spark, path)

  /** Cooperative stop (index.js stop endpoint): the current run finishes
    * its in-flight stage, skips the rest, and scheduled loops exit. */
  private val stopFlag = new java.util.concurrent.atomic.AtomicBoolean(false)
  def requestStop(): Unit = stopFlag.set(true)
  def clearStop(): Unit = stopFlag.set(false)
  def stopRequested: Boolean = stopFlag.get()

  /** Fixed-interval repeated runs — the reference's cron loop
    * (index.js:75-86, node-cron schedule + force-run). Executes the
    * pipeline `iterations` times, sleeping `intervalMs` between run
    * STARTS (a run longer than the interval starts the next immediately,
    * like an overrunning cron with no overlap). Returns every report.
    * Production deployments would drive this from a real scheduler or a
    * streaming trigger; the loop gives the library the same
    * self-contained surface the reference exposes. */
  def runScheduled(spark: SparkSession, stages: Seq[Stage], intervalMs: Long,
                   iterations: Int, retries: Int = 3): Seq[RunReport] = {
    val reports = Seq.newBuilder[RunReport]
    var i = 0
    while (i < iterations && !stopFlag.get()) {
      val t0 = System.currentTimeMillis()
      reports += run(spark, stages, retries)
      if (i < iterations - 1 && !stopFlag.get()) {
        val wait = intervalMs - (System.currentTimeMillis() - t0)
        if (wait > 0) Thread.sleep(wait)
      }
      i += 1
    }
    reports.result()
  }

  /** Cron-scheduled repeated runs — parity with the reference's node-cron
    * surface (index.js:30-37 validate, 75-86 schedule). Validates the
    * 5-field pattern first (Left = the validation error, the analog of
    * the reference's 400 response), then executes the pipeline at each of
    * the next `iterations` fire times. `now`/`sleep` are injectable so
    * fire-time behavior is testable without wall-clock waits. */
  def runCron(spark: SparkSession, stages: Seq[Stage], cronExpr: String,
              iterations: Int, retries: Int = 3,
              now: () => java.time.LocalDateTime = () => java.time.LocalDateTime.now(),
              sleep: Long => Unit = Thread.sleep): Either[String, Seq[RunReport]] =
    Cron.parse(cronExpr).flatMap { cron =>
      // parse-valid but unsatisfiable (e.g. "0 0 30 2 *"): probe once up
      // front so the documented error channel fires BEFORE any work runs —
      // and so an IllegalArgumentException thrown later from run()/Spark
      // internals propagates instead of being misreported as cron error
      val sat = try { cron.next(now()); None }
                catch { case e: IllegalArgumentException => Some(e.getMessage) }
      sat match {
        case Some(err) => Left(err)
        case None =>
          val reports = Seq.newBuilder[RunReport]
          var i = 0
          while (i < iterations && !stopFlag.get()) {
            val t = now()
            val waitMs = java.time.Duration.between(t, cron.next(t)).toMillis
            if (waitMs > 0) sleep(waitMs)
            if (!stopFlag.get()) reports += run(spark, stages, retries)
            i += 1
          }
          Right(reports.result())
      }
    }

  /** Run stages sequentially; each stage is retried up to `retries` times
    * with linear backoff (reference: RETRY_LIMIT 3, delay between retries).
    * A failing stage stops the pipeline (later stages typically read what
    * earlier ones wrote). */
  def run(spark: SparkSession, stages: Seq[Stage], retries: Int = 3,
          backoffMs: Long = 1000): RunReport = {
    Progress.attach(spark.sparkContext)
    val out = Seq.newBuilder[StageResult]
    var halted = false
    for (s <- stages if !halted && !stopFlag.get()) {
      var attempt = 0
      var done = false
      var rows = 0L
      var err = ""
      val t0 = System.nanoTime()
      // tag this stage's Spark jobs so Progress can tally its tasks live
      spark.sparkContext.setJobGroup(Progress.begin(s.name),
        s"graft stage ${s.name}", interruptOnCancel = false)
      try {
        while (!done && attempt < retries) {
          attempt += 1
          try { rows = s.run(spark).count(); done = true; err = "" }
          catch {
            case e: Throwable =>
              err = Option(e.getMessage).getOrElse(e.getClass.getName)
              if (attempt < retries) Thread.sleep(backoffMs * attempt)
          }
        }
      } finally spark.sparkContext.clearJobGroup()
      val res = StageResult(s.name, done, attempt, rows,
        (System.nanoTime() - t0) / 1000000L, err)
      out += res
      if (!done) halted = true
    }
    val report = RunReport(out.result())
    lastRun.set(Some(report))
    historyRef.updateAndGet(h => (report :: h).take(HistoryLimit))
    report
  }
}
