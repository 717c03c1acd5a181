package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import java.util.concurrent.atomic.AtomicInteger

class RunnerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("runner retries flaky stages and reports per-stage totals") {
    val flakyCalls = new AtomicInteger(0)
    val stages = Seq(
      Runner.Stage("clean", s => Seq((1, "a"), (2, "b")).toDF("k", "v")),
      Runner.Stage("flaky", s => {
        if (flakyCalls.incrementAndGet() < 3) sys.error("transient")
        Seq((3, "c")).toDF("k", "v")
      }))
    val report = Runner.run(spark, stages, retries = 3, backoffMs = 1)
    assert(report.ok && report.totalRows == 3)
    assert(report.results.map(r => (r.stage, r.ok, r.attempts, r.rows)) ==
      Seq(("clean", true, 1, 2L), ("flaky", true, 3, 1L)))
    assert(Runner.status.exists(_.ok))
    // report is queryable as a DataFrame
    val df = report.toDF(spark)
    assert(df.where(col("ok")).count() == 2)
  }

  test("runner halts the pipeline after a stage exhausts retries") {
    val stages = Seq(
      Runner.Stage("dies", s => sys.error("permanent")),
      Runner.Stage("never_runs", s => Seq(1).toDF("x")))
    val report = Runner.run(spark, stages, retries = 2, backoffMs = 1)
    assert(!report.ok)
    assert(report.results.map(_.stage) == Seq("dies"))
    assert(report.results.head.attempts == 2 && report.results.head.error.contains("permanent"))
  }

  test("runScheduled repeats the pipeline and collects every report") {
    Runner.clearStop()
    val calls = new AtomicInteger(0)
    val stages = Seq(Runner.Stage("tick", s => { calls.incrementAndGet(); Seq(1).toDF("x") }))
    val reports = Runner.runScheduled(spark, stages, intervalMs = 1, iterations = 3)
    assert(reports.size == 3 && calls.get() == 3 && reports.forall(_.ok))
    assert(Runner.history.size >= 3)
  }

  test("requestStop halts a scheduled loop between runs") {
    Runner.clearStop()
    val calls = new AtomicInteger(0)
    val stages = Seq(Runner.Stage("tick", s => {
      if (calls.incrementAndGet() == 1) Runner.requestStop()
      Seq(1).toDF("x")
    }))
    val reports = Runner.runScheduled(spark, stages, intervalMs = 1, iterations = 10)
    assert(reports.size == 1 && calls.get() == 1)
    Runner.clearStop()
  }

  test("Progress tallies a stage's tasks via the listener") {
    Runner.clearStop()
    val stages = Seq(Runner.Stage("prog", s =>
      s.range(0, 1000, 1, 4).toDF("x").groupBy($"x" % 10).count()))
    val report = Runner.run(spark, stages, retries = 1)
    assert(report.ok)
    // listener events are async — poll until the tally converges
    def settled(): Progress.StageProgress = {
      val deadline = System.nanoTime() + 10000000000L
      var p = Progress.of("prog").get
      while ((p.tasksTotal == 0 || p.tasksDone < p.tasksTotal) &&
             System.nanoTime() < deadline) {
        Thread.sleep(50); p = Progress.of("prog").get
      }
      p
    }
    val p = settled()
    assert(p.tasksTotal > 0 && p.tasksDone == p.tasksTotal && p.fraction == 1.0)
    assert(Progress.snapshot().exists(_.stage == "prog"))
    // a fresh run resets the tally instead of accumulating
    Runner.run(spark, stages, retries = 1)
    val p2 = settled()
    assert(p2.tasksTotal == p.tasksTotal)
  }

  test("Progress fraction clamps at 1.0 when attempts exceed launched tasks") {
    // speculative / resubmitted attempts can over-count done transiently
    assert(Progress.StageProgress("s", tasksDone = 5, tasksTotal = 4).fraction == 1.0)
    assert(Progress.StageProgress("s", 2, 4).fraction == 0.5)
    assert(Progress.StageProgress("s", 0, 0).fraction == 0.0)
  }

  test("Progress eviction structures stay bounded under re-begun stage names") {
    // the long-lived cron case: the SAME stage name begins forever — each
    // name holds exactly one order slot (move-to-back), so nothing grows
    val base = Progress.orderSize
    (1 to 500).foreach(_ => Progress.begin("cron-recycled"))
    assert(Progress.orderSize <= base + 1)
    assert(Progress.of("cron-recycled").isDefined)
    // generated distinct names beyond the cap retire the stalest fully
    (1 to 300).foreach(i => Progress.begin(s"gen-bounded-$i"))
    assert(Progress.orderSize <= 256)
    assert(Progress.of("gen-bounded-300").isDefined)
  }

  test("Cron.parse validates patterns like the reference's cron.validate") {
    assert(Cron.isValid("* * * * *"))
    assert(Cron.isValid("*/15 0-6 1,15 * 1-5"))
    assert(Cron.isValid("0 9 * * 7"))          // 7 ≡ Sunday
    assert(!Cron.isValid("* * * *"))           // 4 fields
    assert(!Cron.isValid("60 * * * *"))        // minute out of range
    assert(!Cron.isValid("* * 0 * *"))         // dom starts at 1
    assert(!Cron.isValid("*/0 * * * *"))       // zero step
    assert(!Cron.isValid("5-1 * * * *"))       // inverted range
    assert(!Cron.isValid("a * * * *"))
    assert(Cron.parse("* * * *").left.exists(_.contains("5 fields")))
  }

  test("Cron node-cron parity: optional seconds field and month/day names") {
    import java.time.LocalDateTime
    // 6-field form: seconds validated for range, then floored
    assert(Cron.isValid("0 */15 * * * *"))
    assert(!Cron.isValid("60 * * * * *"))       // seconds out of range
    assert(!Cron.isValid("* * * * * * *"))      // 7 fields
    val t = LocalDateTime.of(2026, 8, 12, 10, 7)
    def n(e: String, from: LocalDateTime = t) = Cron.parse(e).toOption.get.next(from)
    assert(n("30 */15 * * * *") == n("*/15 * * * *"))
    // 3-letter names, case-insensitive, in values and range endpoints
    assert(Cron.isValid("0 9 * JAN-MAR MON-FRI"))
    assert(n("0 9 * * MON") == n("0 9 * * 1"))
    assert(n("0 0 1 jan *") == n("0 0 1 1 *"))
    assert(n("0 9 * * mon-fri") == n("0 9 * * 1-5"))
    assert(!Cron.isValid("0 9 * XYZ *"))        // unknown name
    assert(!Cron.isValid("0 MON * * *"))        // name in a numeric field
  }

  test("Cron vixie semantics: value/step expansion and star-with-step day rule") {
    import java.time.LocalDateTime
    val t = LocalDateTime.of(2026, 8, 12, 10, 7)
    def n(e: String, from: LocalDateTime = t) = Cron.parse(e).toOption.get.next(from)
    // "5/15" ≡ "5-59/15": fires :05 :20 :35 :50, not once an hour at :05
    assert(n("5/15 * * * *") == LocalDateTime.of(2026, 8, 12, 10, 20))
    // "*/2" in dom is still a STAR field: day rule stays AND with dow, so
    // "0 0 */2 * 1" fires only on Mondays with odd day-of-month
    assert(n("0 0 */2 * 1") == LocalDateTime.of(2026, 8, 17, 0, 0))
    // Feb 29 across the 2100 non-leap century year (8-year gap)
    assert(n("0 0 29 2 *", LocalDateTime.of(2096, 3, 1, 0, 0)) ==
      LocalDateTime.of(2104, 2, 29, 0, 0))
  }

  test("Cron.next fire-time math") {
    import java.time.LocalDateTime
    val t = LocalDateTime.of(2026, 8, 12, 10, 7)        // a Wednesday
    def n(e: String, from: LocalDateTime = t) = Cron.parse(e).toOption.get.next(from)
    assert(n("*/15 * * * *") == LocalDateTime.of(2026, 8, 12, 10, 15))
    assert(n("0 9 * * *") == LocalDateTime.of(2026, 8, 13, 9, 0))
    assert(n("0 9 * * 1") == LocalDateTime.of(2026, 8, 17, 9, 0))   // next Monday
    assert(n("7 10 * * *") == LocalDateTime.of(2026, 8, 13, 10, 7)) // strict after
    // vixie OR rule: dom 15 OR friday — Aug 14 2026 is a Friday
    assert(n("0 0 15 * 5") == LocalDateTime.of(2026, 8, 14, 0, 0))
    // dow-only restriction stays AND with wildcard dom
    assert(n("0 0 * * 5") == LocalDateTime.of(2026, 8, 14, 0, 0))
    // Feb 29 resolves across years (2028 is the next leap year)
    assert(n("30 2 29 2 *") == LocalDateTime.of(2028, 2, 29, 2, 30))
  }

  test("runCron fires at cron boundaries with injected clock") {
    Runner.clearStop()
    import java.time.LocalDateTime
    var clock = LocalDateTime.of(2026, 1, 1, 0, 0, 30)
    val slept = Seq.newBuilder[Long]
    val calls = new AtomicInteger(0)
    val stages = Seq(Runner.Stage("tick", s => { calls.incrementAndGet(); Seq(1).toDF("x") }))
    val got = Runner.runCron(spark, stages, "*/10 * * * *", iterations = 2,
      now = () => clock,
      sleep = ms => { slept += ms; clock = clock.plusNanos(ms * 1000000L) })
    assert(got.exists(_.size == 2) && calls.get() == 2)
    // 00:00:30 → 00:10 is 570s; 00:10 → 00:20 is 600s
    assert(slept.result() == Seq(570000L, 600000L))
    // invalid pattern is rejected up front, nothing runs
    val bad = Runner.runCron(spark, stages, "61 * * * *", 1)
    assert(bad.isLeft && calls.get() == 2)
    // parse-valid but never-firing pattern stays on the error channel
    val never = Runner.runCron(spark, stages, "0 0 30 2 *", 1, now = () => clock)
    assert(never.left.exists(_.contains("never fires")) && calls.get() == 2)
  }

  test("streaming dispatchSink routes a mixed CDC stream into per-entity tables") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_dispatch").toString
    val input = MemoryStream[(String, Long, String, Long)]
    val stream = input.toDF().toDF("table", "id", "payload", "ver")
    val q = graft.streaming.StreamOps.dispatchSink(
      stream, "table",
      Map("cust" -> ((s"$dir/cust", Seq("id"), 4)),
          "ord" -> ((s"$dir/ord", Seq("id"), 4))),
      checkpoint = s"$dir/ckpt", versionCols = Seq("ver"))
    input.addData(("cust", 1L, "a", 1L), ("ord", 1L, "x", 1L), ("zzz", 9L, "ignored", 1L))
    q.processAllAvailable()
    input.addData(("cust", 1L, "a2", 2L), ("ord", 2L, "y", 1L))
    q.processAllAvailable()
    q.stop()
    val cust = graft.sinks.KeyedParquetSink.read(spark, s"$dir/cust")
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    val ord = graft.sinks.KeyedParquetSink.read(spark, s"$dir/ord")
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(cust == Seq((1L, "a2", 2L)))                    // last write wins
    assert(ord == Seq((1L, "x", 1L), (2L, "y", 1L)))       // routed separately
    // the unconfigured 'zzz' row went nowhere
    assert(!new java.io.File(s"$dir/zzz").exists())
  }

  test("streaming upsertSink converges the keyed table across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_supsert").toString
    val input = MemoryStream[(Long, String, Long)]
    val stream = input.toDF().toDF("id", "payload", "ver")
    val q = graft.streaming.StreamOps.upsertSink(
      stream, s"$dir/table", Seq("id"), numBuckets = 4,
      checkpoint = s"$dir/ckpt", versionCols = Seq("ver"))
    input.addData((1L, "a", 1L), (2L, "b", 1L))
    q.processAllAvailable()
    input.addData((2L, "b2", 2L), (3L, "c", 1L))
    q.processAllAvailable()
    q.stop()
    val got = graft.sinks.KeyedParquetSink.read(spark, s"$dir/table")
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a", 1L), (2L, "b2", 2L), (3L, "c", 1L)))
  }
}
