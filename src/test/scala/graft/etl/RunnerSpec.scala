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
