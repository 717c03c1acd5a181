package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Degenerate-input robustness for the etl_* family: every registered
  * etl operator must execute cleanly over a feed that mixes NULL
  * timestamps, out-of-order arrivals, and duplicate event ids — the
  * conditions a real CDC/changelog feed produces during replays and
  * clock skew. The events fixture is shared in spirit with
  * EventsEdgeSpec; this suite drives the ETL family and pins the
  * late-arrival audit's exact bands on a hand-computable feed.
  */
class EtlEdgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** sf0.001 tables with events replaced:
    *  - 'click': strictly increasing event times (all on time)
    *  - 'view': one 90 s and one 2 h regression in arrival order
    *  - 'error': NULL-ts rows interleaved (must be excluded, not crash)
    *  - duplicate event_id 20 (replayed delivery) in 'click'
    */
  private lazy val edgeDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-etl-edge").toString
    val src = java.nio.file.Paths.get(TestSpark.sf)
    java.nio.file.Files.list(src).forEach { p =>
      if (p.getFileName.toString != "events.parquet")
        java.nio.file.Files.copy(p, java.nio.file.Paths.get(dir, p.getFileName.toString))
    }
    val rows = Seq(
      (10L, Some(ts("2024-03-01 10:00:00")), 1L, "click", 1.0, "{}"),
      (20L, Some(ts("2024-03-01 10:05:00")), 1L, "click", 2.0, "{}"),
      (20L, Some(ts("2024-03-01 10:05:00")), 1L, "click", 2.0, "{}"), // replay
      (30L, Some(ts("2024-03-01 10:10:00")), 2L, "click", 3.0, "{}"),
      (40L, Some(ts("2024-03-01 11:00:00")), 2L, "view", 1.0, "{}"),
      (41L, Some(ts("2024-03-01 10:58:30")), 2L, "view", 1.0, "{}"), // 90 s late
      (42L, Some(ts("2024-03-01 11:30:00")), 3L, "view", 1.0, "{}"),
      (43L, Some(ts("2024-03-01 09:30:00")), 3L, "view", 1.0, "{}"), // 2 h late
      (50L, None, 4L, "error", 1.0, "{}"),
      (51L, Some(ts("2024-03-01 12:00:00")), 4L, "error", 1.0, "{}"),
      (52L, None, 4L, "error", 1.0, "{}"))
      .map { case (id, t, u, e, v, p) => (id, t, u, e, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  SparkEntry.queries.keys.filter(_.startsWith("etl_")).toSeq.sorted.foreach { name =>
    test(s"$name executes over NULL-ts / out-of-order / replayed events") {
      val df = SparkEntry.queries(name)(spark, edgeDir)
      assert(df.columns.nonEmpty)
      df.count() // force full execution — must not throw
    }
  }

  test("etl_late_arrivals bands the hand-computed lateness exactly") {
    val out = SparkEntry.queries("etl_late_arrivals")(spark, edgeDir)
      .select($"event_type", $"band", $"n", $"max_late_s")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // clicks: 4 arrivals (incl. the replayed id 20 — a replay of the
    // CURRENT max ties at lateness 0, on time by the strict > rule)
    assert(out(("click", "on_time")) == ((4L, 0L)))
    assert(!out.contains(("click", "lt_1m")))
    // views: id 41 is 90 s behind id 40's 11:00 max → lt_1h; id 43 is
    // 7200 s behind id 42's 11:30 max → ge_1h
    assert(out(("view", "on_time")) == ((2L, 0L)))
    assert(out(("view", "lt_1h")) == ((1L, 90L)))
    assert(out(("view", "ge_1h")) == ((1L, 7200L)))
    // errors: NULL-ts rows are excluded entirely — one real arrival
    assert(out(("error", "on_time")) == ((1L, 0L)))
    assert(out.values.map(_._1).sum == 9L, "every non-NULL event lands in one band")
  }

  test("etl_dedup_latest collapses the replayed event id") {
    val out = SparkEntry.queries("etl_dedup_latest")(spark, edgeDir)
    val ids = out.select($"event_id").as[Long].collect()
    assert(ids.length == ids.distinct.length, "replays collapse to one row per id")
  }
}
