package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Degenerate-input robustness for the events_* analytics family: every
  * registered events operator must execute cleanly over a corpus that
  * mixes NULL timestamps, single-event users, and all-tied timestamps —
  * the exact edge that broke events_interarrival on round-6 driver data
  * (NULL ts ordered NULLS FIRST by Spark, NULLS LAST by DuckDB, shifting
  * every lag neighbor). At 100 TB a feed with late/null event times or a
  * burst of identical timestamps is routine, not exceptional.
  */
class EventsEdgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** sf0.001 tables with events REPLACED by the degenerate fixture:
    *  - user 1: a single event (no gaps, no lag neighbor)
    *  - user 2: four events ALL at the same instant (every gap ties at 0)
    *  - user 3: real events interleaved with NULL-ts rows
    *  - user 4: a normal two-day spread (the control)
    * Built once; every events_* query runs against this directory. */
  private lazy val edgeDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-events-edge").toString
    // non-events tables come from sf0.001 unchanged (some queries join
    // nothing else, but constructing each query must never throw on a
    // missing sibling table)
    val src = java.nio.file.Paths.get(TestSpark.sf)
    java.nio.file.Files.list(src).forEach { p =>
      if (p.getFileName.toString != "events.parquet")
        java.nio.file.Files.copy(p, java.nio.file.Paths.get(dir, p.getFileName.toString))
    }
    val rows = Seq(
      // (event_id, ts, user_id, event_type, value, props)
      (1L, Some(ts("2024-03-01 10:00:00")), 1L, "purchase", 10.0, "{}"),
      (2L, Some(ts("2024-03-01 10:00:00")), 2L, "view", 1.0, "{}"),
      (3L, Some(ts("2024-03-01 10:00:00")), 2L, "cart", 2.0, "{}"),
      (4L, Some(ts("2024-03-01 10:00:00")), 2L, "purchase", 3.0, "{}"),
      (5L, Some(ts("2024-03-01 10:00:00")), 2L, "view", 4.0, "{}"),
      (6L, None, 3L, "view", 5.0, "{}"),
      (7L, Some(ts("2024-03-01 09:00:00")), 3L, "view", 6.0, "{}"),
      (8L, None, 3L, "purchase", 7.0, "{}"),
      (9L, Some(ts("2024-03-01 09:30:00")), 3L, "purchase", 8.0, "{}"),
      (10L, Some(ts("2024-03-01 08:00:00")), 4L, "view", 1.5, "{}"),
      (11L, Some(ts("2024-03-02 08:00:00")), 4L, "purchase", 2.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    rows.coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  SparkEntry.queries.keys.filter(_.startsWith("events_")).toSeq.sorted.foreach { name =>
    test(s"$name executes over NULL-ts / single-event / all-tied events") {
      val df = SparkEntry.queries(name)(spark, edgeDir)
      assert(df.columns.nonEmpty)
      df.count() // force full execution — must not throw
    }
  }

  test("events_interarrival drops NULL-ts rows and ties gap at zero") {
    val out = SparkEntry.queries("events_interarrival")(spark, edgeDir)
      .select($"user_id", $"n_gaps", $"min_gap_s", $"max_gap_s", $"median_gap_s")
      .as[(Long, Long, Long, Long, Long)].collect().toMap2
    // user 1: single event → no gaps → absent
    assert(!out.contains(1L))
    // user 2: 4 tied events → 3 gaps, all exactly 0
    assert(out(2L) == ((3L, 0L, 0L, 0L)))
    // user 3: NULL-ts rows are excluded BEFORE the lag window → exactly
    // one gap (09:00 → 09:30 = 1800 s), not three
    assert(out(3L) == ((1L, 1800L, 1800L, 1800L)))
    // user 4: the control — one 86400 s gap
    assert(out(4L) == ((1L, 86400L, 86400L, 86400L)))
  }

  test("events_rfm segments stay deterministic on tied/NULL-ts users") {
    val out = SparkEntry.queries("events_rfm")(spark, edgeDir)
      .select($"user_id", $"frequency", $"monetary_cents", $"segment")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // 10.00 => exactly 1000 cents; below the 10000-cent champion bar,
    // recency 1 day => active
    assert(out(1L) == ((1L, 1000L, "active")))
    // tied-instant user: ONE purchase of 3.00 despite 4 simultaneous events
    assert(out(2L) == ((1L, 300L, "active")))
    // NULL-ts purchase still counts toward frequency and cents (rfm does
    // not order by ts, so null timestamps must not drop rows)
    assert(out(3L) == ((2L, 1500L, "active")))
    assert(out(4L) == ((1L, 250L, "active")))
  }

  test("q_gaps_islands merges consecutive days and drops NULL-ts rows") {
    val out = SparkEntry.queries("q_gaps_islands")(spark, edgeDir)
      .select($"user_id", $"active_days", $"n_streaks", $"longest_streak")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // 4 tied-instant events are still ONE active day / one streak
    assert(out(2L) == ((1L, 1L, 1L)))
    // NULL-ts rows contribute no days; both real events fall on 03-01
    assert(out(3L) == ((1L, 1L, 1L)))
    // two CONSECUTIVE days merge into a single length-2 streak
    assert(out(4L) == ((2L, 1L, 2L)))
  }

  test("events_drawdown: non-negative values never draw down; NULL ts excluded") {
    val out = SparkEntry.queries("events_drawdown")(spark, edgeDir)
      .select($"user_id", $"n_events", $"max_drawdown_cents", $"total_cents")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // all fixture values are positive -> the running sum never decreases
    out.values.foreach { case (_, dd, _) => assert(dd == 0L) }
    // user 3's two NULL-ts rows (5.0 + 7.0) are excluded from the cents
    assert(out(3L) == ((2L, 0L, 1400L)))
    // tied instants still accumulate all four events
    assert(out(2L) == ((4L, 0L, 1000L)))
  }

  test("events_sliding_users covers exactly the observed hours") {
    val rows = SparkEntry.queries("events_sliding_users")(spark, edgeDir)
      .select($"sh", $"n_users").as[(Long, Long)].collect().toMap
    // observed hours: 03-01 08/09/10 and 03-02 08 (NULL ts contribute none)
    assert(rows.size == 4)
    // by 03-01 10:00 the trailing 24 h has seen every user with a real ts
    assert(rows.values.max == 4L)
  }

  private implicit class Map2[A, B, C, D, E](rows: Array[(A, B, C, D, E)]) {
    def toMap2: Map[A, (B, C, D, E)] = rows.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
  }
}
