package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Boundary pins for the round-10 operators on hand-computable
  * fixtures: the as-of tolerance EXACTLY at the cutoff, forward joins
  * with no following match, degenerate survival lifespans, an exact
  * cross-source dup matrix, and the single-symbol BPE corpus where no
  * merge is learnable (both engines collapse to empty identically). */
class Round10EdgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** sf0.001 tables with `events` replaced by the boundary feed. */
  private lazy val evDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-r10-ev").toString
    val src = java.nio.file.Paths.get(TestSpark.sf)
    java.nio.file.Files.list(src).forEach { p =>
      if (p.getFileName.toString != "events.parquet")
        java.nio.file.Files.copy(p, java.nio.file.Paths.get(dir, p.getFileName.toString))
    }
    Seq(
      // u1: purchase→error gap EXACTLY 3600 s (kept by <= 3600)
      (10L, Some(ts("2024-03-01 10:00:00")), 1L, "purchase", Some(5.0), "{}"),
      (11L, Some(ts("2024-03-01 11:00:00")), 1L, "error", Some(1.0), "{}"),
      // u2: gap 3601 s (tolerance rejects; forward still matches)
      (20L, Some(ts("2024-03-01 10:00:00")), 2L, "purchase", Some(7.0), "{}"),
      (21L, Some(ts("2024-03-01 11:00:01")), 2L, "error", Some(1.0), "{}"),
      // u3: error with no purchase at all
      (30L, Some(ts("2024-03-01 10:00:00")), 3L, "error", Some(1.0), "{}"),
      // u4: the NEAREST prior purchase has NULL value — the tolerance
      // match source excludes it, so the match must skip back to the
      // valued one at 09:00 (2700 s)
      (40L, Some(ts("2024-03-01 09:00:00")), 4L, "purchase", Some(2.0), "{}"),
      (41L, Some(ts("2024-03-01 09:30:00")), 4L, "purchase", None: Option[Double], "{}"),
      (42L, Some(ts("2024-03-01 09:45:00")), 4L, "error", Some(1.0), "{}"),
      // u5: 3-day lifespan via neutral 'view' events
      (50L, Some(ts("2024-03-01 08:00:00")), 5L, "view", Some(1.0), "{}"),
      (51L, Some(ts("2024-03-04 08:00:00")), 5L, "view", Some(1.0), "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    dir
  }

  test("q_asof_tolerance: the 3600 s boundary is inclusive, 3601 s is stale") {
    val got = SparkEntry.queries("q_asof_tolerance")(spark, evDir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((Option(r.getAs[java.lang.Double]("prev_purchase")),
          Option(r.getAs[java.lang.Long]("stale_s"))))).toMap
    assert(got(11L) == ((Some(5.0), Some(3600L))), "exactly-at-cutoff kept")
    assert(got(21L) == ((None, Some(3601L))), "one second past cutoff rejected")
    assert(got(30L) == ((None, None)), "no purchase at all")
    assert(got(42L) == ((Some(2.0), Some(2700L))),
      "the NULL-value purchase in between is skipped, not matched")
  }

  test("q_asof_forward: unmatched purchases stay null, forward has no tolerance") {
    val got = SparkEntry.queries("q_asof_forward")(spark, evDir).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((Option(r.getAs[java.lang.Long]("next_err_id")),
          Option(r.getAs[java.lang.Long]("latency_s"))))).toMap
    assert(got(10L) == ((Some(11L), Some(3600L))))
    assert(got(20L) == ((Some(21L), Some(3601L))), "forward is unbounded")
    assert(got(40L) == ((Some(42L), Some(2700L))))
    assert(got(41L) == ((Some(42L), Some(900L))),
      "forward ignores value entirely — the NULL-value purchase is a row like any")
    assert(!got.contains(30L), "errors are not emitted rows")
  }

  test("events_survival: degenerate same-day users plus one 3-day lifespan") {
    val got = SparkEntry.queries("events_survival")(spark, evDir).collect()
      .map(r => (r.getAs[Long]("lifespan_d"), r.getAs[Long]("n_end"),
        r.getAs[Long]("n_surviving"))).sortBy(_._1).toSeq
    assert(got == Seq((0L, 4L, 5L), (3L, 1L, 1L)))
  }

  /** sf0.001 tables with `documents` replaced by the matrix fixture. */
  private lazy val docDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-r10-doc").toString
    val src = java.nio.file.Paths.get(TestSpark.sf)
    java.nio.file.Files.list(src).forEach { p =>
      if (p.getFileName.toString != "documents.parquet")
        java.nio.file.Files.copy(p, java.nio.file.Paths.get(dir, p.getFileName.toString))
    }
    Seq(
      (1L, "a b c d e f g h i j", "en", "crawlX", 19L),
      (2L, "a b c d e f g h i j", "en", "crawlY", 19L), // exact dup of 1
      (3L, "a b c d e f g h i k", "en", "crawlX", 19L), // 7/9 trigrams vs 1
      (4L, "z y x w v u t s r q", "en", "crawlY", 19L)) // unrelated
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("dedup_source_matrix: exact cells on a hand-built two-source corpus") {
    // pairs at trigram-Jaccard >= 0.5: (1,2) j=1.0 cross, (1,3) j=7/9
    // within X, (2,3) j=7/9 cross; doc 4 pairs with nothing
    val got = SparkEntry.queries("dedup_source_matrix")(spark, docDir)
      .collect().map(r => (r.getAs[String]("sa"), r.getAs[String]("sb")) ->
        r.getAs[Long]("n_pairs")).toMap
    assert(got == Map(("crawlX", "crawlX") -> 1L, ("crawlX", "crawlY") -> 2L))
  }

  test("text_bpe_train collapses to no merges on a single-symbol corpus, both engines") {
    // every word is one char: no adjacent symbol pairs exist, the top-1
    // frame is empty, and the fuse cross-join collapses the table — the
    // oracle's chained CTEs do the identical thing, so the gate-checked
    // contract is 'no merges learnable → empty output', not a crash
    val dir = java.nio.file.Files.createTempDirectory("graft-r10-bpe").toString
    val src = java.nio.file.Paths.get(TestSpark.sf)
    java.nio.file.Files.list(src).forEach { p =>
      if (p.getFileName.toString != "documents.parquet")
        java.nio.file.Files.copy(p, java.nio.file.Paths.get(dir, p.getFileName.toString))
    }
    Seq((1L, "a b c a b", "en", "s", 9L), (2L, "x y", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    assert(SparkEntry.queries("text_bpe_train")(spark, dir).count() == 0)
  }
}
