package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class Round11iSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("etl_zonemap_prune: zone verdicts are sound (no skipped block holds a match)") {
    val rows = run("etl_zonemap_prune").collect()
    assert(rows.map(_.getAs[String]("pred")).toSet ==
      Set("ship_ge_1998", "ship_lt_1996", "qty_ge_45", "qty_lt_5"))
    val nBlocks = rows.map(_.getAs[Long]("n_blocks")).toSet
    assert(nBlocks.size == 1, "every predicate judges the same block set")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_skipped") <= r.getAs[Long]("n_blocks"))
      assert(r.getAs[Long]("rows_skipped") <= r.getAs[Long]("rows_total"))
    }
    // soundness: a min/max-skipped block can hold no matching row, so
    // matches + skipped rows can never exceed the table
    val li = graft.sources.Tables.lineitem(spark, TestSpark.sf)
      .select(graft.queries.idiv(col("l_shipdate").cast("long"),
          lit(86400L)).as("sd"),
        col("l_quantity").cast("long").as("qty"))
      .localCheckpoint(true)
    val total = li.count()
    val matches = Map(
      "ship_ge_1998" -> li.where(col("sd") >= 10227L).count(),
      "ship_lt_1996" -> li.where(col("sd") < 9496L).count(),
      "qty_ge_45" -> li.where(col("qty") >= 45L).count(),
      "qty_lt_5" -> li.where(col("qty") < 5L).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("rows_total") == total)
      assert(matches(r.getAs[String]("pred")) + r.getAs[Long]("rows_skipped")
        <= total, s"${r.getAs[String]("pred")}: skipped a matching row")
    }
    // the quantity predicates must prune nothing under orderkey layout
    // (quantity is uniform per block) — the clustering lesson the audit
    // exists to surface
    rows.filter(_.getAs[String]("pred").startsWith("qty")).foreach { r =>
      assert(r.getAs[Long]("n_skipped") == 0L)
    }
  }

  test("etl_feature_staleness: bands partition the label set") {
    val rows = run("etl_feature_staleness").collect()
    val labels = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_labels")).sum == labels)
    rows.foreach { r =>
      val band = r.getAs[String]("band")
      val (lo, hi) = (r.getAs[java.lang.Long]("min_stale_s"),
        r.getAs[java.lang.Long]("max_stale_s"))
      band match {
        case "4_missing" => assert(lo == null && hi == null)
        case "0_1m" => assert(lo >= 0L && hi <= 60L)
        case "1_1h" => assert(lo > 60L && hi <= 3600L)
        case "2_1d" => assert(lo > 3600L && hi <= 86400L)
        case "3_older" => assert(lo > 86400L)
      }
    }
  }
}
