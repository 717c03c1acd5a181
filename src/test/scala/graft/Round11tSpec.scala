package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class Round11tSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("q_histogram_2d: cells partition the table, grid bounded") {
    val rows = run("q_histogram_2d").collect()
    assert(rows.length <= 5 * 26)
    val total = graft.sources.Tables.lineitem(spark, TestSpark.sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Long]("qty_bin") >= 0 && r.getAs[Long]("disc_bin") >= 0)
    }
  }

  test("events_markov_entropy: zero-fanout states carry zero entropy") {
    val rows = run("events_markov_entropy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (k, cb) = (r.getAs[Long]("n_targets"), r.getAs[Long]("ent_cb"))
      assert(cb >= 0)
      if (k == 1) assert(cb == 0, "a single-target state is fully determined")
      // ilog2 surrogate is bounded by log2 of the fan-out ceiling
      assert(cb <= 100L * (64 - java.lang.Long.numberOfLeadingZeros(
        r.getAs[Long]("n_trans"))))
    }
  }

  test("events_revenue_hhi: bounds and identities") {
    val r = run("events_revenue_hhi").collect()
    assert(r.length == 1)
    val row = r.head
    val (n, top, hhi) = (row.getAs[Long]("n_users"),
      row.getAs[Long]("top_share_bp"), row.getAs[Long]("hhi_bp"))
    assert(n > 0 && top <= 10000)
    // HHI at least the top user's squared share, at most 10000
    assert(hhi >= top * top / 10000 && hhi <= 10000)
    // atomized corpus floor: HHI >= 10^8/n (truncation-adjusted, loose)
    assert(hhi >= 10000 / n - 1)
  }
}
