package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class Round11vSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("events_hte_bands: band x arm cells cover every pre-active user") {
    val rows = run("events_hte_bands").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(Set(0L, 1L)(r.getAs[Long]("arm")))
      assert(r.getAs[Long]("band") >= 0)
      assert(r.getAs[Long]("mean_cents") ==
        r.getAs[Long]("cents") / r.getAs[Long]("n_users"))
    }
    val cells = rows.map(r => (r.getAs[Long]("band"), r.getAs[Long]("arm")))
    assert(cells.distinct.length == cells.length)
  }

  test("sim_ood_bands: every vector banded once; seeds land in band 0") {
    val rows = run("sim_ood_bands").collect()
    val total = graft.sources.Tables.embeddings(spark, TestSpark.sf).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == total)
    // the 8 seed vectors are distance 0 from themselves
    assert(rows.head.getAs[Long]("band") == 0L &&
      rows.head.getAs[Long]("n_vecs") >= 8L)
  }

  test("events_load_factor: peak at least the mean") {
    val rows = run("events_load_factor").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("peak_day") >= r.getAs[Long]("mean_day"))
      assert(r.getAs[Long]("load_factor_bp") >= 10000L)
      assert(r.getAs[Long]("mean_day") ==
        r.getAs[Long]("n_total") / r.getAs[Long]("n_days"))
    }
  }
}
