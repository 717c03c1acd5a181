package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class Round11pSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("events_ab_srm: arms partition the users, statistic exact") {
    val r = run("events_ab_srm").collect()
    assert(r.length == 1)
    val row = r.head
    val (na, nb) = (row.getAs[Long]("n_a"), row.getAs[Long]("n_b"))
    val users = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("user_id").isNotNull)
      .select(col("user_id")).distinct().count()
    assert(na + nb == users)
    assert(row.getAs[Long]("delta") == na - nb)
    val chi2 = (na - nb) * (na - nb) * 1000 / (na + nb)
    assert(row.getAs[Long]("chi2_milli") == chi2)
    assert(row.getAs[Long]("srm_flag") == (if (chi2 > 3841) 1L else 0L))
  }

  test("graph_jaccard_linkpred: jaccard bounded and consistent with degrees") {
    val rows = run("graph_jaccard_linkpred").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    var prev = Long.MaxValue
    rows.foreach { r =>
      val (i, d1, d2, j) = (r.getAs[Long]("inter"), r.getAs[Long]("d1"),
        r.getAs[Long]("d2"), r.getAs[Long]("jaccard_bp"))
      assert(i >= 1 && i <= math.min(d1, d2))
      assert(j == i * 10000 / (d1 + d2 - i))
      assert(j <= 10000 && j <= prev)
      prev = j
    }
  }

  test("etl_order_totals_audit: bands partition the order set") {
    val rows = run("etl_order_totals_audit").collect()
    val orders = graft.sources.Tables.orders(spark, TestSpark.sf).count()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == orders)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_diff_cents") <= r.getAs[Long]("abs_diff_cents"))
    }
  }
}
