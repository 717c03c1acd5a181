package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class Round11wSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("events_haar_energy: Parseval-style accounting holds per type") {
    val rows = run("events_haar_energy").collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (t, rs) =>
      val lv = rs.map(r => r.getAs[Long]("level") ->
        ((r.getAs[Long]("n_coeffs"), r.getAs[Long]("energy")))).toMap
      assert(lv.keySet == Set(0L, 1L, 2L, 3L), s"$t has all levels")
      // un-normalized Haar: coefficient counts halve per level
      assert(lv(2L)._1 <= lv(1L)._1 && lv(3L)._1 <= lv(2L)._1)
      lv.values.foreach { case (_, e) => assert(e >= 0) }
      // the daily series is non-degenerate on the fixture: some level
      // carries energy
      assert(lv.values.map(_._2).sum > 0)
    }
  }

  test("etl_cascade_impact: cascade counts consistent with direct recounts") {
    val rows = run("etl_cascade_impact").collect()
      .map(r => r.getAs[String]("table") ->
        ((r.getAs[Long]("n_deleted"), r.getAs[Long]("n_total"),
          r.getAs[Long]("share_bp")))).toMap
    assert(rows.keySet == Set("customer", "orders", "lineitem"))
    val doomed = graft.sources.Tables.customer(spark, TestSpark.sf)
      .where(col("c_custkey") % 97 === 0).count()
    assert(rows("customer")._1 == doomed)
    rows.values.foreach { case (d, t, bp) =>
      assert(d <= t && bp == d * 10000 / t)
    }
    // the cascade can only grow DOWN the FK chain on row counts when
    // fan-out >= 1; at minimum lineitem deletions >= order deletions
    // only if every order has lines — assert the weaker subset bound
    assert(rows("orders")._1 >= 0 && rows("lineitem")._1 >= 0)
  }
}
