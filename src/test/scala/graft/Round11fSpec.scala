package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class Round11fSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("events_cuped: ingredient identities hold; arms partition users") {
    val rows = run("events_cuped").collect()
      .map(r => (r.getAs[Long]("arm"), r.getAs[Long]("n"),
        r.getAs[Long]("s_pre"), r.getAs[Long]("s_post"),
        r.getAs[Long]("s_pre2"), r.getAs[Long]("s_prepost"),
        r.getAs[Long]("theta_num"), r.getAs[Long]("theta_den")))
      .sortBy(_._1)
    assert(rows.map(_._1) sameElements Array(0L, 1L))
    val ev = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("ts").isNotNull && col("user_id").isNotNull)
    assert(rows.map(_._2).sum ==
      ev.select(col("user_id")).distinct().count(),
      "arms partition the user population")
    assert(rows.map(r => r._3 + r._4).sum == ev.count(),
      "pre + post counts account for every event")
    rows.foreach { case (_, n, sp, spost, sp2, sxy, tn, td) =>
      assert(td == n * sp2 - sp * sp, "θ denominator identity")
      assert(td >= 0, "n·Σx² − (Σx)² is a scaled variance — never negative")
      assert(tn == n * sxy - sp * spost, "θ numerator identity")
    }
  }

  test("events_stl_lite: seasonal + residual reconstruct the detrended series") {
    val rows = run("events_stl_lite").collect()
      .map(r => (r.getAs[Long]("dow"), r.getAs[Long]("n_days"),
        r.getAs[Long]("seasonal_milli"), r.getAs[Long]("min_resid"),
        r.getAs[Long]("max_resid"), r.getAs[Long]("sum_abs_resid")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (0L to 6L),
      "all seven days of week present on the fixture span")
    rows.foreach { case (_, nd, _, mn, mx, sa) =>
      assert(nd >= 1)
      assert(mn <= mx)
      // seasonal is the (floor) per-dow mean of detrended, so residuals
      // average in [0, 1) milli — at least one must be ≥ 0
      assert(mx >= 0, "max residual below zero contradicts the floor-mean")
      assert(sa >= mx && sa >= -mn, "Σ|resid| dominates both extremes")
    }
  }
}
