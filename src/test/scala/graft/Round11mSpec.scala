package graft

import org.scalatest.funsuite.AnyFunSuite

class Round11mSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("dedup_bbit_sweep: error falls as b grows; full row is the floor") {
    val rows = run("dedup_bbit_sweep").collect()
      .map(r => r.getAs[Long]("b") ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("mean_err_bp"),
          r.getAs[Long]("max_err_bp"), r.getAs[Long]("sum_err_bp")))).toMap
    assert(rows.keySet == Set(1L, 2L, 4L, 8L, 128L))
    val n = rows.values.map(_._1).toSet
    assert(n.size == 1, "every b judges the same candidate-pair set")
    rows.foreach { case (_, (np, mean, mx, sm)) =>
      assert(mean == sm / np)
      assert(mx >= mean)
    }
    // the 1-bit estimator cannot beat the full signature on average
    assert(rows(1L)._2 >= rows(128L)._2,
      s"b=1 mean err ${rows(1L)._2} < full ${rows(128L)._2}")
  }

  test("events_forecast_backtest: paired eval set, winner consistent") {
    val rows = run("events_forecast_backtest").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, sn, ss) = (r.getAs[Long]("n_eval"),
        r.getAs[Long]("sae_naive"), r.getAs[Long]("sae_seasonal"))
      assert(n > 0)
      val w = r.getAs[String]("winner")
      if (sn < ss) assert(w == "naive")
      else if (ss < sn) assert(w == "seasonal")
      else assert(w == "tie")
      assert(r.getAs[Long]("mean_ae_naive_milli") == sn * 1000 / n)
      assert(r.getAs[Long]("mean_ae_seasonal_milli") == ss * 1000 / n)
    }
  }
}
