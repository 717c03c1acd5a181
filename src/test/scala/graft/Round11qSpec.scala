package graft

import org.scalatest.funsuite.AnyFunSuite

class Round11qSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("sim_ivf_probe_curve: recall monotone in nprobe, exhaustive anchor at 10000") {
    val rows = run("sim_ivf_probe_curve").collect()
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq == Seq(1L, 2L, 4L, 8L))
    var prev = -1L
    rows.foreach { r =>
      assert(r.getAs[Long]("k_exact") == 10)
      assert(r.getAs[Long]("hits") <= r.getAs[Long]("k_exact"))
      val rec = r.getAs[Long]("recall_bp")
      assert(rec >= prev, "more probes can only add candidates")
      prev = rec
    }
    // nprobe = 8 probes every cell: the search IS brute force
    assert(rows.last.getAs[Long]("recall_bp") == 10000L)
  }

  test("sim_graph_search: 4-hop trace over real graph nodes") {
    val rows = run("sim_graph_search").collect()
    assert(rows.map(_.getAs[Long]("hop")).toSeq == Seq(0L, 1L, 2L, 3L))
    rows.foreach { r =>
      val c = r.getAs[Long]("qcos")
      assert(c >= -10000 && c <= 10000)
    }
    // hop 1 must strictly be a neighbor choice, not the start repeated
    // (the mutual-kNN graph has no self loops)
    assert(rows(1).getAs[Long]("node") != rows(0).getAs[Long]("node"))
  }

  test("etl_double_orders: groups really have >=2 same-day orders") {
    val rows = run("etl_double_orders").collect()
    assert(rows.nonEmpty, "fixture has same-day multi-order customers")
    rows.foreach { r =>
      val (n, lo, hi) = (r.getAs[Long]("n_orders"),
        r.getAs[Long]("min_cents"), r.getAs[Long]("max_cents"))
      assert(n >= 2 && lo <= hi)
      assert(r.getAs[Long]("cents_total") >= lo + hi - 1)
      assert(r.getAs[Long]("tight_amounts") ==
        (if ((hi - lo) * 100 <= hi) 1L else 0L))
    }
  }
}
