package graft

import org.scalatest.funsuite.AnyFunSuite

class Round11jSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("sim_ndcg_audit: NDCG is bounded by recall and ideal DCG is the literal k=10 constant") {
    val r = run("sim_ndcg_audit").collect()
    assert(r.length == 1)
    val row = r.head
    val (k, dcg, ideal, ndcg) = (row.getAs[Long]("k_exact"),
      row.getAs[Long]("dcg_milli"), row.getAs[Long]("ideal_dcg_milli"),
      row.getAs[Long]("ndcg_bp"))
    assert(k == 10)
    // Σ (11-i) * disc(i), i=1..10 with the literal milli discounts
    val disc = Seq(1000L, 630L, 500L, 430L, 386L, 356L, 333L, 315L, 301L, 289L)
    assert(ideal == disc.zipWithIndex.map { case (d, i) => (10L - i) * d }.sum)
    assert(dcg >= 0 && dcg <= ideal, "DCG can never exceed the ideal")
    assert(ndcg == (if (ideal == 0) 0L else dcg * 10000 / ideal))
    assert(ndcg >= 0 && ndcg <= 10000)
  }

  test("sim_mrr_batch: one row per query, reciprocal ranks consistent") {
    val rows = run("sim_mrr_batch").collect()
    assert(rows.map(_.getAs[Long]("qid")).toSeq == (0L to 7L))
    rows.foreach { r =>
      val found = r.getAs[Long]("found")
      val ra = r.getAs[java.lang.Long]("ann_rank")
      val rr = r.getAs[Long]("rr_milli")
      if (found == 1L) {
        assert(ra != null && ra >= 1L && ra <= 10L)
        assert(rr == 1000L / ra)
      } else {
        assert(ra == null && rr == 0L)
      }
      assert(r.getAs[Long]("true_id") >= 8L, "truth comes from the corpus")
    }
  }
}
