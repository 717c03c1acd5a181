package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class Round11uSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("sim_rq_encode: stage 2 never worsens distortion; cells cover the corpus") {
    val rows = run("sim_rq_encode").collect()
    assert(rows.nonEmpty && rows.length <= 8)
    val total = graft.sources.Tables.embeddings(spark, TestSpark.sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    var d1s = 0L; var d2s = 0L
    rows.foreach { r =>
      val (d1, d2) = (r.getAs[Long]("d1_total"), r.getAs[Long]("d2_total"))
      assert(d2 <= d1,
        "argmin over a codebook containing 0 cannot exceed the residual norm")
      d1s += d1; d2s += d2
    }
    assert(d2s < d1s, "stage 2 strictly refines on the fixture")
  }

  test("events_value_tail: survival curve is monotone on the doubling grid") {
    val rows = run("events_value_tail").collect()
    assert(rows.nonEmpty)
    var prevN = Long.MaxValue
    rows.foreach { r =>
      assert(r.getAs[Long]("thr") == (1L << r.getAs[Long]("k").toInt))
      val n = r.getAs[Long]("n_exceed")
      assert(n <= prevN, "higher threshold cannot pass more events")
      prevN = n
      assert(r.getAs[Long]("cents_tail") >= n * r.getAs[Long]("thr"))
    }
    // k = 0 (threshold 1 cent) counts every positive-cents event
    val all = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("value").isNotNull &&
        round(col("value") * 100).cast("long") > 0).count()
    assert(rows.head.getAs[Long]("n_exceed") == all)
  }
}
