package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class Round11lSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("etl_watermark_tradeoff: drops decrease monotonically with delay") {
    val rows = run("etl_watermark_tradeoff").collect()
    assert(rows.map(_.getAs[Long]("delay_s")).toSeq ==
      Seq(0L, 60L, 3600L, 86400L))
    val total = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("ts").isNotNull).count()
    var prevDrop = Long.MaxValue
    rows.foreach { r =>
      assert(r.getAs[Long]("n_events") == total)
      val d = r.getAs[Long]("n_dropped")
      assert(d <= prevDrop, "longer watermark can only drop fewer events")
      prevDrop = d
      assert(r.getAs[Long]("drop_bp") == d * 10000 / total)
      val mx = r.getAs[java.lang.Long]("max_dropped_late_s")
      if (d == 0) assert(mx == null)
      else assert(mx > r.getAs[Long]("delay_s"))
    }
  }

  test("graph_pagerank_residual: residuals contract across iterations") {
    val rows = run("graph_pagerank_residual").collect()
    assert(rows.map(_.getAs[Long]("iter")).toSeq == Seq(1L, 2L, 3L))
    val n = rows.map(_.getAs[Long]("n_nodes")).toSet
    assert(n.size == 1 && n.head > 0, "one shared node set across iterations")
    val l1s = rows.map(_.getAs[Long]("l1_residual"))
    assert(l1s.zip(l1s.tail).forall { case (a, b) => b <= a },
      s"L1 residuals must fall monotonically: ${l1s.mkString(",")}")
    rows.foreach { r =>
      assert(r.getAs[Long]("linf_residual") <= r.getAs[Long]("l1_residual"))
    }
  }
}
