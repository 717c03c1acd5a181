package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class Round11oSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("etl_subject_access: every requested key answered, totals reconcile") {
    val rows = run("etl_subject_access").collect()
    val subjects = graft.sources.Tables.customer(spark, TestSpark.sf)
      .where(col("c_custkey") % 500 === 7).count()
    assert(rows.length.toLong == subjects, "one response row per request")
    rows.foreach { r =>
      val (no, nl) = (r.getAs[Long]("n_orders"), r.getAs[Long]("n_lines"))
      if (no == 0) {
        assert(nl == 0 && r.getAs[Long]("cents_total") == 0)
        assert(r.getAs[String]("first_order") == null)
      } else {
        assert(nl >= no, "every order ships at least one line in TPC-H data")
        assert(r.getAs[String]("first_order") <= r.getAs[String]("last_order"))
      }
    }
  }

  test("corpus_strata_alloc: allocations bounded by the budget") {
    val rows = run("corpus_strata_alloc").collect()
    assert(rows.nonEmpty)
    def tot(c: String) = rows.map(_.getAs[Long](c)).sum
    // truncating allocations never exceed the budget, and lose less
    // than one unit per stratum
    Seq("alloc_prop", "alloc_equal", "alloc_sqrt").foreach { c =>
      assert(tot(c) <= 1000 && tot(c) > 1000 - rows.length,
        s"$c sums to ${tot(c)}")
    }
    // sqrt allocation sits between equal and proportional for the
    // largest stratum (the skew-softening property)
    val largest = rows.maxBy(_.getAs[Long]("n_docs"))
    assert(largest.getAs[Long]("alloc_sqrt") <= largest.getAs[Long]("alloc_prop"))
    assert(largest.getAs[Long]("alloc_sqrt") >= largest.getAs[Long]("alloc_equal"))
  }

  test("sim_power_convergence: cos2 in range, dims counted") {
    val r = run("sim_power_convergence").collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("d") == 64)
    val cos2 = row.getAs[Long]("cos2_bp")
    assert(cos2 >= 0 && cos2 <= 10001, s"cos2_bp $cos2 out of range")
    assert(row.getAs[Long]("sign_agree") <= 64)
  }
}
