package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class Round11sSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("sim_pq_code_balance: 4 subspaces, identities hold") {
    val rows = run("sim_pq_code_balance").collect()
    assert(rows.map(_.getAs[Int]("sub")).toSeq == Seq(0, 1, 2, 3))
    val nv = rows.map(_.getAs[Long]("n_vecs")).toSet
    assert(nv.size == 1, "every subspace encodes every vector")
    rows.foreach { r =>
      val used = r.getAs[Long]("codes_used")
      assert(used >= 1 && used <= 16)
      assert(r.getAs[Long]("dead_codes") == 16 - used)
      val top = r.getAs[Long]("top_share_bp")
      assert(top >= 10000 / used && top <= 10000)
    }
  }

  test("events_markov_stationary: a probability-ish vector (milli, truncating)") {
    val rows = run("events_markov_stationary").collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("pi_milli")).sum
    // truncating integer recipe loses < 1 milli per type per iteration
    assert(total <= 1000 && total > 1000 - 4 * rows.length,
      s"stationary mass $total out of the expected truncation band")
    rows.foreach(r => assert(r.getAs[Long]("pi_milli") >= 0))
  }

  test("text_auto_stopwords: every listed token really clears the df bar") {
    val rows = run("text_auto_stopwords").collect()
    assert(rows.nonEmpty, "the fixed-vocabulary corpus has high-df tokens")
    val nDocs = graft.sources.Tables.documents(spark, TestSpark.sf).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("df") * 2 > nDocs)
      assert(r.getAs[Long]("df_bp") == r.getAs[Long]("df") * 10000 / nDocs)
    }
  }
}
