package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class Round11xSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("etl_pk_audit: one row per table, duplicates consistent") {
    val rows = run("etl_pk_audit").collect()
    assert(rows.map(_.getAs[String]("table")).toSeq ==
      Seq("customer", "lineitem", "nation", "orders", "part", "region",
        "supplier"))
    rows.foreach { r =>
      val (n, k, d) = (r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"),
        r.getAs[Long]("n_dup_rows"))
      assert(k <= n && d == n - k)
      assert(r.getAs[Long]("unique_pk") == (if (d == 0) 1L else 0L))
    }
  }

  test("text_heaps_curve: cumulative vocab monotone and totals reconcile") {
    val rows = run("text_heaps_curve").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    var prevV = 0L; var prevT = 0L
    rows.foreach { r =>
      val (cv, ct) = (r.getAs[Long]("cum_vocab"), r.getAs[Long]("cum_tokens"))
      assert(cv >= prevV && ct >= prevT)
      prevV = cv; prevT = ct
    }
    // final cumulative vocab is the corpus vocabulary
    val vocab = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(explode(split(trim(col("text")), " ")).as("tok"))
      .where(length(col("tok")) > 0)
      .select(col("tok")).distinct().count()
    assert(rows.last.getAs[Long]("cum_vocab") == vocab)
    // the fixed synthetic vocabulary saturates early: the last decile
    // teaches nothing new
    assert(rows.last.getAs[Long]("new_types") * 10 <
      rows.head.getAs[Long]("new_types") + 10)
  }
}
