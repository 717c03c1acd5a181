package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class Round11rSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("etl_delta_compress: kept transitions bounded by raw, totals reconcile") {
    val rows = run("etl_delta_compress").collect()
    val total = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("ts").isNotNull && col("user_id").isNotNull).count()
    assert(rows.map(_.getAs[Long]("n_raw")).sum == total)
    rows.foreach { r =>
      val (raw, kept) = (r.getAs[Long]("n_raw"), r.getAs[Long]("n_kept"))
      assert(kept >= 1 && kept <= raw)
      assert(r.getAs[Long]("keep_bp") == kept * 10000 / raw)
    }
  }

  test("etl_scd2_asof: exactly one valid version per active user") {
    val rows = run("etl_scd2_asof").collect()
    assert(rows.nonEmpty)
    val users = rows.map(_.getAs[Long]("user_id"))
    assert(users.distinct.length == users.length,
      "as-of returns at most one version per user")
    rows.foreach { r =>
      assert(r.getAs[String]("valid_from") <= "2024-01-15 00:00:00")
      assert(r.getAs[String]("valid_to") > "2024-01-15 00:00:00")
    }
    // every user with activity before T has a valid version
    val active = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("user_id").isNotNull && col("ts").isNotNull &&
        col("ts").cast("string") <= "2024-01-15 00:00:00")
      .select(col("user_id")).distinct().count()
    assert(users.length.toLong == active)
  }

  test("text_backoff_coverage: orders partition the held-out bigrams") {
    val rows = run("text_backoff_coverage").collect()
    val orders = rows.map(_.getAs[Long]("order")).toSet
    assert(orders.subsetOf(Set(0L, 1L, 2L)) && orders.contains(2L),
      "the shared fixed vocab makes order-2 coverage non-empty")
    val total = rows.map(_.getAs[Long]("n_bigrams")).sum
    val shares = rows.map(_.getAs[Long]("share_bp")).sum
    assert(shares > 10000 - rows.length && shares <= 10000)
    // order-2 dominates on this single-vocabulary corpus
    val o2 = rows.find(_.getAs[Long]("order") == 2L).get.getAs[Long]("n_bigrams")
    assert(o2 * 2 > total)
  }
}
