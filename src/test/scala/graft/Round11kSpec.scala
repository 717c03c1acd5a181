package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class Round11kSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("sim_rand_proj: JL mass concentrates and buckets are consistent") {
    val rows = run("sim_rand_proj").collect()
    assert(rows.nonEmpty)
    var total = 0L
    var nearOne = 0L
    rows.foreach { r =>
      val (b, n, lo, hi) = (r.getAs[Long]("bucket"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("lo_bp"), r.getAs[Long]("hi_bp"))
      assert(b >= 0 && b <= 30)
      assert(lo >= 0 && lo <= hi)
      if (b < 30) assert(lo >= b * 2500 && hi < (b + 1) * 2500)
      else assert(lo >= 30 * 2500)
      total += n
      // ratio within [0.25, 2.5]x — the JL concentration body at k=8
      if (b >= 1 && b <= 9) nearOne += n
    }
    // every within-label pair with d2 > 0 is judged exactly once
    val m = graft.sources.Tables.embeddings(spark, TestSpark.sf)
      .groupBy(col("label")).agg(count(lit(1)).as("n"))
      .agg(sum(graft.queries.idiv(col("n") * (col("n") - 1), lit(2L))))
      .collect()(0).getLong(0)
    assert(total <= m)
    assert(nearOne * 10 >= total * 5,
      s"JL concentration: only $nearOne/$total pairs within [0.25x, 2.5x]")
  }

  test("q_join_card_est: exact join size and estimate identities") {
    val r = run("q_join_card_est").collect()
    assert(r.length == 1)
    val row = r.head
    val (na, nb, nda, ndb, exact, est, err) = (row.getAs[Long]("n_a"),
      row.getAs[Long]("n_b"), row.getAs[Long]("ndv_a"),
      row.getAs[Long]("ndv_b"), row.getAs[Long]("exact_card"),
      row.getAs[Long]("est_card"), row.getAs[Long]("err_abs_bp"))
    assert(nda <= na && ndb <= nb)
    assert(est == na * nb / math.max(nda, ndb))
    assert(err == (if (exact == 0) 0L else (est - exact).abs * 10000 / exact))
    // the exact join cardinality really is the join's row count
    val ev = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("user_id").isNotNull)
    val joined = ev.where(col("event_type") === "click")
      .select(col("user_id"))
      .join(ev.where(col("event_type") === "purchase")
        .select(col("user_id")), Seq("user_id"))
      .count()
    assert(exact == joined)
  }
}
