package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class Round11hSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("sim_seed_quality: farthest-first wins the k-center radius") {
    val rows = run("sim_seed_quality").collect()
      .map(r => r.getAs[String]("method") ->
        ((r.getAs[Long]("n_vecs"), r.getAs[Long]("sse"),
          r.getAs[Long]("radius_d2"), r.getAs[Long]("min_cell_n"),
          r.getAs[Long]("max_cell_n")))).toMap
    assert(rows.keySet == Set("hash", "farthest_first"))
    val (h, f) = (rows("hash"), rows("farthest_first"))
    assert(h._1 == f._1, "both methods assign every vector")
    // the k-center property farthest-first 2-approximates: its max
    // min-distance must not exceed the hash sample's on the fixture
    assert(f._3 <= h._3,
      s"farthest-first radius ${f._3} > hash radius ${h._3}")
    Seq(h, f).foreach { m =>
      assert(m._2 >= 0 && m._3 >= 0 && m._4 <= m._5)
      assert(m._4 >= 1, "no seed cell may starve to zero on the fixture")
    }
  }

  test("etl_pit_leakage: flag hierarchy and identities hold") {
    val rows = run("etl_pit_leakage").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, nf, np, nl) = (r.getAs[Long]("n_labels"), r.getAs[Long]("n_feat"),
        r.getAs[Long]("n_pit"), r.getAs[Long]("n_leaky"))
      assert(nf <= n && np <= nf && nl <= nf,
        "PIT-valid and leaky labels are subsets of feature-bearing labels")
      assert(r.getAs[Long]("leak_bp") == nl * 10000 / n)
    }
    // totals must account for every purchase label
    val labels = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("ts").isNotNull && col("user_id").isNotNull &&
        col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_labels")).sum == labels)
  }
}
