package graft

import org.scalatest.funsuite.AnyFunSuite

class Round11ySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("graph_harmonic_2hop: ordering and bounds hold") {
    val rows = run("graph_harmonic_2hop").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    var prev = Long.MaxValue
    rows.foreach { r =>
      val (p, n2, h) = (r.getAs[Long]("n_parts"), r.getAs[Long]("n_reach"),
        r.getAs[Long]("harmonic_x2"))
      assert(h == 2 * p + n2 && h <= prev)
      prev = h
    }
  }

  test("dedup_keeper_strategies: same clusters, policies differ as designed") {
    val rows = run("dedup_keeper_strategies").collect()
      .map(r => r.getAs[String]("strategy") ->
        ((r.getAs[Long]("n_clusters"), r.getAs[Long]("chars_kept"),
          r.getAs[Long]("n_en"), r.getAs[Long]("mean_chars")))).toMap
    assert(rows.keySet == Set("min_id", "longest", "en_first"))
    val n = rows.values.map(_._1).toSet
    assert(n.size == 1, "every policy keeps one doc per cluster")
    // the longest policy keeps at least as many characters as any other
    assert(rows("longest")._2 >= rows("min_id")._2)
    assert(rows("longest")._2 >= rows("en_first")._2)
    // the en-first policy keeps at least as many English docs
    assert(rows("en_first")._3 >= rows("min_id")._3)
    rows.values.foreach { case (nc, ck, _, mc) => assert(mc == ck / nc) }
  }
}
