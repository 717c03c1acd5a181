package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 1000 rows of hot key 1, ten rows of others — a 99% hot key
  lazy val skewed = ((1 to 1000).map(i => (1L, i.toLong)) ++
    (1 to 10).map(i => (2L, i.toLong))).toDF("k", "v")
  lazy val dim = Seq((1L, "hot"), (2L, "cold"), (3L, "absent")).toDF("k", "name")

  test("saltedJoin returns exactly the unsalted join result") {
    val plain = skewed.join(dim, Seq("k")).orderBy("k", "v")
      .as[(Long, Long, String)].collect().toSeq
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), saltFactor = 8)
      .orderBy("k", "v").as[(Long, Long, String)].collect().toSeq
    assert(salted == plain && salted.size == 1010)
  }

  test("saltedJoin left-outer keeps unmatched rows once") {
    val extra = skewed.unionByName(Seq((9L, 1L)).toDF("k", "v"))
    val res = Skew.saltedJoin(extra, dim, Seq("k"), 4, "left")
      .where($"k" === 9).as[(Long, Long, String)].collect()
    assert(res.length == 1 && res.head._3 == null)
  }

  test("saltedJoin rejects join types that would duplicate unmatched right rows") {
    val e = intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewed, dim, Seq("k"), 4, "right_outer")
    }
    assert(e.getMessage.contains("right_outer"))
  }

  test("distinctCountTwoPhase ignores NULL values like countDistinct") {
    val withNull = skewed.unionByName(
      Seq((5L, Option.empty[java.lang.Long])).map(t => (t._1, t._2.map(Long2long)))
        .toDF("k", "v"))
    val direct = withNull.groupBy("k").agg(countDistinct($"v").as("n"))
      .orderBy("k").as[(Long, Long)].collect().toSeq
    val twoPhase = Skew.distinctCountTwoPhase(withNull, "k", "v")
      .orderBy("k").as[(Long, Long)].collect().toSeq
    // k=5 has only a NULL value: countDistinct reports (5, 0) and so
    // must the two-phase twin (the group survives, its count is 0)
    assert(twoPhase == direct)
  }

  test("distinctCountTwoPhase equals countDistinct") {
    val direct = skewed.groupBy("k").agg(countDistinct($"v").as("n_distinct"))
      .orderBy("k").as[(Long, Long)].collect().toSeq
    val twoPhase = Skew.distinctCountTwoPhase(skewed, "k", "v")
      .orderBy("k").as[(Long, Long)].collect().toSeq
    assert(twoPhase == direct)
  }
}
