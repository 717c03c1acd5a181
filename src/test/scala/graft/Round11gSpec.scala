package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class Round11gSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("text_nb_train: bucket counts partition the token stream; odds identities") {
    val tok = graft.sources.Tables.documents(spark, TestSpark.sf)
      .where(length(trim(col("text"))) > 0)
      .select((col("lang") === "en").cast("long").as("y"),
        explode(graft.ops.TextAnalysis.tokens(col("text"))).as("tok"))
    val (totPos, totNeg) = {
      val r = tok.agg(sum(col("y")), sum(lit(1L) - col("y"))).collect().head
      (r.getLong(0), r.getLong(1))
    }
    val rows = run("text_nb_train").collect()
    assert(rows.map(_.getAs[Long]("pos")).sum == totPos,
      "per-bucket positives partition the English token stream")
    assert(rows.map(_.getAs[Long]("neg")).sum == totNeg,
      "per-bucket negatives partition the rest")
    rows.foreach { r =>
      val (p, n, o, w) = (r.getAs[Long]("pos"), r.getAs[Long]("neg"),
        r.getAs[Long]("odds_bp"), r.getAs[Long]("w"))
      assert(o == (p + 1) * totNeg * 10000 / ((n + 1) * totPos),
        "odds_bp is the smoothed class-normalized ratio")
      assert(w == o - 10000, "evidence weight is centered odds")
    }
  }

  test("text_score_calibration: bands partition the scored docs") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
      .where(length(trim(col("text"))) > 0)
    val rows = run("text_score_calibration").collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs.count(),
      "every nonempty doc lands in exactly one score band")
    assert(rows.map(_.getAs[Long]("n_pos")).sum ==
      docs.where(col("lang") === "en").count(),
      "positives across bands == English docs")
    rows.foreach { r =>
      val (n, p) = (r.getAs[Long]("n_docs"), r.getAs[Long]("n_pos"))
      assert(p <= n)
      assert(r.getAs[Long]("pos_rate_bp") == p * 10000 / n)
    }
  }
}
