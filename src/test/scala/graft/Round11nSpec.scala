package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class Round11nSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("events_psi_ingredients: halves partition the corpus, shares sum near 10000") {
    val rows = run("events_psi_ingredients").collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val total = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("ts").isNotNull).count()
    assert(rows.map(r => r.getAs[Long]("n_ref") + r.getAs[Long]("n_cur")).sum
      == total)
    // truncating shares: each side sums to 10000 - (rounding loss < bins)
    val sr = rows.map(_.getAs[Long]("share_ref_bp")).sum
    val sc = rows.map(_.getAs[Long]("share_cur_bp")).sum
    assert(sr > 10000 - rows.length && sr <= 10000)
    assert(sc > 10000 - rows.length && sc <= 10000)
    rows.foreach { r =>
      assert(r.getAs[Long]("delta_bp") ==
        r.getAs[Long]("share_cur_bp") - r.getAs[Long]("share_ref_bp"))
    }
  }

  test("text_phrase_search: every hit doc really contains the adjacent phrase") {
    val rows = run("text_phrase_search").collect()
    assert(rows.nonEmpty, "the fixture corpus contains the phrase")
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    rows.foreach { r =>
      // JVM twin of TextAnalysis.tokens = split(trim(text), " ")
      val toks = docs(r.getAs[Long]("doc_id")).trim.split(" ", -1).toSeq
      val hits = toks.sliding(2).zipWithIndex
        .collect { case (Seq("fast", "merge"), i) => i }.toSeq
      assert(hits.nonEmpty && hits.length.toLong == r.getAs[Long]("n_hits"))
      assert(hits.min.toLong == r.getAs[Long]("first_pos"))
    }
  }

  test("events_user_fingerprint: grouped users share identical type sequences") {
    val rows = run("events_user_fingerprint").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") >= 2)
      assert(r.getAs[Long]("seq_len") >= 1)
    }
    // fingerprints are distinct group keys
    val fps = rows.map(r => (r.getAs[String]("fp"), r.getAs[Long]("seq_len")))
    assert(fps.distinct.length == fps.length)
  }
}
