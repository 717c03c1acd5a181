package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The native ShingleHashes64 must be BIT-IDENTICAL to the HOF chain it
  * replaced (`array_distinct(transform(shinglesOf(toks, n), xxhash64))`)
  * — same hashes, same first-occurrence order, same null/short-input
  * behavior — on the real corpus and on adversarial fixtures. */
class ShingleExpressionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hofForm(toks: org.apache.spark.sql.Column, n: Int) =
    array_distinct(transform(
      graft.ops.TextAnalysis.shinglesOf(toks, n), s => xxhash64(s)))

  test("native form equals the HOF chain on the full corpus (n = 2, 3)") {
    Seq(2, 3).foreach { n =>
      val mismatches = graft.sources.Tables.documents(spark, TestSpark.sf)
        .select(graft.ops.TextAnalysis.tokens(col("text")).as("toks"))
        .select(
          ShingleFunctions.shingleHashes64(col("toks"), n).as("fast"),
          hofForm(col("toks"), n).as("ref"))
        .where(not(col("fast") === col("ref")))
        .count()
      assert(mismatches == 0, s"n=$n: native vs HOF divergence")
    }
  }

  test("native form handles null tokens, short docs, repeats like the HOF chain") {
    val fixtures = Seq(
      Some(Seq[String]()),                       // empty
      Some(Seq("one")),                          // shorter than n
      Some(Seq("a", "b", "a", "b", "a")),        // repeated shingles
      Some(Seq("a", null, "b", "c")),            // null token inside window
      None)                                      // null array
    val df = fixtures.toDF("toks").select(
      ShingleFunctions.shingleHashes64(col("toks"), 2).as("fast"),
      hofForm(col("toks"), 2).as("ref"))
    df.collect().foreach { r =>
      val fast = r.getSeq[Long](0).toList
      // HOF yields null array only for null input (when/otherwise guards);
      // the native form contracts that to empty — same downstream explode
      val ref = if (r.isNullAt(1)) Nil else r.getSeq[Long](1).toList
      assert(fast == ref, s"fixture mismatch: $fast vs $ref")
    }
  }

  test("shingle_hashes64 is callable from SQL and matches the Column form") {
    val rows = spark.sql(
      "SELECT shingle_hashes64(array('a', 'b', 'c'), 2) AS h").collect()
    val direct = Seq(Seq("a", "b", "c")).toDF("toks")
      .select(ShingleFunctions.shingleHashes64(col("toks"), 2).as("h")).collect()
    assert(rows(0).getSeq[Long](0) == direct(0).getSeq[Long](0))
  }

  test("whole-stage codegen stays intact around the native expression") {
    val plan = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(graft.ops.TextAnalysis.tokens(col("text")).as("toks"))
      .select(ShingleFunctions.shingleHashes64(col("toks"), 3).as("h"))
      .queryExecution.executedPlan.toString
    // the `*(n)` stage marker is executedPlan.toString's rendering of a
    // WholeStageCodegen span containing the projection
    assert(plan.contains("*(1) Project"), s"codegen lost:\n$plan")
  }
}
