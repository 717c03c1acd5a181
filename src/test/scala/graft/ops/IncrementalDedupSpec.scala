package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The persisted-index incremental dedup (graft.ops.IncrementalDedup):
  * batch N builds/stores the index once, batch N+1 gets verdicts from
  * the STORED index. The no-history-rescan claim is proven the hard
  * way — the history parquet is DELETED before the batch runs. */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** JVM twin of the MinHash signature kernel (Dedup.minhashSignatureArray):
    * slot s = min md5 hex of "s:token" over distinct tokens. */
  private def sigOf(text: String, k: Int = 8): Seq[String] = {
    val toks = text.trim.split(" ").distinct
    (0 until k).map(s => toks.map(t => md5hex(s"$s:$t")).min)
  }
  /** Bands match iff all rowsPerBand slots agree (xxhash64 band keys are
    * injective modulo 2⁻⁶⁴ collisions). */
  private def anyBandMatch(a: Seq[String], b: Seq[String], rpb: Int = 4): Boolean =
    a.grouped(rpb).zip(b.grouped(rpb)).exists { case (x, y) => x == y }
  private def sigAgree(a: Seq[String], b: Seq[String]): Boolean =
    a.zip(b).count { case (x, y) => x == y } * 2 >= a.length

  private val histDocs = Seq(
    1L -> "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima",
    2L -> "one two three four five six seven eight nine ten eleven twelve thirteen",
    3L -> "the etl pipeline reads the changelog and merges keys in stable order")
  // 11: exact dup of 1; 12: near variant of 2 (one token changed);
  // 13: fresh text
  private val batch1 = Seq(
    11L -> histDocs(0)._2,
    12L -> "one two three four five six seven eight nine ten eleven twelve altered",
    13L -> "completely novel content that matches nothing in the stored history")

  test("verdicts come from the stored index alone — history text deleted") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-incdedup").toString
    val histPath = s"$root/hist"; val index = s"$root/index"

    histDocs.toDF("doc_id", "text").write.parquet(histPath)
    IncrementalDedup.buildIndex(
      spark.read.parquet(histPath), "doc_id", "text", index)

    // the proof: no history text exists anywhere when the batch runs
    import scala.reflect.io.Directory
    assert(new Directory(new java.io.File(histPath)).deleteRecursively())

    val got = IncrementalDedup.verdicts(spark,
        batch1.toDF("doc_id", "text"), "doc_id", "text", index)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("status"), Option(r.getAs[java.lang.Long]("keeper"))))).toMap

    // expected statuses recomputed from the JVM signature twin — the
    // near verdict is whatever LSH+signature-agreement truly implies,
    // not a hand-waved "should collide"
    val expectNear = batch1.map { case (id, t) =>
      id -> histDocs.filter { case (_, ht) =>
        anyBandMatch(sigOf(t), sigOf(ht)) && sigAgree(sigOf(t), sigOf(ht))
      }.map(_._1).sorted.headOption
    }.toMap
    assert(got(11L) == (("exact_dup", Some(1L))))
    // the near-variant must actually collide for this fixture to test
    // the near path — guard, then compare against the component
    assert(expectNear(12L) == Some(2L), "fixture no longer collides")
    assert(got(12L) == (("near_dup", Some(2L))))
    assert(expectNear(13L).isEmpty && got(13L) == (("unique", None)))
  }

  test("append folds batch uniques in; the next batch dedups against them") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-incdedup2").toString
    val index = s"$root/index"
    IncrementalDedup.buildIndex(histDocs.toDF("doc_id", "text"),
      "doc_id", "text", index)

    val b1 = batch1.toDF("doc_id", "text")
    val v1 = IncrementalDedup.verdicts(spark, b1, "doc_id", "text", index)
    val uniques = b1.join(v1.where(col("status") === "unique")
      .select(col("doc_id")), Seq("doc_id"))
    IncrementalDedup.append(spark, uniques, "doc_id", "text", index)

    // batch 2: 21 duplicates batch-1's unique doc 13 → keeper 13;
    // 22 still dedups against original history (index intact after
    // the incremental upsert)
    val b2 = Seq(21L -> batch1(2)._2, 22L -> histDocs(2)._2)
      .toDF("doc_id", "text")
    val v2 = IncrementalDedup.verdicts(spark, b2, "doc_id", "text", index)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("status"), r.getAs[java.lang.Long]("keeper")))).toMap
    assert(v2(21L) == (("exact_dup", 13L)))
    assert(v2(22L) == (("exact_dup", 3L)))
  }
}
