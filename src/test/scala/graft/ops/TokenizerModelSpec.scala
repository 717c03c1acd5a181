package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The persisted tokenizer model: train on one corpus, DELETE it, and
  * segment a new batch from the stored artifacts alone — deployment
  * reproduces training segmentation exactly (same fuse semantics). */
class TokenizerModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val trainDocs = Seq(
    1L -> "the merge engine merges the merged batches",
    2L -> "the engine the engine the engine runs merges",
    3L -> "batches of merges keep the engine busy")
  private val newDocs = Seq(
    10L -> "the engine merges batches", // all-seen words
    11L -> "unseen words here")          // chars only partially fused

  /** JVM fuse twin of replace(): sequential search resumes AFTER the
    * replaced region, so when two pair occurrences share a boundary
    * space, the second does NOT merge that round — at symbol level,
    * after merging (i, i+1) symbol i+2 is emitted unmerged and the scan
    * resumes at i+3 (probed against Spark and DuckDB replace on
    * " a b a b " → " ab a b "). */
  private def fuseJvm(syms: Vector[String], m: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]; var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == m._1 && syms(i + 1) == m._2) {
        out += (m._1 + m._2)
        if (i + 2 < syms.length) out += syms(i + 2)
        i += 3
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  test("segment works from stored artifacts after the training corpus is deleted") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-tok").toString
    val trainPath = s"$root/train"; val model = s"$root/model"

    trainDocs.toDF("doc_id", "text").write.parquet(trainPath)
    val train = spark.read.parquet(trainPath)

    // train: top-5 vocab + 3 BPE merges over the training corpus
    val vocab = train.select(explode(split(trim($"text"), " ")).as("token"))
      .groupBy($"token").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"token").limit(5)
      .withColumn("token_id", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy($"n".desc, $"token"))
        .cast("long"))
    // learn merges with the same loop shape as text_bpe_train
    var seqs: Map[Vector[String], Long] = trainDocs
      .flatMap(_._2.split(" ")).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
      .map { case (w, f) => w.map(_.toString).toVector -> f }
    val learned = (1 to 3).map { r =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      seqs.foreach { case (ss, f) =>
        ss.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f } }
      val (pair, _) = counts.toSeq.minBy { case ((a, b), c) => (-c, s"$a $b") }
      seqs = seqs.toSeq.map { case (ss, f) => fuseJvm(ss, pair) -> f }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      (r, s"${pair._1} ${pair._2}")
    }
    TokenizerModel.save(spark, vocab,
      learned.toDF("round", "pair"), model)

    // deployment boundary: the training corpus no longer exists
    import scala.reflect.io.Directory
    assert(new Directory(new java.io.File(trainPath)).deleteRecursively())

    val got = TokenizerModel.segment(spark,
        newDocs.toDF("doc_id", "text"), "doc_id", "text", model)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_pieces")))).toMap

    // expected piece counts from the JVM twin applying the SAME merges
    val ms = learned.map(_._2.split(" ") match { case Array(a, b) => (a, b) })
    val expect = newDocs.map { case (id, text) =>
      val words = text.split(" ").toSeq
      val pieces = words.map { w =>
        ms.foldLeft(w.map(_.toString).toVector)(fuseJvm).length.toLong
      }.sum
      id -> ((words.length.toLong, pieces))
    }.toMap
    assert(got == expect)
    // sanity: fused words compress, unseen words stay near char count
    assert(got(10L)._2 < "the engine merges batches".replace(" ", "").length)
  }

  test("native BpeSegment ≡ the replace() fold on the fixture corpus + edge words") {
    import spark.implicits._
    // merges chosen to exercise multi-char fuse rounds AND the
    // shared-boundary-space skip rule (adjacent pair occurrences)
    val ms = Seq("a b", "ab a", "e r", "er s", "t h", "th e")
    val words = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .unionAll(Seq("abab", "ababab", "aaaa", "abababa", "x",
        "theers", "merger").toDF("w"))
    val cmp = words
      .withColumn("fold",
        split(trim(TokenizerModel.fuse(TokenizerModel.charSeq(col("w")), ms)), " "))
      .withColumn("native", TokenizerModel.pieces(col("w"), ms))
    val bad = cmp.where(not(col("fold") === col("native"))).limit(5).collect()
    assert(bad.isEmpty, s"fold != native on: ${bad.mkString("; ")}")
    // the skip rule, pinned explicitly: of two occurrences sharing a
    // boundary space only the first merges per round
    val abab = cmp.where(col("w") === "ababab").select(col("native"))
      .head.getSeq[String](0)
    assert(abab == Seq("aba", "b", "ab"),
      s"'ababab' under [a b, ab a]: got $abab")
  }
}
