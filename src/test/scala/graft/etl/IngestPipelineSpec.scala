package graft.etl

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.ops.{IncrementalDedup, IvfIndex, TokenizerModel}

/** Pipelines.ingest — the continuous-ingest tick composing the THREE
  * persisted artifacts (dedup index, BPE model, IVF index). Pins:
  * idempotence under re-delivery (the second run ingests 0 docs and
  * appends 0 vectors) and each artifact answering from its STORE
  * afterward (an appended embedding is searchable, a re-delivered text
  * verdicts exact_dup, the stats count the fold). */
class IngestPipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val histDocs = Seq(
    1L -> "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima",
    2L -> "one two three four five six seven eight nine ten eleven twelve thirteen",
    3L -> "the etl pipeline reads the changelog and merges keys in stable order")

  test("ingest: dedup-gate → artifact folds; re-delivery ingests 0") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val dedupPath = s"$root/dedup"; val bpePath = s"$root/bpe"
    val ivfPath = s"$root/ivf"

    // --- the three artifacts, built once ---------------------------------
    IncrementalDedup.buildIndex(
      histDocs.toDF("doc_id", "text"), "doc_id", "text", dedupPath)
    TokenizerModel.save(spark,
      Seq(("the", 1L, 10L), ("engine", 2L, 5L)).toDF("token", "token_id", "n"),
      Seq((1L, "t h"), (2L, "th e")).toDF("round", "pair"), bpePath)
    val emb = graft.sources.Tables.embeddings(spark, TestSpark.sf)
    val r0 = IvfIndex.build(spark, emb, "vec_id", "embedding", ivfPath,
      numBuckets = 16)

    // --- the batch: 2 fresh docs (with embeddings copied from stored
    // vectors 5 and 6, so the ANN fold has perfect-cosine twins), one
    // exact re-delivery of history, one near variant of history, and one
    // empty-text row the normalize step must drop ---------------------
    val vec5 = emb.where(col("vec_id") === 5L)
      .select(col("embedding")).head.getSeq[Float](0)
    val vec6 = emb.where(col("vec_id") === 6L)
      .select(col("embedding")).head.getSeq[Float](0)
    val batch = Seq(
      (1000001L, "completely novel content that matches nothing stored here",
        Some(vec5)),
      (1000002L, "another fresh document made of entirely new words inside",
        Some(vec6)),
      (1000011L, histDocs.head._2, None: Option[Seq[Float]]),
      (1000012L,
        "one two three four five six seven eight nine ten eleven twelve altered",
        None: Option[Seq[Float]]),
      (1000099L, "   ", None: Option[Seq[Float]]))
      .toDF("doc_id", "text", "embedding")

    val r1 = Pipelines.ingest(spark, batch, dedupPath, bpePath, ivfPath)
    assert(r1.rowsIn == 4L, s"normalize must drop the empty-text row: $r1")
    assert(r1.exactDups == 1L && r1.nearDups == 1L && r1.uniques == 2L,
      s"verdict split must be 1 exact / 1 near / 2 unique: $r1")
    assert(r1.vectorsAppended == 2L,
      s"both uniques carry embeddings — both must fold into the index: $r1")
    assert(r1.tokensSeen > 0L && r1.piecesSeen >= r1.tokensSeen,
      s"BPE pricing over the uniques (pieces >= whitespace tokens): $r1")

    // --- each artifact answers from its store -----------------------------
    // ANN: the appended copy of vector 5 is a perfect-cosine first hit
    val top = IvfIndex.search(spark, ivfPath, vec5, k = 2, nprobe = 2,
      numBuckets = 16, excludeId = Some(5L)).collect()
    assert(top.head.getLong(0) == 1000001L && top.head.getLong(1) == 10000L,
      s"the ingested embedding must be searchable at cos_bp=10000: " +
        top.map(r => (r.getLong(0), r.getLong(1))).mkString(","))
    assert(IvfIndex.stats(spark, ivfPath)
      .agg(sum(col("n"))).head.getLong(0) == r0.nVectors + 2L,
      "the stored index holds exactly the build + the 2 ingested vectors")
    // dedup: a re-delivered copy of an INGESTED doc is an exact dup now
    val v2 = IncrementalDedup.verdicts(spark,
        Seq((2000001L, "completely novel content that matches nothing stored here"))
          .toDF("doc_id", "text"), "doc_id", "text", dedupPath)
      .head
    assert(v2.getAs[String]("status") == "exact_dup" &&
      v2.getAs[Long]("keeper") == 1000001L,
      s"the ingested doc must gate later copies from the store: $v2")

    // --- idempotence: the SAME batch re-delivered ingests nothing --------
    val r2 = Pipelines.ingest(spark, batch, dedupPath, bpePath, ivfPath)
    assert(r2.rowsIn == 4L && r2.uniques == 0L &&
      r2.vectorsAppended == 0L && r2.tokensSeen == 0L,
      s"re-delivery must ingest 0 new docs: $r2")
    assert(r2.exactDups == 3L && r2.nearDups == 1L,
      s"previously-unique docs now verdict exact_dup from the store: $r2")
    assert(IvfIndex.stats(spark, ivfPath)
      .agg(sum(col("n"))).head.getLong(0) == r0.nVectors + 2L,
      "the second run must not grow the ANN artifact")
  }

  test("erase: subjects leave every store; an erased text re-ingests as unique; idempotent") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-erase").toString
    val dedupPath = s"$root/dedup"; val bpePath = s"$root/bpe"
    val ivfPath = s"$root/ivf"
    IncrementalDedup.buildIndex(
      histDocs.toDF("doc_id", "text"), "doc_id", "text", dedupPath)
    TokenizerModel.save(spark,
      Seq(("the", 1L, 10L), ("engine", 2L, 5L)).toDF("token", "token_id", "n"),
      Seq((1L, "t h"), (2L, "th e")).toDF("round", "pair"), bpePath)
    val emb = graft.sources.Tables.embeddings(spark, TestSpark.sf)
    val r0 = IvfIndex.build(spark, emb, "vec_id", "embedding", ivfPath,
      numBuckets = 16)
    val vec5 = emb.where(col("vec_id") === 5L)
      .select(col("embedding")).head.getSeq[Float](0)
    val subjectText =
      "completely novel content that matches nothing stored here"
    val batch = Seq(
      (1000001L, subjectText, Some(vec5)),
      (1000011L, histDocs.head._2, None: Option[Seq[Float]]))
      .toDF("doc_id", "text", "embedding")
    val r1 = Pipelines.ingest(spark, batch, dedupPath, bpePath, ivfPath)
    assert(r1.uniques == 1L && r1.vectorsAppended == 1L, s"setup: $r1")

    // subjects: the ingested doc (hash keeper + sigs + bands + ANN row)
    // and the exact-dup delivery (gated out — NO derived rows anywhere)
    val er = Pipelines.erase(spark,
      Seq(1000001L, 1000011L).toDF("doc_id"), "doc_id", dedupPath, ivfPath)
    assert(er.subjects == 2L, s"$er")
    assert(er.dedupHashes == 1L && er.dedupSigs == 1L && er.dedupBands == 2L,
      s"the ingested subject's derived rows (1 hash, 1 sig, k/rpb=2 bands) " +
        s"leave the dedup index; the gated dup never had any: $er")
    assert(er.annRows == 1L, s"the subject's stored vector leaves: $er")

    // every store answers WITHOUT the subjects now:
    // the ANN first hit for vec5 is no longer the erased doc
    val top = IvfIndex.search(spark, ivfPath, vec5, k = 2, nprobe = 2,
      numBuckets = 16, excludeId = Some(5L)).collect()
    assert(top.head.getLong(0) != 1000001L,
      s"the erased vector must never be returned: ${top.head}")
    assert(IvfIndex.stats(spark, ivfPath)
      .agg(sum(col("n"))).head.getLong(0) == r0.nVectors,
      "the store holds exactly the non-subject vectors")
    // the dedup index FORGOT the subject's text: an identical
    // re-delivery verdicts unique again (erasure beats dedup memory —
    // remembering the hash would retain what was erased)
    val v = IncrementalDedup.verdicts(spark,
        Seq((3000001L, subjectText)).toDF("doc_id", "text"),
        "doc_id", "text", dedupPath).head
    assert(v.getAs[String]("status") == "unique",
      s"an erased text must re-ingest as unique: $v")
    // history docs the subjects never touched still gate normally
    val vh = IncrementalDedup.verdicts(spark,
        Seq((3000002L, histDocs(1)._2)).toDF("doc_id", "text"),
        "doc_id", "text", dedupPath).head
    assert(vh.getAs[String]("status") == "exact_dup",
      s"unrelated history must be untouched by the erasure: $vh")

    // idempotent: the second run removes 0 everywhere (the receipt)
    val er2 = Pipelines.erase(spark,
      Seq(1000001L, 1000011L).toDF("doc_id"), "doc_id", dedupPath, ivfPath)
    assert(er2 == Pipelines.EraseReport(2L, 0L, 0L, 0L, 0L),
      s"re-erasure must be a no-op: $er2")
  }
}
