package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The persisted IVF index artifact: build once → the store serves
  * search/append with the training corpus GONE, search is bit-identical
  * to the oracle-green inline sim_ivf_auto_search, and the probe read
  * is partition-pruned to the probe cells' buckets. */
class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def deleteRec(p: String): Unit = {
    val root = new java.io.File(p)
    if (root.isDirectory) root.listFiles.foreach(f => deleteRec(f.getPath))
    root.delete(); ()
  }

  test("build → delete training corpus → search == inline ivfAutoSearch") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ivfidx").toString
    val emb = graft.sources.Tables.embeddings(spark, TestSpark.sf)

    // the training corpus is a DISPOSABLE COPY — the index must survive it
    emb.write.parquet(s"$root/corpus")
    val corpus = spark.read.parquet(s"$root/corpus")
    val r = IvfIndex.build(spark, corpus, "vec_id", "embedding",
      s"$root/idx", numBuckets = 16)
    assert(r.cells == Similarity.autoCells(emb.count()) &&
      r.nCentroids == r.cells.toLong, "trained √n cells, all persisted")
    assert(r.nVectors == emb.count(), "every corpus vector assigned+stored")

    // the query vector leaves the corpus BEFORE the corpus is destroyed
    val qVec = emb.where(col("vec_id") === 0L)
      .select(col("embedding")).head.getSeq[Float](0)
    deleteRec(s"$root/corpus")
    assert(!new java.io.File(s"$root/corpus").exists,
      "training corpus is gone — any rescan would now throw")

    val got = IvfIndex.search(spark, s"$root/idx", qVec, k = 10, nprobe = 2,
        numBuckets = 16, idCol = "vec_id", excludeId = Some(0L))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    val want = Similarity.ivfAutoSearch(emb, "vec_id", "embedding",
        0L, 10, 2)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(got == want,
      "stored-artifact search == the oracle-green inline search, in order")
  }

  test("search reads ONLY the probe cells' buckets (partition pruning)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ivfprune").toString
    val emb = graft.sources.Tables.embeddings(spark, TestSpark.sf)
    IvfIndex.build(spark, emb, "vec_id", "embedding", s"$root/idx",
      numBuckets = 16)
    val qVec = emb.where(col("vec_id") === 7L)
      .select(col("embedding")).head.getSeq[Float](0)
    val search = IvfIndex.search(spark, s"$root/idx", qVec, 5, nprobe = 2,
      numBuckets = 16, excludeId = Some(7L))
    search.collect() // materialize so the executed plan is final
    def leaves(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        leaves(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        leaves(q.plan)
      case _ if p.children.isEmpty => Seq(p)
      case _ => p.children.flatMap(leaves)
    }
    val scans = leaves(search.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("vectors")) =>
        f.selectedPartitions.partitionCount
    }
    val totalBuckets = new java.io.File(s"$root/idx/vectors")
      .listFiles.count(_.getName.startsWith("_bucket="))
    assert(scans.nonEmpty && scans.forall(_ <= 2),
      s"vectors scan must touch <= nprobe bucket partitions, got $scans")
    assert(totalBuckets > 2,
      s"pruning is only meaningful against >2 stored buckets ($totalBuckets)")
  }

  test("append assigns against STORED centroids; new vectors searchable") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ivfapp").toString
    val emb = graft.sources.Tables.embeddings(spark, TestSpark.sf)
    val r = IvfIndex.build(spark, emb, "vec_id", "embedding", s"$root/idx",
      numBuckets = 16)

    // the batch: exact copies of 20 corpus vectors under fresh ids — each
    // must land in its twin's cell and surface as a cos_bp=10000 neighbor
    val batch = emb.where(col("vec_id") < 20L)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val appended = IvfIndex.append(spark, batch, "vec_id", "embedding",
      s"$root/idx", numBuckets = 16)
    assert(appended == 20L)
    val st = IvfIndex.stats(spark, s"$root/idx")
    assert(st.agg(sum(col("n"))).head.getLong(0) == r.nVectors + 20L,
      "stats over the store counts the appended members")
    assert(st.select(max(col("n_cells"))).head.getLong(0) == r.cells.toLong,
      "append trains nothing — the cell count is the stored one")

    // identical-vector check: the twin of vec 3 is a perfect-cosine hit
    val qVec = emb.where(col("vec_id") === 3L)
      .select(col("embedding")).head.getSeq[Float](0)
    val top = IvfIndex.search(spark, s"$root/idx", qVec, 3, nprobe = 1,
      numBuckets = 16, excludeId = Some(3L)).collect()
    assert(top.head.getLong(0) == 100003L && top.head.getLong(1) == 10000L,
      s"the appended exact twin must rank first at cos_bp=10000: " +
        top.map(r0 => (r0.getLong(0), r0.getLong(1))).mkString(","))

    // maintenance: appends accrete small files; standard Compaction over
    // the CELL-keyed vectors table merges them and search is unchanged
    val before = IvfIndex.search(spark, s"$root/idx", qVec, 10, nprobe = 2,
      numBuckets = 16, excludeId = Some(3L))
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1))).toSeq
    val statsBefore = graft.sinks.Compaction
      .partitionStats(spark, s"$root/idx/vectors")
    val plans = graft.sinks.Compaction.compact(spark, s"$root/idx/vectors",
      targetBytes = 64L * 1024 * 1024)
    val statsAfter = graft.sinks.Compaction
      .partitionStats(spark, s"$root/idx/vectors")
    assert(plans.nonEmpty &&
      statsAfter.map(_.nFiles.toLong).sum < statsBefore.map(_.nFiles.toLong).sum,
      "compaction must merge the append-accreted files")
    val after = IvfIndex.search(spark, s"$root/idx", qVec, 10, nprobe = 2,
      numBuckets = 16, excludeId = Some(3L))
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1))).toSeq
    assert(after == before, "search through the compacted index is identical")
  }

  test("searchBatch == per-query search row-for-row; one bucket-pruned read over the probe-cell UNION") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ivfbatch").toString
    val emb = graft.sources.Tables.embeddings(spark, TestSpark.sf)
    IvfIndex.build(spark, emb, "vec_id", "embedding", s"$root/idx",
      numBuckets = 16)

    // 3 EXTERNAL queries (negative qids — disjoint from stored vids):
    // copies of corpus vectors 0..2, so results are non-trivial
    val qdf = emb.where(col("vec_id") < 3L)
      .select((-col("vec_id") - 1L).as("qid"), col("embedding"))
      .localCheckpoint(true)
    val batch = IvfIndex.searchBatch(spark, s"$root/idx", qdf,
      "qid", "embedding", k = 5, nprobe = 2, numBuckets = 16,
      idCol = "vec_id")
    val rows = batch.collect()

    // row-for-row parity with the per-query stored-artifact search
    (0 until 3).foreach { i =>
      val qVec = emb.where(col("vec_id") === i.toLong)
        .select(col("embedding")).head.getSeq[Float](0)
      val want = IvfIndex.search(spark, s"$root/idx", qVec, 5, nprobe = 2,
          numBuckets = 16, idCol = "vec_id")
        .collect().map(r0 => (r0.getLong(0), r0.getLong(1))).toSeq
      val got = rows.filter(_.getLong(0) == -(i + 1).toLong)
        .sortBy(_.getLong(3))
        .map(r0 => (r0.getLong(1), r0.getLong(2))).toSeq
      assert(got == want,
        s"batch results for query $i must equal the serial search: $got vs $want")
    }

    // the executed plan reads ≤ |distinct probe cells| bucket partitions
    // (the UNION of the 3 queries' nprobe=2 cells, not 3 separate reads)
    val cent = IvfIndex.centroids(spark, s"$root/idx")
    val probeCells = Similarity.lloydRankedArr(
        qdf.select(col("qid").as("vid"),
          Similarity.milliQuant(col("embedding")).as("xq")), cent)
      .where(col("rn") <= 2).select(col("cell")).distinct().count()
    def leaves(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        leaves(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        leaves(q.plan)
      case _ if p.children.isEmpty => Seq(p)
      case _ => p.children.flatMap(leaves)
    }
    val scans = leaves(batch.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.metadata.get("Location").exists(_.contains("vectors")) =>
        f.selectedPartitions.partitionCount
    }
    assert(scans.nonEmpty && scans.forall(_ <= probeCells),
      s"batch vectors read must touch <= $probeCells probe-cell buckets, got $scans")
    val totalBuckets = new java.io.File(s"$root/idx/vectors")
      .listFiles.count(_.getName.startsWith("_bucket="))
    assert(probeCells < totalBuckets,
      s"pruning is only meaningful when probe cells ($probeCells) < stored buckets ($totalBuckets)")
  }

  test("delete erases subjects from the store; untouched buckets never rewritten; idempotent") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ivfdel").toString
    val emb = graft.sources.Tables.embeddings(spark, TestSpark.sf)
    val r = IvfIndex.build(spark, emb, "vec_id", "embedding", s"$root/idx",
      numBuckets = 16)

    def bucketFiles(): Map[String, Set[String]] =
      new java.io.File(s"$root/idx/vectors").listFiles
        .filter(_.getName.startsWith("_bucket=")).map { d =>
          d.getName -> d.listFiles.map(f =>
            s"${f.getName}:${f.length}").toSet
        }.toMap
    val before = bucketFiles()

    // pre-delete search wide enough to contain the future victims
    val qVec = emb.where(col("vec_id") === 5L)
      .select(col("embedding")).head.getSeq[Float](0)
    val pre = IvfIndex.search(spark, s"$root/idx", qVec, 20, nprobe = 2,
        numBuckets = 16, idCol = "vec_id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq

    // erase 3 subjects, among them the query's own stored twin (vec 5);
    // snapshot their cells BEFORE the rows disappear (expected-bucket set)
    val victims = Seq(5L, 6L, 7L).toDF("vec_id")
    val expected = KeyedParquetSink_cellsOf(spark, s"$root/idx",
        Seq(5L, 6L, 7L))
      .select(pmod(xxhash64(concat_ws("\u0000", col("cell"))), lit(16))
        .cast("int").as("b"))
      .collect().map(r0 => s"_bucket=${r0.getInt(0)}").toSet
    val removed = IvfIndex.delete(spark, s"$root/idx", victims, "vec_id",
      numBuckets = 16)
    assert(removed == 3L, s"3 stored subjects erased, got $removed")
    val st = IvfIndex.stats(spark, s"$root/idx")
    assert(st.agg(sum(col("n"))).head.getLong(0) == r.nVectors - 3L,
      "the store counts exactly the survivors")

    // post-delete search = the pre-delete ranking minus the erased ids
    // (nothing else moved: other rows' scores are untouched; victims
    // outside the probe cells simply never appeared in pre)
    val exp = pre.filterNot(p => Seq(5L, 6L, 7L).contains(p._1))
    val post = IvfIndex.search(spark, s"$root/idx", qVec, 17, nprobe = 2,
        numBuckets = 16, idCol = "vec_id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(pre.exists(_._1 == 5L) && !exp.exists(_._1 == 5L),
      "the query's own stored twin was visible before and filtered after")
    assert(post == exp.take(17),
      "post-delete ranking == pre-delete minus the erased subjects")
    assert(!post.exists(p => Seq(5L, 6L, 7L).contains(p._1)),
      "no erased subject is ever returned")

    // the rewrite touched ONLY the buckets the subjects' cells hash to
    // (expected set snapshotted before the delete, above)
    val after = bucketFiles()
    val changed = before.keySet.filter(k => before(k) != after.getOrElse(k, Set.empty))
    assert(changed.nonEmpty && changed.subsetOf(expected),
      s"only the victims' buckets may change: $changed vs $expected")
    assert(changed.size < before.size,
      "the erasure must NOT rewrite the whole table")

    // idempotent: a second identical erasure removes nothing, moves nothing
    val again = IvfIndex.delete(spark, s"$root/idx", victims, "vec_id",
      numBuckets = 16)
    assert(again == 0L, "re-deleting the same subjects matches nothing")
    // erasing unknown ids is a clean no-op
    val ghost = IvfIndex.delete(spark, s"$root/idx",
      Seq(999999L).toDF("vec_id"), "vec_id", numBuckets = 16)
    assert(ghost == 0L, "unknown subjects erase nothing")
  }

  /** The victims' cells, read the same way delete's locate pass reads
    * them (column-pruned vid+cell scan). */
  private def KeyedParquetSink_cellsOf(spark: org.apache.spark.sql.SparkSession,
                                       path: String,
                                       ids: Seq[Long]) = {
    import spark.implicits._
    graft.sinks.KeyedParquetSink.read(spark, s"$path/vectors")
      .select(col("vid"), col("cell"))
      .join(broadcast(ids.toDF("vid")), Seq("vid"), "left_semi")
      .select(col("cell")).distinct()
  }

  test("edges: tiny corpus builds; nprobe > cells degrades to brute force; empty append is a no-op") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_ivfedge").toString
    val emb3 = graft.sources.Tables.embeddings(spark, TestSpark.sf)
      .where(col("vec_id") < 3L)
    val r = IvfIndex.build(spark, emb3, "vec_id", "embedding", s"$root/idx",
      numBuckets = 4)
    assert(r.nVectors == 3L && r.cells == 4, s"3-vector corpus builds: $r")
    val qVec = emb3.where(col("vec_id") === 0L)
      .select(col("embedding")).head.getSeq[Float](0)
    // probing more cells than exist must rank EVERY vector — exactly the
    // brute-force top-k (same integer-bp cosine, same tiebreaks)
    val got = IvfIndex.search(spark, s"$root/idx", qVec, 2, nprobe = 99,
        numBuckets = 4, idCol = "vec_id", excludeId = Some(0L))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    val brute = Similarity.topKBrute(emb3, "vec_id", "embedding", 0L, 2)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(got == brute, s"nprobe > cells must equal brute force: $got vs $brute")
    // an empty batch appends nothing and leaves search untouched
    val appended = IvfIndex.append(spark, emb3.where(lit(false)),
      "vec_id", "embedding", s"$root/idx", numBuckets = 4)
    assert(appended == 0L)
    val again = IvfIndex.search(spark, s"$root/idx", qVec, 2, nprobe = 99,
        numBuckets = 4, idCol = "vec_id", excludeId = Some(0L))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq
    assert(again == got, "empty append must not perturb the index")
  }
}
