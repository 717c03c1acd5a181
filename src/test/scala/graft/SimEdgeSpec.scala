package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Degenerate-input robustness for the sim_* similarity family: every
  * registered operator must execute cleanly over an embedding table
  * that carries all-zero vectors (norm 0 — every cosine guard's worst
  * case), exact duplicate vectors (distance 0 ties), near-epsilon
  * components that quantize to zero, and a constant-value vector. A
  * 100 TB embedding corpus always contains zero rows (failed encoder
  * batches) and duplicates (re-ingested shards).
  *
  * vec_id 0 — the query anchor every search op probes — is kept a
  * NORMAL vector; vec_id 1 is its exact duplicate.
  */
class SimEdgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val edgeDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-sim-edge").toString
    val src = java.nio.file.Paths.get(TestSpark.sf)
    java.nio.file.Files.list(src).forEach { p =>
      if (p.getFileName.toString != "embeddings.parquet")
        java.nio.file.Files.copy(p, java.nio.file.Paths.get(dir, p.getFileName.toString))
    }
    def vec(f: Int => Float): Array[Float] = Array.tabulate(64)(f)
    val rows = Seq(
      (0L, vec(i => (math.sin(i + 1) * 0.5).toFloat), 0),  // the query anchor
      (1L, vec(i => (math.sin(i + 1) * 0.5).toFloat), 1),  // exact dup of 0
      (2L, vec(_ => 0.0f), 2),                             // all-zero (norm 0)
      (3L, vec(_ => 0.0001f), 3),                          // quantizes to zero
      (4L, vec(_ => 0.25f), 4),                            // constant vector
      (5L, vec(i => if (i == 0) 1.0f else 0.0f), 5),       // one-hot
      (6L, vec(i => (math.cos(i + 1) * 0.5).toFloat), 6),
      (7L, vec(i => (math.cos(i + 1) * -0.5).toFloat), 7)) // antipode of 6
      .toDF("vec_id", "embedding", "label")
    rows.coalesce(1).write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  SparkEntry.queries.keys.filter(_.startsWith("sim_")).toSeq.sorted.foreach { name =>
    test(s"$name executes over zero / duplicate / epsilon / one-hot vectors") {
      val df = SparkEntry.queries(name)(spark, edgeDir)
      assert(df.columns.nonEmpty)
      df.count() // force full execution — must not throw
    }
  }

  test("sim_topk_brute ranks the exact duplicate first at cos_bp 10000") {
    val top = SparkEntry.queries("sim_topk_brute")(spark, edgeDir)
      .select($"vec_id", $"cos_bp").as[(Long, Long)].collect()
    assert(top.head == ((1L, 10000L)), "exact duplicate = perfect cosine")
    // zero-norm and quantized-to-zero vectors emit cosine 0, never NULL
    val byId = top.toMap
    assert(byId.get(2L).forall(_ == 0L))
    assert(byId.get(3L).forall(_ == 0L))
  }

  test("sim_l2_topk puts the exact duplicate at distance 0 and zero vectors at nsq") {
    val rows = SparkEntry.queries("sim_l2_topk")(spark, edgeDir)
      .select($"vec_id", $"l2m_sq").as[(Long, Long)].collect()
    assert(rows.head == ((1L, 0L)), "exact duplicate = zero distance")
    val byId = rows.toMap
    // against an all-zero (and epsilon→zero-quantized) vector the
    // distance collapses to the query's own squared norm
    val qnsq = byId(2L)
    assert(qnsq > 0L && byId(3L) == qnsq)
    assert(rows.map(_._2).sorted.sameElements(rows.map(_._2)), "ascending")
  }

  test("sim_hamming treats the antipodal pair as maximally distant") {
    val rows = SparkEntry.queries("sim_hamming")(spark, edgeDir).collect()
    assert(rows.nonEmpty) // executes and emits; exact bit math is
    // oracle-checked at sf0.01 — here the antipode must not tie the dup
  }

  test("autoCells follows the power-of-two sqrt rule with the [4,4096] clamp") {
    import graft.ops.Similarity.autoCells
    assert(autoCells(1L) == 4 && autoCells(16L) == 4 && autoCells(17L) == 8)
    assert(autoCells(500L) == 32, "the sf0.01 gate corpus trains 32 cells")
    assert(autoCells(2000L) == 64 && autoCells(1L << 24) == 4096)
    assert(autoCells(Long.MaxValue) == 4096, "hard ceiling holds")
  }

  test("sim_ivf_auto_probe_curve: recall is monotone non-decreasing in nprobe") {
    val pts = graft.SparkEntry.queries("sim_ivf_auto_probe_curve")(
        spark, TestSpark.sf)
      .collect().map(r => r.getAs[Long]("nprobe") -> r.getAs[Long]("recall_bp"))
    assert(pts.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L))
    assert(pts.map(_._2).sliding(2).forall(p => p(0) <= p(1)),
      s"recall must not drop as probes widen: ${pts.toSeq}")
    assert(pts.last._2 > pts.head._2 || pts.head._2 == 10000L,
      "widening probes must buy recall on the gate corpus")
  }

  test("sim_ivf_auto assigns the FULL corpus to sample-trained cells") {
    val emb = graft.sources.Tables.embeddings(spark, TestSpark.sf)
    val n = emb.count()
    val stats = SparkEntry.queries("sim_ivf_auto")(spark, TestSpark.sf)
      .collect()
    assert(stats.map(_.getAs[Long]("n")).sum == n,
      "every corpus vector lands in exactly one trained cell")
    val cells = graft.ops.Similarity.autoCells(n)
    assert(stats.forall(_.getAs[Long]("n_cells") == cells.toLong))
    assert(stats.length <= cells, "at most autoCells occupied")
    // the train sample (8·cells by md5) is a strict subset here, so the
    // sampled-Lloyd path is genuinely distinct from full-corpus training
    assert(8L * cells < n, "fixture keeps the sample a strict subset")
  }
}
