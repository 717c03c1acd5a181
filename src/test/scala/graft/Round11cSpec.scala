package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class Round11cSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("sim_pq_adc_sdc: the ADC half IS sim_pq_search's ranking") {
    // both routes share pqSeeds/pqCodes, so the asymmetric half of the
    // comparison must reproduce the standalone ADC query exactly
    val cmp = run("sim_pq_adc_sdc").collect()
    val adc = cmp.filter(_.getAs[String]("method") == "adc")
      .sortBy(_.getAs[Long]("rank"))
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("dist")))
    val standalone = run("sim_pq_search").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("adist")))
    assert(adc.toSeq == standalone.toSeq,
      "comparison's ADC ranking drifted from sim_pq_search")
    val sdc = cmp.filter(_.getAs[String]("method") == "sdc")
    assert(adc.length == 10 && sdc.length == 10)
    // SDC scores through two quantizations — distances stay sane
    sdc.foreach(r => assert(r.getAs[Long]("dist") >= 0L))
    // the two modes must still agree on part of the neighborhood (the
    // hash-sampled 16-codeword, 4-subspace fixture codebook is coarse:
    // measured overlap is 3/10 — the double quantization is exactly the
    // cost the query exists to expose)
    val overlap = adc.map(_._1).toSet
      .intersect(sdc.map(_.getAs[Long]("vec_id")).toSet).size
    assert(overlap >= 2, s"ADC∩SDC top-10 overlap $overlap < 2 — " +
      "symmetric scoring collapsed beyond any plausible quantization cost")
  }

  test("graph_core_number: cores nest and partition the node set") {
    val pairs = graft.queries.TextDedup.sharedPairs05(spark, TestSpark.sf)
      .select(col("a"), col("b")).localCheckpoint(true)
    val allNodes = pairs.select(col("a").as("node"))
      .unionAll(pairs.select(col("b").as("node"))).distinct().count()
    val hist = run("graph_core_number").collect()
      .map(r => r.getAs[Long]("core") -> r.getAs[Long]("n_nodes")).toMap
    assert(hist.values.sum == allNodes,
      "core labels partition the nodes of the pair graph")
    assert(hist.keySet.subsetOf(Set(1L, 2L, 3L)))
    // nesting: the k-core member sets shrink as k grows
    val m2 = graft.ops.Graph.coreMembers(pairs, 2, 3)
    val m3 = graft.ops.Graph.coreMembers(pairs, 3, 3)
    assert(m3.join(m2, Seq("node"), "left_anti").count() == 0,
      "3-core members must all be 2-core members")
    assert(hist.getOrElse(3L, 0L) == m3.count(),
      "core-3 histogram row == 3-core membership count")
  }

  test("text_bigram_entropy: entropy bounded by log2 of the bigram volume") {
    val rows = run("text_bigram_entropy").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, nd) = (r.getAs[Long]("n"), r.getAs[Long]("n_distinct"))
      val ent = r.getAs[Long]("ent_cb")
      val ilog2n = 63 - java.lang.Long.numberOfLeadingZeros(n)
      assert(nd <= n)
      assert(ent >= 0 && ent <= 100L * ilog2n,
        s"pseudo-entropy $ent cb outside [0, ${100 * ilog2n}]")
      assert(r.getAs[Long]("top_share_bp") >= 10000L / nd,
        "top bigram must carry at least the mean share")
    }
  }
}
