package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Value-level invariants for the round-9 operators (exact cross-engine
  * values are checked by tools/verify_local.py; these pin the semantic
  * properties the oracle compare can't express). */
class Round9Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("q_weighted_percentile: median satisfies the weighted-median property") {
    val rows = run("q_weighted_percentile").collect()
    assert(rows.length == 3) // three return flags
    // raw per-(rf, cents) weights to test 2·W(<m) < tot ≤ 2·W(≤m)
    val raw = graft.sources.Tables.lineitem(spark, TestSpark.sf)
      .groupBy(col("l_returnflag").as("rf"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
      .agg(sum(round(col("l_quantity")).cast("long")).as("w"))
      .collect()
      .groupBy(_.getAs[String]("rf"))
    rows.foreach { r =>
      val rf = r.getAs[String]("rf")
      val m = r.getAs[Long]("median_cents")
      val tot = r.getAs[Long]("total_w")
      val ws = raw(rf).map(x => x.getAs[Long]("cents") -> x.getAs[Long]("w"))
      assert(ws.map(_._2).sum == tot, s"$rf total_w")
      val wLe = ws.filter(_._1 <= m).map(_._2).sum
      val wLt = ws.filter(_._1 < m).map(_._2).sum
      assert(2 * wLe >= tot, s"$rf: 2·W(≤median) < total")
      assert(2 * wLt < tot, s"$rf: median is not the minimal qualifying value")
    }
  }

  test("q_skyline: frontier is mutually non-dominating and complete") {
    val rows = run("q_skyline").collect().sortBy(_.getAs[Long]("cents"))
    assert(rows.nonEmpty)
    // strictly increasing cents, strictly decreasing date — no point
    // dominates another (the defining skyline property)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("cents") < b.getAs[Long]("cents"))
        assert(a.getAs[Long]("day_epoch") > b.getAs[Long]("day_epoch"),
          s"dominated point on frontier: $a vs $b")
      case _ => ()
    }
    val o = graft.sources.Tables.orders(spark, TestSpark.sf).select(
      round(col("o_totalprice") * 100).cast("long").as("cents"),
      datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("d")).collect()
      .map(r => (r.getAs[Long]("cents"), r.getAs[Long]("d")))
    // frontier endpoints pin to the global minima of each axis
    assert(rows.head.getAs[Long]("cents") == o.map(_._1).min, "min-price endpoint")
    assert(rows.last.getAs[Long]("day_epoch") == o.map(_._2).min, "min-date endpoint")
    // completeness: every order is dominated-or-equalled by some frontier point
    val front = rows.map(r => (r.getAs[Long]("cents"), r.getAs[Long]("day_epoch")))
    o.foreach { case (c, d) =>
      assert(front.exists { case (fc, fd) => fc <= c && fd <= d },
        s"order ($c, $d) uncovered by frontier")
    }
    // n_orders counts the orders sitting exactly on the point
    rows.foreach { r =>
      val n = o.count(x => x._1 == r.getAs[Long]("cents") &&
        x._2 == r.getAs[Long]("day_epoch"))
      assert(n == r.getAs[Long]("n_orders"), s"point count mismatch: $r")
    }
  }

  test("dedup_simhash_hamming: pairs verified by exact popcount; low bits agree with simhash16") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
    val toks = graft.ops.TextAnalysis.tokens(col("text"))
    val fps = docs.select(col("doc_id"),
      graft.functions.TextFunctions.simhash64(toks).as("fp64"),
      graft.functions.TextFunctions.simhash16(toks).as("fp16")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("fp64"), r.getAs[Long]("fp16"))).toMap
    // the 64-bit fingerprint's low 16 bits ARE the 16-bit fingerprint
    // (same digits, same votes) — kernel-generalization regression pin
    fps.values.foreach { case (f64, f16) => assert((f64 & 0xFFFFL) == f16) }
    val pairs = run("dedup_simhash_hamming").collect()
    assert(pairs.nonEmpty)
    pairs.foreach { p =>
      val (a, b, h) = (p.getAs[Long]("a"), p.getAs[Long]("b"), p.getAs[Long]("hamming"))
      assert(a < b)
      assert(h >= 0 && h <= 3)
      assert(java.lang.Long.bitCount(fps(a)._1 ^ fps(b)._1) == h,
        s"popcount mismatch for ($a, $b)")
    }
  }

  test("corpus_pack_budget: shards partition the corpus in doc order") {
    val rows = run("corpus_pack_budget").collect().sortBy(_.getAs[Long]("shard"))
    assert(rows.nonEmpty)
    val d = graft.sources.Tables.documents(spark, TestSpark.sf)
      .agg(count(lit(1)).as("n"),
        sum(graft.ops.TextAnalysis.tokenCount(col("text"))).as("nt")).collect()(0)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == d.getAs[Long]("n"))
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == d.getAs[Long]("nt"))
    // contiguous shard ids and non-overlapping increasing doc ranges
    rows.zipWithIndex.foreach { case (r, i) => assert(r.getAs[Long]("shard") == i) }
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
      case _ => ()
    }
    // greedy rule: a new shard opens only once the previous crossed its
    // 20k budget boundary — cumulative tokens through shard k ≥ (k+1)·B
    // for every non-final shard
    var cum = 0L
    rows.dropRight(1).foreach { r =>
      cum += r.getAs[Long]("n_tokens")
      assert(cum >= (r.getAs[Long]("shard") + 1) * 20000L,
        s"shard ${r.getAs[Long]("shard")} closed before its budget filled")
    }
  }
}
