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

  test("sim_knn_cc: components match an independent union-find over the kNN edges") {
    val edges = run("sim_knn_graph").collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst")))
    assert(edges.nonEmpty)
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(t => Seq(t._1, t._2)).distinct
    val expected = nodes.groupBy(find)
      .map { case (root, ms) => (ms.min, ms.length.toLong, ms.max) }.toSet
    val got = run("sim_knn_cc").collect()
      .map(r => (r.getAs[Long]("component"), r.getAs[Long]("n_members"),
        r.getAs[Long]("max_id"))).toSet
    assert(got == expected, "component (min-id label, size, max-id) sets differ")
  }

  test("sim_rank_corr: Spearman ingredients over a 32-row rank permutation") {
    val r = run("sim_rank_corr").collect()(0)
    val (n, d2, ad, mx) = (r.getAs[Long]("n"), r.getAs[Long]("sum_d2"),
      r.getAs[Long]("sum_absd"), r.getAs[Long]("max_absd"))
    assert(n == 32)
    // both rankings are permutations of 1..n over the SAME set, so Σd = 0
    // ⇒ Σ|d| is even; and d² ≥ |d| pointwise ⇒ Σd² ≥ Σ|d|
    assert(ad % 2 == 0, "Σ|d| must be even when Σd = 0")
    assert(d2 >= ad)
    assert(mx <= n - 1 && mx * mx <= d2)
  }

  test("events_autocorr: moment sums match a driver-side recompute") {
    val daily = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("ts").isNotNull)
      .groupBy(datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("d"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("d") -> r.getAs[Long]("n")).toMap
    val rows = run("events_autocorr").collect()
      .map(r => r.getAs[Long]("lg") -> r).toMap
    assert(rows.keySet == Set(1L, 7L))
    Seq(1L, 7L).foreach { lg =>
      val pairs = daily.toSeq.flatMap { case (d, x) =>
        daily.get(d + lg).map(y => (x, y)) }
      val r = rows(lg)
      assert(r.getAs[Long]("n_pairs") == pairs.length.toLong, s"lag $lg n_pairs")
      assert(r.getAs[Long]("sum_xy") == pairs.map(p => p._1 * p._2).sum, s"lag $lg Σxy")
      assert(r.getAs[Long]("sum_x2") == pairs.map(p => p._1 * p._1).sum, s"lag $lg Σx²")
    }
  }

  test("events_changepoint: every split conserves totals; score is the cross-product") {
    val rows = run("events_changepoint").collect()
    val totN = rows.head.getAs[Long]("n_before") + rows.head.getAs[Long]("n_after")
    val totS = rows.head.getAs[Long]("sum_before") + rows.head.getAs[Long]("sum_after")
    assert(rows.length == totN - 1, "one split per day except the last")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_before") + r.getAs[Long]("n_after") == totN)
      assert(r.getAs[Long]("sum_before") + r.getAs[Long]("sum_after") == totS)
      assert(r.getAs[Long]("score") ==
        math.abs(r.getAs[Long]("n_before") * r.getAs[Long]("sum_after") -
          r.getAs[Long]("n_after") * r.getAs[Long]("sum_before")))
    }
  }

  test("text_readability_bands: bands partition the corpus and bound their ratios") {
    val rows = run("text_readability_bands").collect()
    val nDocs = graft.sources.Tables.documents(spark, TestSpark.sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.foreach { r =>
      val b = r.getAs[Long]("band")
      assert(b >= 0, "vowel counts are non-negative")
      assert(r.getAs[Long]("min_vpw_bp") / 1000 == b)
      assert(r.getAs[Long]("max_vpw_bp") / 1000 == b)
      assert(r.getAs[Long]("min_vpw_bp") <= r.getAs[Long]("max_vpw_bp"))
    }
  }

  test("corpus_interleave_plan: full 50-doc stripes per source until exhaustion") {
    val rows = run("corpus_interleave_plan").collect()
    val perSource = graft.sources.Tables.documents(spark, TestSpark.sf)
      .groupBy(col("source")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n")).toMap
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.keySet == perSource.keySet)
    bySource.foreach { case (src, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("pos_blk"))
      assert(sorted.map(_.getAs[Long]("n_docs")).sum == perSource(src))
      // every stripe but the last is exactly full; ranges don't overlap
      sorted.dropRight(1).foreach(r => assert(r.getAs[Long]("n_docs") == 50L,
        s"$src stripe ${r.getAs[Long]("pos_blk")} not full"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
        case _ => ()
      }
    }
  }

  test("events_type_overlap: mask histogram partitions users; masks decode to real types") {
    val rows = run("events_type_overlap").collect()
    val users = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("user_id").isNotNull)
      .select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == users)
    rows.foreach { r =>
      val m = r.getAs[Long]("mask")
      assert(m >= 1 && m <= 31, "mask covers only the 5 known types")
      assert(r.getAs[Long]("n_types") == java.lang.Long.bitCount(m).toLong)
    }
    // derivability: users who did BOTH click (bit 1) and purchase (bit 4)
    // from the histogram == a direct intersect count
    val both = rows.filter(r => (r.getAs[Long]("mask") & 5L) == 5L)
      .map(_.getAs[Long]("n_users")).sum
    val ev = graft.sources.Tables.events(spark, TestSpark.sf)
    val direct = ev.where(col("event_type") === "click").select(col("user_id"))
      .intersect(ev.where(col("event_type") === "purchase").select(col("user_id")))
      .count()
    assert(both == direct, "click∩purchase from masks vs direct intersect")
  }

  test("events_ewma: dyadic weights reconstruct from the daily series") {
    val daily = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("ts").isNotNull)
      .groupBy(datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("d"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getAs[Long]("d"), r.getAs[Long]("n"))).sortBy(_._1)
    val rows = run("events_ewma").collect()
    assert(rows.length == daily.length)
    rows.zipWithIndex.foreach { case (r, i) =>
      val taps = (0 to 7).flatMap(k => if (i - k >= 0) Some((1L << (7 - k), daily(i - k)._2)) else None)
      val num = taps.map(t => t._1 * t._2).sum
      val den = taps.map(_._1).sum
      assert(r.getAs[Long]("num") == num, s"row $i num")
      assert(r.getAs[Long]("den") == den, s"row $i den")
      assert(r.getAs[Long]("ewma_milli") == num * 1000 / den)
    }
  }

  test("sim_cov_moments: full upper triangle; diagonal matches norm sums") {
    val rows = run("sim_cov_moments").collect()
    assert(rows.length == 64 * 65 / 2, "2080 upper-triangle cells")
    val nVec = graft.sources.Tables.embeddings(spark, TestSpark.sf).count()
    rows.foreach(r => assert(r.getAs[Long]("n") == nVec))
    // Σ over the diagonal = Σ over vectors of ‖x‖² (exact integer twin)
    val diag = rows.filter(r => r.getAs[Long]("d1") == r.getAs[Long]("d2"))
      .map(_.getAs[Long]("sum_xy")).sum
    val normSum = graft.sources.Tables.embeddings(spark, TestSpark.sf)
      .select(graft.ops.Similarity.normSqMilli(
        graft.ops.Similarity.milliQuant(col("embedding"))).as("nsq"))
      .agg(sum(col("nsq"))).collect()(0).getLong(0)
    assert(diag == normSum, "trace of the Gram moments vs direct norm sums")
  }

  test("q7_trade_volume: bilateral pairs exclude domestic trade and cover all cross-nation items") {
    val rows = run("q7_trade_volume").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("supp_nation") != r.getAs[String]("cust_nation"))
      assert(r.getAs[Long]("n_items") > 0)
    }
    // completeness: cross-nation + domestic item counts partition the
    // joined fact table (independent single-pass recompute)
    val l = graft.sources.Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_orderkey"), col("l_suppkey"))
    val o = graft.sources.Tables.orders(spark, TestSpark.sf)
      .select(col("o_orderkey"), col("o_custkey"))
    val c = graft.sources.Tables.customer(spark, TestSpark.sf)
      .select(col("c_custkey"), col("c_nationkey").as("c_nk"))
    val su = graft.sources.Tables.supplier(spark, TestSpark.sf)
      .select(col("s_suppkey"), col("s_nationkey").as("s_nk"))
    val joined = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(su, col("l_suppkey") === col("s_suppkey"))
    val cross = joined.where(col("s_nk") =!= col("c_nk")).count()
    assert(rows.map(_.getAs[Long]("n_items")).sum == cross)
  }

  test("q8_market_share: shares are exact truncating divisions that sum to ~10000 per year") {
    val rows = run("q8_market_share").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("yr")).foreach { case (yr, rs) =>
      val tot = rs.map(_.getAs[Long]("nat_cents")).sum
      rs.foreach { r =>
        assert(r.getAs[Long]("share_bp") ==
          r.getAs[Long]("nat_cents") * 10000 / tot, s"$yr share mismatch")
      }
      val sumBp = rs.map(_.getAs[Long]("share_bp")).sum
      assert(sumBp <= 10000 && sumBp > 10000 - rs.length,
        s"$yr: truncating shares must sum within one ulp per nation")
    }
  }

  test("corpus_split_leakage: splits partition the corpus; leakage matches the pair set") {
    val rows = run("corpus_split_leakage").collect()
      .map(r => r.getAs[String]("split") -> r).toMap
    assert(rows.keySet == Set("train", "val"))
    val nDocs = graft.sources.Tables.documents(spark, TestSpark.sf).count()
    assert(rows.values.map(_.getAs[Long]("n_docs")).sum == nDocs)
    // leakage recomputed from the independently-run jaccard pair op and
    // the documented hash-split rule
    def bucket(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val hex = "%02x".format(h(0))
      (Character.digit(hex(0), 16) * 16 + Character.digit(hex(1), 16)) % 10
    }
    val pairs = run("dedup_ngram_jaccard").collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Double]("jaccard")))
      .filter(_._3 >= 0.5)
    val expLeak = pairs.count { case (a, b, _) => (bucket(a) == 0) != (bucket(b) == 0) }
    rows.values.foreach { r =>
      assert(r.getAs[Long]("leak_pairs") == expLeak.toLong)
      assert(r.getAs[Long]("leak_bp") ==
        (if (pairs.isEmpty) 0L else expLeak.toLong * 10000 / pairs.length))
    }
  }

  test("events_dow_anomaly: weekday baselines and flags reconstruct from the spine") {
    val rows = run("events_dow_anomaly").collect()
    val byDow = rows.groupBy(_.getAs[Long]("dow"))
    assert(byDow.keySet.subsetOf((0L to 6L).toSet))
    byDow.foreach { case (dow, rs) =>
      val sum = rs.map(_.getAs[Long]("n")).sum
      val cnt = rs.length.toLong
      rs.foreach { r =>
        assert(r.getAs[Long]("dow_sum") == sum && r.getAs[Long]("dow_cnt") == cnt)
        assert((r.getAs[Long]("day_epoch") + 4) % 7 == dow)
        assert(r.getAs[Long]("hi_flag") ==
          (if (r.getAs[Long]("n") * cnt * 2 > sum * 3) 1L else 0L))
        assert(r.getAs[Long]("lo_flag") ==
          (if (r.getAs[Long]("n") * cnt * 2 < sum) 1L else 0L))
      }
    }
  }

  test("text_surprisal_bits: bands cover all multi-token docs; bits bounded by corpus log2") {
    val rows = run("text_surprisal_bits").collect()
    val docsWithBigrams = graft.sources.Tables.documents(spark, TestSpark.sf)
      .where(size(graft.ops.TextAnalysis.tokens(col("text"))) >= 2).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docsWithBigrams)
    val totalBigrams = rows.map(_.getAs[Long]("sum_bigrams")).sum
    rows.foreach { r =>
      val band = r.getAs[Long]("band")
      assert(band >= 0, "floor-log2 of n1 ≥ n2 cannot go negative")
      // a bigram's bits ≤ floor(log2(total occurrences)) + 1
      assert(band <= 64 - java.lang.Long.numberOfLeadingZeros(totalBigrams) + 1)
      // band is the floor average: band ≤ sum/nb < band+1
      val (sb, nb) = (r.getAs[Long]("sum_bits"), r.getAs[Long]("sum_bigrams"))
      assert(r.getAs[Long]("n_docs") > 0 && sb >= band * 0) // sanity
    }
  }

  test("dedup_priority_keeper: ledger conserves duplicate docs; keepers beat drops on (source, id)") {
    val rows = run("dedup_priority_keeper").collect()
    val d = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("source"), md5(col("text")).as("h")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[String]("h")))
    val groups = d.groupBy(_._3).filter(_._2.length > 1)
    val keepers = groups.values.map(_.minBy(t => (t._2, t._1))).toSeq
    val winBySrc = keepers.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val dropBySrc = groups.values.flatten.toSeq.diff(keepers)
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val got = rows.map(r => r.getAs[String]("source") ->
      ((r.getAs[Long]("n_wins"), r.getAs[Long]("n_dropped")))).toMap
    assert(got.keySet == (winBySrc.keySet ++ dropBySrc.keySet))
    got.foreach { case (src, (w, dr)) =>
      assert(w == winBySrc.getOrElse(src, 0L), s"$src wins")
      assert(dr == dropBySrc.getOrElse(src, 0L), s"$src drops")
    }
  }

  test("corpus_pack_split: every non-final shard lands exactly on budget; carries chain") {
    val rows = run("corpus_pack_split").collect().sortBy(_.getAs[Long]("shard"))
    assert(rows.nonEmpty)
    val totalTokens = graft.sources.Tables.documents(spark, TestSpark.sf)
      .agg(sum(graft.ops.TextAnalysis.tokenCount(col("text")))).collect()(0).getLong(0)
    rows.zipWithIndex.foreach { case (r, i) => assert(r.getAs[Long]("shard") == i) }
    // splitting packs PERFECTLY: every shard but the last holds exactly 20k
    rows.dropRight(1).foreach(r => assert(r.getAs[Long]("n_tokens") == 20000L,
      s"shard ${r.getAs[Long]("shard")} not exactly on budget"))
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == totalTokens)
    // a doc carried into shard s must have started in an earlier shard,
    // and at most one doc can straddle each boundary going forward
    rows.foreach(r => assert(r.getAs[Long]("n_carried_in") <= 1 ||
      r.getAs[Long]("shard") > 0))
    val nDocs = graft.sources.Tables.documents(spark, TestSpark.sf)
      .where(graft.ops.TextAnalysis.tokenCount(col("text")) > 0).count()
    assert(rows.map(_.getAs[Long]("n_started")).sum == nDocs)
  }

  test("corpus_quality_sample: keep decisions reconstruct from the documented policy") {
    val rows = run("corpus_quality_sample").collect()
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("source"),
        graft.ops.TextAnalysis.tokenCount(col("text")).as("nt"),
        graft.ops.TextAnalysis.stopwordCount(col("text")).as("ns")).collect()
    def draw(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      (((h(0) & 0xFF).toLong * 256 + (h(1) & 0xFF)) % 10000 + 10000) % 10000
    }
    val ref = docs.map { r =>
      val (id, src, nt, ns) = (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("nt"), r.getAs[Long]("ns"))
      val keepBp = 2000L + math.min(ns * 10000 / math.max(nt, 1L), 4000L) +
        (if (nt >= 5 && nt <= 1000) 4000L else 0L)
      (src, if (draw(id) < keepBp) 1L else 0L, nt)
    }.groupBy(_._1)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val kept = ref(src).map(_._2).sum
      assert(r.getAs[Long]("n_kept") == kept, s"$src kept")
      assert(r.getAs[Long]("kept_tokens") ==
        ref(src).filter(_._2 == 1).map(_._3).sum, s"$src kept tokens")
      assert(r.getAs[Long]("keep_share_bp") == kept * 10000 / ref(src).size)
    }
  }

  test("etl_ttl_sweep: expiry split conserves counts and matches the policy") {
    val rows = run("etl_ttl_sweep").collect()
    val ttlOf = Map("error" -> 30L, "view" -> 90L, "click" -> 90L,
      "purchase" -> 365L, "signup" -> 365L)
    val ev = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("ts").isNotNull)
      .select(col("event_type"), unix_millis(col("ts")).as("ems")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("ems")))
    val ref = ev.map(_._2).max
    assert(rows.map(_.getAs[Long]("n_total")).sum == ev.length.toLong)
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      assert(r.getAs[Long]("ttl_days") == ttlOf(et))
      assert(r.getAs[Long]("n_expired") + r.getAs[Long]("n_retained") ==
        r.getAs[Long]("n_total"))
      val cutoff = ref - ttlOf(et) * 86400000L
      assert(r.getAs[Long]("n_expired") ==
        ev.count(e => e._1 == et && e._2 < cutoff).toLong, s"$et expired count")
    }
  }
}
