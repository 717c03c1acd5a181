package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class Round11bSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("q_band_join: bucket expansion is EXACTLY the naive band join") {
    // the whole point of the rewrite: replicate-to-3-buckets + equi-join
    // must produce the identical pair set the O(|A|·|B|) inequality join
    // produces — no pair lost at a bucket edge, none double-counted
    val ev = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("ts").isNotNull)
    val a = ev.where(col("event_type") === "error" && col("event_id") % 97 === 0)
      .select(col("event_id").as("a_id"), col("ts").cast("long").as("ea"))
    val b = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("ts").cast("long").as("eb"))
    val naive = a.join(b, abs(col("eb") - col("ea")) <= 600)
      .groupBy(expr("ea div 3600").as("hr"))
      .agg(count(lit(1)).as("n_pairs"),
        count_distinct(col("b_user")).as("n_b_users"),
        sum(abs(col("eb") - col("ea"))).as("sum_abs_lag"))
    val got = run("q_band_join")
    assert(got.unionAll(naive).except(got.intersect(naive)).isEmpty,
      "bucket-expansion result differs from the naive band join")
    assert(got.count() > 0, "fixture produced no band-join rows")
  }

  test("q_band_join: plan is a shuffle/broadcast HASH join, not BNLJ") {
    val plan = run("q_band_join").queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"band join fell back to a nested-loop plan:\n$plan")
  }

  test("text_linear_score: bands cover every nonempty doc; scores in model range") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
      .where(length(trim(col("text"))) > 0).count()
    val rows = run("text_linear_score").collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == docs,
      "every nonempty doc lands in exactly one (source, band) cell")
    rows.foreach { r =>
      assert(r.getAs[Long]("min_spt") >= -200 && r.getAs[Long]("max_spt") <= 280,
        "per-token mean score must stay inside the weight range")
      assert(r.getAs[Long]("min_spt") <= r.getAs[Long]("max_spt"))
    }
  }

  test("etl_l_diversity: risk is monotone in l and bounded by the table") {
    val rows = run("etl_l_diversity").collect()
      .map(r => (r.getAs[Long]("l"), r.getAs[Long]("n_classes"),
        r.getAs[Long]("low_div_classes"), r.getAs[Long]("risk_rows"),
        r.getAs[Long]("risk_bp"))).sortBy(_._1)
    assert(rows.map(_._1) sameElements Array(2L, 3L, 5L))
    // raising l can only flag MORE classes / rows
    assert(rows.sliding(2).forall(w => w(0)._3 <= w(1)._3 && w(0)._4 <= w(1)._4),
      "low-diversity risk must be monotone nondecreasing in l")
    rows.foreach(r => assert(r._3 <= r._2 && r._5 <= 10000L))
  }

  test("etl_dp_clip_plan: clipping arithmetic matches a direct per-user check") {
    val per = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("user_id").isNotNull)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("nu"))
    val direct = per.groupBy(col("event_type"))
      .agg(sum(greatest(col("nu") - 32L, lit(0L))).as("clip"),
        max(col("nu")).as("mx"))
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("clip"), r.getAs[Long]("mx")))).toMap
    run("etl_dp_clip_plan").collect().foreach { r =>
      val (clip, mx) = direct(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("clipped_rows") == clip)
      assert(r.getAs[Long]("max_contrib") == mx)
      assert(r.getAs[Long]("retained_bp") <= 10000L)
      // clipping to C=32 retains at least min(1, 32/max_contrib) of rows
      assert(r.getAs[Long]("clipped_rows") <= r.getAs[Long]("n_rows"))
    }
  }

  test("q_bloom_fpr_audit: members always probe positive (no false negatives)") {
    val r = run("q_bloom_fpr_audit").collect().head
    val bitsSet = r.getAs[Long]("bits_set")
    assert(bitsSet > 0 && bitsSet <= 4096L)
    assert(bitsSet <= 3L * r.getAs[Long]("n_keys"),
      "k=3 hashes can set at most 3 bits per key")
    assert(r.getAs[Long]("n_fp") <= r.getAs[Long]("n_probes"))
    assert(r.getAs[Long]("obs_fpr_bp") <= 10000L)
    // no-false-negative: every MEMBER key's 3 bits are set, so a member
    // probe can never miss — check by running the probe path on members
    val keys = graft.sources.Tables.orders(spark, TestSpark.sf)
      .select(col("o_custkey").as("k")).distinct().localCheckpoint(true)
    val bits = keys.select(col("k"),
        explode(array((0 until 3).map(i =>
          graft.ops.Sketch.cmsBucket(col("k"), lit(i.toLong), 4096L)): _*))
          .as("bit"))
      .select(col("bit")).distinct().localCheckpoint(true)
    val memberMiss = keys.select(col("k"),
        explode(array((0 until 3).map(i =>
          graft.ops.Sketch.cmsBucket(col("k"), lit(i.toLong), 4096L)): _*))
          .as("bit"))
      .join(bits, Seq("bit"), "left_anti").count()
    assert(memberMiss == 0, "a member key probed a cleared bit")
  }

  test("mm_ar_buckets: partition of the corpus; shard count is the exact ceil") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf).count()
    val rows = run("mm_ar_buckets").collect()
    assert(rows.map(_.getAs[Long]("n_imgs")).sum == docs,
      "every image lands in exactly one AR band")
    rows.foreach { r =>
      val (n, sh) = (r.getAs[Long]("n_imgs"), r.getAs[Long]("n_shards"))
      assert(sh == (n + 63) / 64, "shard count must be ceil(n/64)")
      val waste = r.getAs[Long]("pad_waste_bp")
      assert(waste >= 0 && waste < 10000L,
        "pad waste is a proper fraction of the padded volume")
    }
  }

  test("corpus_temperature_mix: isqrt is exact; temperature flattens the mix") {
    val rows = run("corpus_temperature_mix").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("t_chars"),
        r.getAs[Long]("w"), r.getAs[Long]("natural_bp"),
        r.getAs[Long]("temp_bp"), r.getAs[Long]("boost_bp")))
    rows.foreach { case (_, t, w, _, _, _) =>
      assert(w * w <= t && t < (w + 1) * (w + 1),
        s"w=$w is not the exact integer sqrt of t=$t")
    }
    // α = 0.5 temperature upweights SMALL sources relative to big ones:
    // boost ∝ 1/√t, so ordering by t must reverse the boost ordering
    val byT = rows.sortBy(_._2)
    assert(byT.head._6 >= byT.last._6,
      "smallest source must get at least the boost of the largest")
    // shares are near-partitions of 10000 (idiv truncation loses < 1 bp
    // per source)
    val ns = rows.map(_._4).sum
    val ts = rows.map(_._5).sum
    assert(ns > 10000 - rows.length && ns <= 10000)
    assert(ts > 10000 - rows.length && ts <= 10000)
  }
}
