package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Value-level invariants for the round-6 analytics operators (the exact
  * cross-engine value check is tools/verify_local.py; these pin the
  * semantic properties the oracle compare can't express). */
class AnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("q_stats_corr: correlations are in [-1, 1] and slope/intercept defined") {
    val rows = run("q_stats_corr").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val corr = r.getAs[Long]("corr_micro")
      assert(corr >= -1000000L && corr <= 1000000L, s"corr out of range: $r")
      assert(!r.isNullAt(r.fieldIndex("slope_micro")) &&
        !r.isNullAt(r.fieldIndex("intercept_q")))
    }
  }

  test("q_decile_stats: 10 deciles per priority, monotone boundaries, sizes within 1") {
    val rows = run("q_decile_stats").collect()
      .groupBy(_.getAs[String]("o_orderpriority"))
    rows.foreach { case (prio, ds) =>
      assert(ds.map(_.getAs[Int]("decile")).toSet == (1 to 10).toSet, s"$prio deciles")
      val sorted = ds.sortBy(_.getAs[Int]("decile"))
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a.getAs[Double]("hi") <= b.getAs[Double]("hi"), s"$prio hi not monotone") }
      val ns = ds.map(_.getAs[Long]("n"))
      assert(ns.max - ns.min <= 1, s"$prio ntile sizes differ by >1: ${ns.toSeq}")
    }
  }

  test("events_markov: probabilities sum to ~10000 bp per from_type") {
    val rows = run("events_markov").collect()
    val byFrom = rows.groupBy(_.getAs[String]("from_type"))
    byFrom.foreach { case (f, rs) =>
      val total = rs.map(_.getAs[Long]("prob_bp")).sum
      // integer floor division loses < 1 bp per destination
      assert(total <= 10000 && total > 10000 - rs.length, s"$f sums to $total bp")
    }
  }

  test("events_attribution: purchase count reconciles with the raw table") {
    val attributed = run("events_attribution").agg(sum("n_purchases")).head.getLong(0)
    val raw = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("event_type") === "purchase").count()
    assert(attributed == raw)
  }

  test("events_sequence_match: every matched path user has a signup and a later purchase") {
    val matched = run("events_sequence_match")
    assert(matched.count() > 0)
    // spot-check: every returned user indeed has both event types
    val users = matched.select("user_id").limit(20).collect().map(_.getLong(0))
    val ev = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("user_id").isin(users: _*))
      .groupBy("user_id").agg(collect_set("event_type").as("types"))
      .collect()
    ev.foreach { r =>
      val types = r.getAs[Seq[String]]("types").toSet
      assert(types.contains("signup") && types.contains("purchase"))
    }
  }

  test("etl_profile: one row per customer column, zero nulls, sane distincts") {
    val rows = run("etl_profile").collect()
    assert(rows.map(_.getAs[String]("col")).toSet ==
      Set("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n") - r.getAs[Long]("n_null"))
    }
    val custkey = rows.find(_.getAs[String]("col") == "c_custkey").get
    assert(custkey.getAs[Long]("n_distinct") == custkey.getAs[Long]("n")) // PK unique
  }

  test("etl_fk_orphans: all four edges audited, clean testdata has zero orphans") {
    val rows = run("etl_fk_orphans").collect()
    assert(rows.map(_.getAs[String]("edge")).toSet == Set(
      "lineitem->orders", "lineitem->part", "lineitem->supplier", "orders->customer"))
    rows.foreach(r => assert(r.getAs[Long]("orphans") == 0L, r.toString))
  }

  test("text_gini_diversity: gini_bp in [0, 10000), 0 iff single-type doc") {
    val rows = run("text_gini_diversity").collect()
    rows.foreach { r =>
      val g = r.getAs[Long]("gini_bp")
      assert(g >= 0 && g < 10000, r.toString)
      if (r.getAs[Long]("n_types") == 1) assert(g == 0)
    }
  }

  test("etl_data_drift: halves partition the stream and shares sum to ~10000 bp") {
    val rows = run("etl_data_drift").collect()
    val total = graft.sources.Tables.events(spark, TestSpark.sf).count()
    assert(rows.map(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b")).sum == total)
    val sa = rows.map(_.getAs[Long]("share_a_bp")).sum
    assert(sa <= 10000 && sa > 10000 - rows.length)
    rows.foreach(r => assert(r.getAs[Long]("drift_bp") >= 0))
  }

  test("etl_backfill_plan: every day status'd, counts reconcile") {
    val rows = run("etl_backfill_plan").collect()
    val total = graft.sources.Tables.events(spark, TestSpark.sf).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    assert(rows.forall(r => Set("ok", "backfill")(r.getAs[String]("status"))))
  }

  test("events_dwell: gaps are non-negative and counts reconcile to n-1 per user") {
    val rows = run("events_dwell").collect()
    rows.foreach(r => assert(r.getAs[Double]("mean_gap_s") >= 0.0))
    val totalGaps = rows.map(_.getAs[Long]("n")).sum
    val ev = graft.sources.Tables.events(spark, TestSpark.sf)
    val expect = ev.count() - ev.select("user_id").distinct().count()
    assert(totalGaps == expect)
  }

  test("dedup_threshold_sweep: band counts cover every candidate pair") {
    val sweep = run("dedup_threshold_sweep").collect()
    val swept = sweep.map(_.getAs[Long]("n_pairs")).sum
    val allPairs = graft.ops.Dedup.ngramJaccardPairs(
      graft.sources.Tables.documents(spark, TestSpark.sf), "doc_id", "text", 3, 0.0).count()
    assert(swept == allPairs)
    // the >=0.1 bands must agree with dedup_ngram_jaccard's 0.1 cutoff
    val ge01 = sweep.filter(_.getAs[String]("band") != "<0.1")
      .map(_.getAs[Long]("n_pairs")).sum
    assert(ge01 == run("dedup_ngram_jaccard").count())
  }

  test("dedup_containment: canonical pairs at or above the 0.8 threshold") {
    val rows = run("dedup_containment").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("a") < r.getAs[Long]("b"))
      val c = r.getAs[Double]("containment")
      assert(c >= 0.8 && c <= 1.0, r.toString)
    }
  }

  test("dedup_report: per-source doc counts reconcile and dups = docs - unique fingerprints") {
    val rows = run("dedup_report").collect()
    val totalDocs = graft.sources.Tables.documents(spark, TestSpark.sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == totalDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_dup_docs") ==
        r.getAs[Long]("n_docs") - r.getAs[Long]("n_unique_fp"))
    }
  }

  test("text_hash_features: buckets in [0,64) and counts reconcile to token totals") {
    val feats = run("text_hash_features")
    val bad = feats.where(col("bucket") < 0 || col("bucket") >= 64).count()
    assert(bad == 0)
    val featTotal = feats.agg(sum("cnt")).head.getLong(0)
    val tokTotal = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(graft.ops.TextAnalysis.tokenCount(col("text")).as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(featTotal == tokTotal)
  }

  test("events_rfm: one row per user, segment rules hold") {
    val rows = run("events_rfm").collect()
    val users = graft.sources.Tables.events(spark, TestSpark.sf)
      .select("user_id").distinct().count()
    assert(rows.length == users)
    rows.foreach { r =>
      val seg = r.getAs[String]("segment")
      assert(Set("never", "champion", "active", "lapsed")(seg))
      if (r.getAs[Long]("frequency") == 0L) assert(seg == "never")
      else assert(r.getAs[Long]("monetary_cents") >= 0L && !r.isNullAt(r.fieldIndex("recency_d")))
    }
  }

  test("sim_knn_graph: edges are canonical (src<dst), same-label, cos in [-1,1]") {
    val edges = run("sim_knn_graph").collect()
    assert(edges.nonEmpty)
    edges.foreach { r =>
      assert(r.getAs[Long]("src") < r.getAs[Long]("dst"))
      val c = r.getAs[Long]("cos_bp")
      assert(c >= -10000L && c <= 10000L)
    }
    val labels = graft.sources.Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    edges.foreach { r =>
      assert(labels(r.getAs[Long]("src")) == labels(r.getAs[Long]("dst")), s"cross-label edge: $r")
    }
  }
}
