package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Value-level invariants for the vocabulary / SQ8 / basket / DQ-rule
  * operators (the exact cross-engine value check is tools/verify_local.py;
  * these pin semantic properties the oracle compare can't express). */
class VocabSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("text_vocab_build: dense ids 1..K, counts non-increasing, tokens unique") {
    val rows = run("text_vocab_build").collect()
    // the tiny sf0.001 corpus has fewer distinct tokens than VocabSize
    assert(rows.nonEmpty && rows.length <= graft.queries.Vocab.VocabSize)
    assert(rows.map(_.getAs[Long]("token_id")).toSeq ==
      (1L to rows.length.toLong))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n") >= b.getAs[Long]("n"), "counts not sorted")
    }
    assert(rows.map(_.getAs[String]("token")).distinct.length == rows.length)
  }

  test("text_oov_rate: one row per doc, bp in range, oov bounded by tokens") {
    val rows = run("text_oov_rate").collect()
    val nDocs = graft.sources.Tables.documents(spark, TestSpark.sf).count()
    assert(rows.length.toLong == nDocs)
    rows.foreach { r =>
      val bp = r.getAs[Long]("oov_bp")
      assert(bp >= 0 && bp <= 10000, s"oov_bp out of range: $r")
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_tokens"))
    }
  }

  test("text_token_ids: encoded length = min(8, doc tokens), ids in [0, K]") {
    val rows = run("text_token_ids").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ids = r.getAs[String]("ids").split(" ").map(_.toLong)
      assert(ids.length <= graft.queries.Vocab.EncodeLen)
      assert(ids.forall(i => i >= 0 && i <= graft.queries.Vocab.VocabSize))
    }
  }

  test("q_basket_pairs: ordered pairs, support sorted, bounded at 20") {
    val rows = run("q_basket_pairs").collect()
    assert(rows.length <= 20 && rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("pa") < r.getAs[Long]("pb")))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n") >= b.getAs[Long]("n"))
    }
  }

  test("events_ab_lift: arms partition the users, lift reconciles") {
    val r = run("events_ab_lift").head()
    val users = graft.sources.Tables.events(spark, TestSpark.sf)
      .select("user_id").distinct().count()
    assert(r.getAs[Long]("users_ctl") + r.getAs[Long]("users_trt") == users)
    assert(r.getAs[Long]("lift_bp") ==
      r.getAs[Long]("rate_trt_bp") - r.getAs[Long]("rate_ctl_bp"))
  }

  test("etl_dq_rules: five rules, one scan count, violations bounded") {
    val rows = run("etl_dq_rules").collect()
    assert(rows.map(_.getAs[String]("rule")).toSet ==
      Set("null_key", "name_format", "segment_enum", "acctbal_range", "nation_range"))
    val checked = graft.sources.Tables.customer(spark, TestSpark.sf).count()
    rows.foreach { r =>
      assert(r.getAs[Long]("checked") == checked)
      assert(r.getAs[Long]("violations") <= checked)
    }
  }

  test("q_percentile_disc: discrete picks are real values with p50 <= p90") {
    val rows = run("q_percentile_disc").collect()
    assert(rows.nonEmpty)
    val qtys = graft.sources.Tables.lineitem(spark, TestSpark.sf)
      .select("l_quantity").distinct().collect().map(_.getDouble(0)).toSet
    rows.foreach { r =>
      val p50 = r.getAs[Double]("p50_disc")
      val p90 = r.getAs[Double]("p90_disc")
      assert(p50 <= p90, s"p50 > p90: $r")
      assert(qtys.contains(p50) && qtys.contains(p90), "disc percentile not a data value")
    }
  }

  test("sim_sq8_encode: codes within int8 range, scale is max |milli|") {
    val rows = run("sim_sq8_encode").collect()
    val nVecs = graft.sources.Tables.embeddings(spark, TestSpark.sf).count()
    assert(rows.length.toLong == nVecs)
    rows.foreach { r =>
      Seq("c0", "c1", "c2", "c3").foreach { c =>
        val v = r.getAs[Long](c)
        assert(v >= -127 && v <= 127, s"$c out of int8 range: $r")
      }
      assert(r.getAs[Long]("scale") >= 0)
    }
  }

  test("sim_sq8_search: k rows, scores non-increasing, query excluded") {
    val rows = run("sim_sq8_search").collect()
    assert(rows.length == 10)
    assert(!rows.map(_.getAs[Long]("vec_id")).contains(0L))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("score") >= b.getAs[Long]("score"))
    }
  }

  test("corpus_funnel: monotone non-increasing survivor counts from raw") {
    val rows = run("corpus_funnel").collect().sortBy(_.getAs[Long]("stage"))
    assert(rows.length == 5)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_docs") >= b.getAs[Long]("n_docs"), "funnel not monotone")
    }
    val nDocs = graft.sources.Tables.documents(spark, TestSpark.sf).count()
    assert(rows.head.getAs[Long]("n_docs") == nDocs)
    assert(rows.head.getAs[Long]("share_bp") == 10000L)
  }

  test("text_bigram_lm: per-context probabilities bounded, rank within 3") {
    val rows = run("text_bigram_lm").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("p_bp") >= 0 && r.getAs[Long]("p_bp") <= 10000)
      assert(r.getAs[Int]("rn") >= 1 && r.getAs[Int]("rn") <= 3)
      assert(r.getAs[Long]("n2") <= r.getAs[Long]("n1"))
    }
  }

  test("sim_recall_audit: hits bounded by both result sets") {
    val r = run("sim_recall_audit").head()
    val hits = r.getAs[Long]("hits")
    assert(hits <= r.getAs[Long]("k_exact") && hits <= r.getAs[Long]("n_ann"))
    assert(r.getAs[Long]("recall_bp") >= 0 && r.getAs[Long]("recall_bp") <= 10000)
  }

  test("mm_format_sniff: formats partition the corpus") {
    val rows = run("mm_format_sniff").collect()
    val nDocs = graft.sources.Tables.documents(spark, TestSpark.sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    val known = Set("image", "audio", "video", "binary")
    assert(rows.map(_.getAs[String]("format")).forall(known))
  }

  test("etl_key_skew: shares bounded and counts sorted") {
    val rows = run("etl_key_skew").collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n") >= b.getAs[Long]("n"))
    }
    assert(rows.map(_.getAs[Long]("share_bp")).sum <= 10000)
  }

  test("events_heavy_hitters: per-hour top-3 counts reconcile with raw") {
    val rows = run("events_heavy_hitters").collect()
    assert(rows.nonEmpty)
    val byHour = rows.groupBy(_.getAs[String]("h"))
    byHour.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_.getAs[Int]("rn")).sorted.sameElements(1 to rs.length))
    }
  }

  test("sq8 ranking approximates exact cosine top-k (recall sanity)") {
    val sq8 = run("sim_sq8_search").collect().map(_.getAs[Long]("vec_id")).toSet
    val exact = run("sim_topk_brute").collect()
      .map(_.getAs[Long]("vec_id")).toSet
    // int8 quantization at 64 dims keeps most of the true top-10
    assert((sq8 & exact).size >= 5, s"SQ8 recall too low: ${(sq8 & exact).size}/10")
  }
}
