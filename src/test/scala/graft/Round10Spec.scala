package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic pins for the round-10 additions — independent in-memory
  * recomputes so a hash break at the oracle gate can be localized. */
class Round10Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("dedup_source_matrix: cells partition the shared pair index exactly") {
    val cells = run("dedup_source_matrix").collect()
    val total = cells.map(_.getAs[Long]("n_pairs")).sum
    val pairs = graft.ops.Dedup.pairIndex(
      graft.sources.Tables.documents(spark, TestSpark.sf),
      "doc_id", "text", 3, 0.5).count()
    assert(total == pairs, "every pair lands in exactly one cell")
    cells.foreach { r =>
      assert(r.getAs[String]("sa") <= r.getAs[String]("sb"),
        "unordered pair normalization")
    }
  }

  test("q_asof_tolerance: staleness gate recomputed in memory") {
    val got = run("q_asof_tolerance").collect().map { r =>
      r.getAs[Long]("event_id") ->
        ((Option(r.getAs[java.lang.Double]("prev_purchase")),
          Option(r.getAs[java.lang.Long]("stale_s"))))
    }.toMap
    val evs = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type"), col("value")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type"),
        Option(r.getAs[java.lang.Double]("value"))))
    val expect = scala.collection.mutable.Map.empty[Long, (Option[Double], Option[Long])]
    evs.groupBy(_._1).foreach { case (_, rows) =>
      var prev: Option[(Long, Double)] = None // (us, value)
      rows.filter(r => r._4 == "error" || (r._4 == "purchase" && r._5.nonEmpty))
        .sortBy(r => (r._2, r._3)).foreach {
          case (_, us, _, "purchase", Some(v)) => prev = Some((us, v))
          case (_, us, id, "error", _) =>
            val stale = prev.map(p => Math.floorDiv(us - p._1, 1000000L))
            expect(id) = (prev.collect {
              case (pus, v) if Math.floorDiv(us - pus, 1000000L) <= 3600 => v
            }, stale)
          case _ => ()
        }
    }
    assert(got == expect.toMap)
    // the fixture must exercise BOTH branches or the gate proves nothing
    assert(got.values.exists { case (v, s) => v.isEmpty && s.nonEmpty },
      "some match is rejected as too stale")
    assert(got.values.exists(_._1.nonEmpty), "some match is fresh enough")
  }

  test("text_bpe_train: the 3 learned merges recompute from a JVM BPE twin") {
    val got = run("text_bpe_train").collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[String]("pair"),
        r.getAs[Long]("cnt")))
    val freqs = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(col("text")).collect()
      .flatMap(_.getString(0).trim.split(" "))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    var seqs: Map[Vector[String], Long] = freqs.toSeq
      .map { case (w, f) => w.map(_.toString).toVector -> f }
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expect = (1 to 3).map { r =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      seqs.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          val k = (p(0), p(1)); counts(k) = counts.getOrElse(k, 0L) + f
        }
      }
      val ((x, y), cnt) = counts.toSeq
        .minBy { case ((a, b), c) => (-c, s"$a $b") }
      // fuse exactly like replace(): sequential search resumes AFTER the
      // replaced region, so of two occurrences sharing a boundary space
      // only the first merges — after merging (i, i+1), symbol i+2 is
      // emitted unmerged and the scan resumes at i+3 (probed against
      // Spark and DuckDB replace on " a b a b " → " ab a b ")
      seqs = seqs.toSeq.map { case (syms, f) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == x && syms(i + 1) == y) {
            out += (x + y)
            if (i + 2 < syms.length) out += syms(i + 2)
            i += 3
          } else { out += syms(i); i += 1 }
        }
        out.result() -> f
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      (r, s"$x $y", cnt)
    }
    assert(got.toSeq.sortBy(_._1) == expect)
    // text_bpe_apply: corpus totals from the same fused table
    val applied = run("text_bpe_apply").head
    val chars = seqs.toSeq.map { case (syms, f) => f * syms.map(_.length).sum }.sum
    val syms = seqs.toSeq.map { case (syms, f) => f * syms.length }.sum
    assert(applied.getAs[Long]("chars_before") == chars)
    assert(applied.getAs[Long]("syms_after") == syms)
    assert(applied.getAs[Long]("compression_bp") == syms * 10000 / chars)
  }

  test("q_asof_forward: next-error attribution recomputed in memory") {
    val got = run("q_asof_forward").collect().map { r =>
      r.getAs[Long]("event_id") ->
        ((Option(r.getAs[java.lang.Long]("next_err_id")),
          Option(r.getAs[java.lang.Long]("latency_s"))))
    }.toMap
    val evs = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("ts").isNotNull)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"),
        col("event_type")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
      .filter(r => r._4 == "purchase" || r._4 == "error")
    val expect = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3)).toSeq
      sorted.zipWithIndex.collect { case ((_, us, id, "purchase"), i) =>
        val next = sorted.drop(i + 1).find(_._4 == "error")
        id -> ((next.map(_._3),
          next.map(n => Math.floorDiv(n._2 - us, 1000000L))))
      }
    }.toMap
    assert(got == expect)
    assert(got.values.exists(_._1.nonEmpty) && got.values.exists(_._1.isEmpty),
      "fixture exercises both matched and unmatched purchases")
  }

  test("sim_mips_topk: exact milli-dot ranking recomputed in memory") {
    val got = run("sim_mips_topk").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("ip_milli2")).toSeq
    val vecs = graft.sources.Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding")
          .map(x => BigDecimal(x.toDouble).setScale(3,
            BigDecimal.RoundingMode.HALF_UP).*(1000).toLongExact).toVector)
      .toMap
    val q = vecs(0L)
    val expect = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => id -> v.zip(q).map { case (a, b) => a * b }.sum }
      .sortBy { case (id, ip) => (-ip, id) }.take(10)
    assert(got == expect)
  }

  test("events_survival: suffix-sum curve is monotone and masses add up") {
    val rows = run("events_survival").collect()
      .map(r => (r.getAs[Long]("lifespan_d"), r.getAs[Long]("n_end"),
        r.getAs[Long]("n_surviving"))).sortBy(_._1)
    val totalUsers = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("ts").isNotNull).select(col("user_id")).distinct().count()
    assert(rows.head._3 == totalUsers, "everyone survives at least day 0... " +
      "(S at the smallest observed lifespan = all users)")
    // survival is non-increasing and each step drops by exactly n_end
    rows.toSeq.sliding(2).foreach {
      case Seq((_, nEnd, s1), (_, _, s2)) => assert(s2 == s1 - nEnd)
      case _ => ()
    }
    assert(rows.map(_._2).sum == totalUsers, "lifespans partition the users")
  }

  test("q_rollup_share: cell shares sum to ~10000 bp per parent") {
    val rows = run("q_rollup_share").collect()
      .map(r => (r.getAs[String]("l_returnflag"), r.getAs[Long]("n"),
        r.getAs[Long]("share_bp")))
    rows.groupBy(_._1).foreach { case (rf, cells) =>
      val bp = cells.map(_._3).sum
      // truncated integer division: the parent's cells sum to within
      // (#cells - 1) bp below exactly 10000
      assert(bp <= 10000 && bp > 10000 - cells.length, s"parent $rf: $bp")
    }
  }

  test("graph_pagerank_seeded: integer PPR replayed in memory, bit-exact") {
    val got = run("graph_pagerank_seeded").collect()
      .map(r => r.getAs[String]("node") -> r.getAs[Long]("pr")).toSeq
    val pairs = graft.sources.Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_suppkey"), col("l_partkey")).distinct().collect()
      .map(r => (s"s:${r.getLong(0)}", s"p:${r.getLong(1)}"))
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val od = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val outAdj = edges.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val seeds = graft.sources.Tables.supplier(spark, TestSpark.sf)
      .where(col("s_suppkey") % 10 === 0).select(col("s_suppkey"))
      .collect().map(r => s"s:${r.getLong(0)}").toSet
    val S = 1000000000L; val ns = seeds.size
    val base = 15L * (S / ns) / 100L
    var pr: Map[String, Long] = seeds.map(_ -> S / ns).toMap
    for (_ <- 1 to 3) {
      val csum = scala.collection.mutable.Map.empty[String, Long]
      pr.foreach { case (n, p) =>
        outAdj.getOrElse(n, Nil).foreach { d =>
          csum(d) = csum.getOrElse(d, 0L) + p / od(n)
        }
      }
      pr = (csum.keySet ++ seeds).map { n =>
        n -> ((if (seeds(n)) base else 0L) + 85L * csum.getOrElse(n, 0L) / 100L)
      }.toMap
    }
    val expect = pr.toSeq.filter(_._2 > 0)
      .sortBy { case (n, p) => (-p, n) }.take(30)
    assert(got == expect)
  }

  test("graph_degree_hist: histogram masses recompute from the edge list") {
    val hist = run("graph_degree_hist").collect()
      .map(r => (r.getAs[String]("side"), r.getAs[Long]("deg")) ->
        r.getAs[Long]("n_nodes")).toMap
    val pairs = graft.sources.Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_suppkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val sDeg = pairs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val pDeg = pairs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expect =
      sDeg.values.groupBy(identity).map { case (d, g) => ("s", d) -> g.size.toLong } ++
      pDeg.values.groupBy(identity).map { case (d, g) => ("p", d) -> g.size.toLong }
    assert(hist == expect)
  }
}
