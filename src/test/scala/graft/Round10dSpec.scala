package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic pins for the round-10 fourth batch — independent in-memory
  * recomputes so a hash break at the oracle gate can be localized to
  * the operator, not the plumbing. */
class Round10dSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("etl_k_anonymity: risk counts recompute from QI classes") {
    val rows = graft.sources.Tables.customer(spark, TestSpark.sf)
      .select(col("c_nationkey"), col("c_mktsegment"), col("c_acctbal"))
      .collect()
      .map(r => (r.getInt(0), r.getString(1),
        (Math.round(r.getDouble(2) * 100) + 100000L) / 100000L))
    val classes = rows.groupBy(identity).map(_._2.length.toLong).toSeq
    val total = classes.sum
    val want = Seq(2L, 5L, 10L).map { k =>
      val risk = classes.filter(_ < k)
      (k, classes.length.toLong, risk.length.toLong, risk.sum,
        risk.sum * 10000 / total)
    }
    val got = run("etl_k_anonymity").collect().map(r =>
      (r.getAs[Long]("k"), r.getAs[Long]("n_classes"),
        r.getAs[Long]("risk_classes"), r.getAs[Long]("risk_rows"),
        r.getAs[Long]("risk_bp"))).toSeq
    assert(got == want)
    // risk is monotone in k
    assert(got.map(_._4) == got.map(_._4).sorted)
  }

  test("etl_fd_discovery: violation counts recompute per candidate") {
    def fd(pairs: Seq[(Any, Any)], label: String) = {
      val byDet = pairs.groupBy(_._1).map(_._2.map(_._2).distinct.length.toLong)
      val nDet = byDet.size.toLong
      val nViol = byDet.count(_ > 1).toLong
      (label, nDet, nViol, byDet.map(_ - 1).sum,
        (nDet - nViol) * 10000 / nDet)
    }
    val li = graft.sources.Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_partkey"),
        col("l_suppkey")).collect()
    val c = graft.sources.Tables.customer(spark, TestSpark.sf)
      .select(col("c_nationkey"), col("c_mktsegment")).collect()
    val o = graft.sources.Tables.orders(spark, TestSpark.sf)
      .select(col("o_custkey"), col("o_orderpriority")).collect()
    val want = Seq(
      fd(c.map(r => (r.get(0), r.get(1))), "customer: c_nationkey -> c_mktsegment"),
      fd(li.map(r => (r.get(0), r.get(1))), "lineitem: l_orderkey -> l_returnflag"),
      fd(li.map(r => (r.get(2), r.get(3))), "lineitem: l_partkey -> l_suppkey"),
      fd(o.map(r => (r.get(0), r.get(1))), "orders: o_custkey -> o_orderpriority"))
    val got = run("etl_fd_discovery").collect().map(r =>
      (r.getAs[String]("fd"), r.getAs[Long]("n_det"),
        r.getAs[Long]("n_violating"), r.getAs[Long]("extra_values"),
        r.getAs[Long]("support_bp"))).toSeq
    assert(got == want)
  }

  test("events_theil_sen: lower median of pairwise slopes recomputes") {
    val days = graft.sources.Tables.events(spark, TestSpark.sf)
      .select(col("event_type"), to_date(col("ts")).as("day"))
      .groupBy("event_type", "day").count().collect()
      .map(r => (r.getString(0),
        r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay -
          java.time.LocalDate.of(2024, 1, 1).toEpochDay,
        r.getAs[Long]("count")))
    val want = days.groupBy(_._1).toSeq.map { case (t, ds) =>
      val capped = ds.sortBy(-_._2).take(40).map(d => (d._2, d._3))
      val slopes = for {
        (d1, n1) <- capped; (d2, n2) <- capped if d1 < d2
      } yield (((n2 - n1) * 1000) / (d2 - d1), d1, d2)
      val sorted = slopes.sortBy(x => (x._1, x._2, x._3))
      val m = sorted((sorted.length + 1) / 2 - 1)
      (t, slopes.length.toLong, m._1)
    }.sortBy(_._1)
    val got = run("events_theil_sen").collect().map(r =>
      (r.getAs[String]("event_type"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("ts_slope_milli"))).toSeq
    assert(got == want)
  }

  test("events_sprt: cumulative llr ledger recomputes with literal increments") {
    val daily = graft.sources.Tables.events(spark, TestSpark.sf)
      .select(to_date(col("ts")).as("day"), col("event_type")).collect()
      .map(r => (r.getAs[java.sql.Date]("day").toString,
        r.getString(1) == "purchase"))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (d, es) =>
        (d, es.length.toLong, es.count(_._2).toLong) }
    var cum = 0L
    val want = daily.map { case (d, n, c) =>
      val llr = c * 201L - (n - c) * 50L
      cum += llr
      val dec = if (cum >= 2944L) "reject_h0"
        else if (cum <= -2944L) "accept_h0" else "continue"
      (d, n, c, llr, cum, dec)
    }
    val got = run("events_sprt").collect().map(r =>
      (r.getAs[String]("day"), r.getAs[Long]("n"), r.getAs[Long]("n_conv"),
        r.getAs[Long]("llr_milli_day"), r.getAs[Long]("cum_llr_milli"),
        r.getAs[String]("decision"))).toSeq
    assert(got == want)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("corpus_sample_weighted: priority sample recomputes from md5 keys") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(col("source"), col("doc_id"), col("n_chars")).collect()
      .map { r =>
        val w = math.max(1L, math.min(r.getAs[Long]("n_chars"), 4096L))
        val h = java.lang.Long.parseLong(
          md5hex(r.getAs[Long]("doc_id").toString).take(8), 16)
        (r.getString(0), r.getAs[Long]("doc_id"), w, h * 1000 / w)
      }
    val want = docs.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      ds.sortBy(d => (d._4, d._2)).take(5).zipWithIndex.map {
        case ((s2, id, w, p), i) => (s2, i + 1L, id, w, p) }
    }.sortBy(x => (x._1, x._2))
    val got = run("corpus_sample_weighted").collect().map(r =>
      (r.getAs[String]("source"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("w"),
        r.getAs[Long]("priority"))).toSeq
    assert(got == want)
  }

  test("dedup_linkage_fs: band histogram recomputes from blocked pairs") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("text")).collect()
      .map { r =>
        val toks = r.getAs[String]("text").trim.split(" ", -1)
        (r.getAs[Long]("doc_id"), r.getString(1), r.getString(2),
          r.getAs[Long]("n_chars"), toks.head, toks.last)
      }
    val blocks = docs.groupBy(d => (d._2, d._5)).filter(_._2.length <= 32)
    val scores = blocks.values.toSeq.flatMap { ds =>
      val sorted = ds.sortBy(_._1)
      for {
        i <- sorted.indices; j <- (i + 1) until sorted.length
        l = sorted(i); r = sorted(j)
      } yield (if (l._3 == r._3) 220L else -50L) +
        (if (math.abs(l._4 - r._4) * 10 <= math.max(l._4, r._4)) 180L else -30L) +
        (if (l._6 == r._6) 240L else -40L)
    }
    val want = scores.groupBy(sc => (sc + 1000) / 100).toSeq.map {
      case (b, ss) => (b, ss.length.toLong, ss.min, ss.max) }.sortBy(_._1)
    val got = run("dedup_linkage_fs").collect().map(r =>
      (r.getAs[Long]("band"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("min_score"), r.getAs[Long]("max_score"))).toSeq
    assert(got == want)
  }

  private lazy val sharedEdges: Seq[(Long, Long)] =
    graft.ops.Dedup.pairIndex(
        graft.sources.Tables.documents(spark, TestSpark.sf),
        "doc_id", "text", 3, 0.5)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("graph_local_clustering: lcc bands recompute from triangle credits") {
    val e = sharedEdges
    val deg = (e.map(_._1) ++ e.map(_._2)).groupBy(identity)
      .map { case (n, v) => (n, v.length.toLong) }
    val adj = e.toSet
    val nodes = deg.keySet.toSeq
    val triOf = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for {
      (x, y) <- e; (x2, y2) <- e
      if x == x2 && y < y2 && adj.contains((y, y2))
    } { triOf(x) += 1; triOf(y) += 1; triOf(y2) += 1 }
    val want = nodes.filter(deg(_) >= 2).map { n =>
      val d = deg(n); val t = triOf(n)
      (t * 2 * 10000 / (d * (d - 1)) / 1000, t)
    }.groupBy(_._1).toSeq.map { case (b, v) =>
      (b, v.length.toLong, v.map(_._2).sum) }.sortBy(_._1)
    val got = run("graph_local_clustering").collect().map(r =>
      (r.getAs[Long]("band"), r.getAs[Long]("n_nodes"),
        r.getAs[Long]("tri_credits"))).toSeq
    assert(got == want)
  }

  test("graph_ktruss: 2-round support peel recomputes") {
    var e = sharedEdges
    val want = (1 to 2).map { r =>
      val nIn = e.length.toLong
      val sym = (e ++ e.map(p => (p._2, p._1))).groupBy(_._1)
        .map { case (u, v) => (u, v.map(_._2).toSet) }
      e = e.filter { case (a, b) =>
        (sym.getOrElse(a, Set.empty[Long]) intersect
          sym.getOrElse(b, Set.empty[Long])).nonEmpty }
      (r.toLong, nIn, e.length.toLong, nIn - e.length.toLong)
    }
    val got = run("graph_ktruss").collect().map(r =>
      (r.getAs[Long]("round"), r.getAs[Long]("n_edges_in"),
        r.getAs[Long]("n_edges_kept"), r.getAs[Long]("n_dropped"))).toSeq
    assert(got == want)
  }
}
