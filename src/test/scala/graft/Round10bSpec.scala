package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Semantic pins for the round-10 continuation batch — independent
  * in-memory recomputes so a hash break at the oracle gate can be
  * localized to the operator, not the plumbing. */
class Round10bSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** (doc_id, distinct trigram shingles) straight off the raw corpus. */
  private lazy val docShingles: Map[Long, Set[String]] =
    graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val toks = r.getAs[String]("text").trim.split(" ", -1)
        val sh = if (toks.length < 3) Set.empty[String]
          else toks.sliding(3).map(_.mkString(" ")).toSet
        r.getAs[Long]("doc_id") -> sh
      }.toMap

  test("graph_triangles: census recomputes from the pair index") {
    val row = run("graph_triangles").collect().head
    val pairs = graft.ops.Dedup.pairIndex(
      graft.sources.Tables.documents(spark, TestSpark.sf),
      "doc_id", "text", 3, 0.5)
      .select(col("a"), col("b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val deg = pairs.toSeq.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (_, v) => v.size.toLong }
    val wedges = deg.map(d => d * (d - 1) / 2).sum
    val pseq = pairs.toSeq
    val tris = pseq.map { case (a, b) =>
      pseq.count { case (a2, c) => a2 == a && b < c && pairs((b, c)) }.toLong
    }.sum
    assert(row.getAs[Long]("n_edges") == pairs.size.toLong)
    assert(row.getAs[Long]("n_wedges") == wedges)
    assert(row.getAs[Long]("n_triangles") == tris)
    assert(row.getAs[Long]("closure_bp") ==
      (if (wedges == 0) 0L else tris * 3 * 10000 / wedges))
  }

  test("graph_common_neighbors: top-20 recomputes from the edge list") {
    val li = graft.sources.Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_suppkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byPart = li.groupBy(_._2).filter(_._2.length <= 64)
    val deg = byPart.values.flatten.groupBy(_._1).map { case (s, v) => s -> v.size.toLong }
    val inter = scala.collection.mutable.Map.empty[(Long, Long), Long]
    byPart.values.foreach { es =>
      val sks = es.map(_._1).sorted
      for (i <- sks.indices; j <- (i + 1) until sks.length)
        inter((sks(i), sks(j))) = inter.getOrElse((sks(i), sks(j)), 0L) + 1
    }
    val expect = inter.toSeq.map { case ((s1, s2), in) =>
      val j = in * 10000 / (deg(s1) + deg(s2) - in)
      (s1, s2, in, deg(s1), deg(s2), j)
    }.sortBy { case (s1, s2, _, _, _, j) => (-j, s1, s2) }.take(20)
    val got = run("graph_common_neighbors").collect().map(r =>
      (r.getAs[Long]("s1"), r.getAs[Long]("s2"), r.getAs[Long]("inter"),
        r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Long]("jaccard_bp")))
    assert(got.toSeq == expect)
  }

  test("q_exists_chain: churn set recomputes from distinct key sets") {
    val o = graft.sources.Tables.orders(spark, TestSpark.sf)
      .select(col("o_custkey"), year(col("o_orderdate")).as("y")).collect()
      .map(r => (r.getLong(0), r.getInt(1)))
    val c95 = o.filter(_._2 == 1995).map(_._1).toSet
    val c96 = o.filter(_._2 == 1996).map(_._1).toSet
    val expect = (c95 -- c96).toSeq.sorted
    val got = run("q_exists_chain").collect().map(_.getAs[Long]("c_custkey"))
    assert(got.toSeq == expect)
    assert(expect.nonEmpty, "fixture exercises the anti side")
    assert((c95 & c96).nonEmpty, "fixture has retained customers to exclude")
  }

  test("q_rel_division: daily full-coverage counts recompute in memory") {
    val evs = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("ts").isNotNull && col("event_type").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("d"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getString(2)))
    val nTypes = evs.map(_._3).distinct.length
    val perUser = evs.distinct.groupBy(_._1).map { case (u, rows) =>
      val byDay = rows.groupBy(_._2).map { case (_, mr) => mr.map(_._3).distinct.length }
      u -> (byDay.size.toLong, byDay.count(_ == nTypes).toLong)
    }
    val got = run("q_rel_division").collect().map(r =>
      r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_days"), r.getAs[Long]("n_full_days")))).toMap
    assert(got == perUser)
    assert(perUser.values.exists(v => v._2 < v._1),
      "fixture has days missing a type (division actually filters)")
    assert(perUser.values.exists(_._2 > 0),
      "fixture has at least one fully-covered day")
  }

  test("etl_seq_gaps: histogram recomputes; two-phase covers all gaps") {
    val ks = graft.sources.Tables.orders(spark, TestSpark.sf)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey")).distinct().collect().map(_.getLong(0)).sorted
    val gaps = ks.sliding(2).collect { case Array(a, b) if b > a + 1 => b - a - 1 }.toSeq
    val expect = gaps.groupBy(identity).map { case (g, v) =>
      (g, v.size.toLong, g * v.size) }.toSeq.sortBy(_._1)
    val got = run("etl_seq_gaps").collect().map(r =>
      (r.getAs[Long]("glen"), r.getAs[Long]("n_gaps"), r.getAs[Long]("missing_ids")))
    assert(got.toSeq == expect)
    // conservation: every id in [min, max] is either present or in a gap
    val missing = got.map(_._3).sum
    assert(missing == (ks.max - ks.min + 1) - ks.length,
      "gap histogram accounts for every absent id")
  }

  test("dedup_sorted_neighborhood: full SNM recompute (sort, w=3, verify)") {
    val keyed = docShingles.toSeq.collect {
      case (id, sh) if sh.nonEmpty => (id, sh, sh.map(md5hex).min)
    }
    // GLOBAL w-neighbor semantics: the 256-block sort + boundary carry
    // must equal one flat sort's lead pairs — nothing lost at block edges
    val sorted = keyed.sortBy(d => (d._3, d._1))
    val expect = (1 to 2).flatMap { w =>
      sorted.dropRight(w).zip(sorted.drop(w)).flatMap { case ((ia, sa, _), (ib, sb, _)) =>
        val inter = (sa & sb).size.toLong
        val uni = sa.size + sb.size - inter
        if (uni > 0 && inter * 2 >= uni)
          Some((math.min(ia, ib), math.max(ia, ib), inter, uni, inter * 10000 / uni))
        else None
      }
    }.sortBy(p => (p._1, p._2))
    val got = run("dedup_sorted_neighborhood").collect().map(r =>
      (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("inter"),
        r.getAs[Long]("uni"), r.getAs[Long]("jaccard_bp"))).toSeq
    assert(got == expect)
    got.foreach { case (a, b, _, _, _) =>
      val (sa, sb) = (docShingles(a), docShingles(b))
      val inter = (sa & sb).size
      assert(inter * 2 >= sa.size + sb.size - inter,
        s"pair ($a,$b) really is a t=0.5 near-dup on raw text")
    }
  }

  test("text_ttr_bands: bands recompute from raw token arrays") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).trim.split(" ", -1)))
      .filter(_._2.nonEmpty)
    val expect = docs.map { case (src, toks) =>
      (src, toks.distinct.length.toLong * 10000 / toks.length) }
      .groupBy { case (src, ttr) => (src, ttr / 1000) }
      .map { case ((src, band), v) =>
        (src, band, v.length.toLong, v.map(_._2).min, v.map(_._2).max) }
      .toSeq.sortBy(t => (t._1, t._2))
    val got = run("text_ttr_bands").collect().map(r =>
      (r.getAs[String]("source"), r.getAs[Long]("band"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("min_ttr_bp"), r.getAs[Long]("max_ttr_bp"))).toSeq
    assert(got == expect)
    assert(expect.map(_._2).distinct.length > 1, "fixture spans multiple bands")
  }

  test("mm_qa_sample: representative is the max-bytes doc of its cell") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val t = r.getString(1)
        val fmt = t.charAt(0) match {
          case c if c >= 'a' && c <= 'f' => "image"
          case c if c >= 'g' && c <= 'p' => "audio"
          case c if c >= 'q' && c <= 'z' => "video"
          case _ => "binary"
        }
        (r.getLong(0), fmt, t.length.toLong)
      }
    val expect = docs.groupBy { case (_, f, n) =>
      (f, java.lang.Long.toBinaryString(n).length.toLong) }
      .map { case ((f, bkt), v) =>
        val best = v.minBy { case (id, _, n) => (-n, id) }
        (f, bkt, v.length.toLong, best._1, best._3)
      }.toSeq.sortBy(t => (t._1, t._2))
    val got = run("mm_qa_sample").collect().map(r =>
      (r.getAs[String]("format"), r.getAs[Long]("bucket"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("sample_doc"), r.getAs[Long]("sample_bytes"))).toSeq
    assert(got == expect)
  }

  test("q_percentile_cont_exact: x4 quartiles recompute from a flat sort") {
    val cust = graft.sources.Tables.customer(spark, TestSpark.sf)
      .select(col("c_mktsegment"), round(col("c_acctbal") * 100).cast("long"),
        col("c_custkey")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expect = cust.groupBy(_._1).map { case (seg, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3)).map(_._2)
      val n = sorted.length.toLong
      val qs = (1 to 3).map { q =>
        val pos = (n - 1) * q
        val idx = pos / 4; val rem = pos - idx * 4
        val lo = sorted(idx.toInt)
        val hi = if (idx + 1 < n) sorted(idx.toInt + 1) else lo
        lo * (4 - rem) + hi * rem
      }
      seg -> ((n, qs(0), qs(1), qs(2)))
    }
    val got = run("q_percentile_cont_exact").collect().map(r =>
      r.getAs[String]("seg") -> ((r.getAs[Long]("n"), r.getAs[Long]("p25_x4cents"),
        r.getAs[Long]("p50_x4cents"), r.getAs[Long]("p75_x4cents")))).toMap
    assert(got == expect)
    // interpolation actually interpolates somewhere (rem != 0 for some seg)
    assert(expect.exists { case (_, (n, _, _, _)) => (n - 1) % 4 != 0 })
  }

  test("graph_bfs_2hop: reach recomputes from the capped edge list") {
    val li = graft.sources.Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_suppkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val capped = li.groupBy(_._2).filter(_._2.length <= 64).values.flatten.toSeq
    val byPart = capped.groupBy(_._2)
    val bySupp = capped.groupBy(_._1)
    val seeds = bySupp.keys.filter(_ % 20 == 0).toSeq.sorted
    val expect = seeds.flatMap { s =>
      bySupp.get(s).map { es =>
        val parts = es.map(_._2)
        val reach = parts.flatMap(p => byPart(p).map(_._1)).toSet - s
        (s, parts.length.toLong, reach.size.toLong)
      }
    }
    val got = run("graph_bfs_2hop").collect().map(r =>
      (r.getAs[Long]("seed"), r.getAs[Long]("n_parts"), r.getAs[Long]("n_reach")))
    assert(got.toSeq == expect)
  }

  test("mm_compress_proxy: chunk-uniqueness bands recompute per blob") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(col("text")).collect().map(_.getString(0)).filter(_.nonEmpty)
    val expect = docs.map { t =>
      val fmt = t.charAt(0) match {
        case c if c >= 'a' && c <= 'f' => "image"
        case c if c >= 'g' && c <= 'p' => "audio"
        case c if c >= 'q' && c <= 'z' => "video"
        case _ => "binary"
      }
      val chunks = t.grouped(64).toSeq
      (fmt, chunks.distinct.length.toLong * 10000 / chunks.length)
    }.groupBy { case (f, bp) => (f, bp / 1000) }
      .map { case ((f, band), v) =>
        (f, band, v.length.toLong, v.map(_._2).min, v.map(_._2).max) }
      .toSeq.sortBy(t => (t._1, t._2))
    val got = run("mm_compress_proxy").collect().map(r =>
      (r.getAs[String]("format"), r.getAs[Long]("band"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("min_bp"), r.getAs[Long]("max_bp"))).toSeq
    assert(got == expect)
  }

  test("text_positional_bias: first-position stats recompute in memory") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(col("text")).collect()
      .map(_.getString(0).trim.split(" ", -1).toSeq)
    val tf = docs.flatten.groupBy(identity).map { case (t, v) => t -> v.size.toLong }
    val top = tf.toSeq.sortBy { case (t, f) => (-f, t) }.take(10)
    val expect = top.map { case (tok, f) =>
      val posBps = docs.flatMap { toks =>
        val p = toks.indexOf(tok)
        if (p >= 0) Some(p.toLong * 10000 / toks.length) else None
      }
      (tok, f, posBps.length.toLong, posBps.sum / posBps.length,
        posBps.min, posBps.max)
    }
    val got = run("text_positional_bias").collect().map(r =>
      (r.getAs[String]("tok"), r.getAs[Long]("tf"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("mean_first_pos_bp"), r.getAs[Long]("min_pos_bp"),
        r.getAs[Long]("max_pos_bp"))).toSeq
    assert(got == expect)
  }

  test("events_anomaly_runs: run-length histogram recomputes from hours") {
    val hours = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("ts").isNotNull)
      .select(expr("unix_micros(date_trunc('hour', ts)) div 3600000000"))
      .collect().map(_.getLong(0))
    val hourly = hours.groupBy(identity).map { case (h, v) => (h, v.size.toLong) }
      .toSeq.sortBy(_._1)
    val bursts = hourly.indices.flatMap { i =>
      val win = hourly.slice(math.max(0, i - 24), i)
      val (wn, ws) = (win.length.toLong, win.map(_._2).sum)
      if (wn >= 12 && hourly(i)._2 * wn >= ws * 2) Some(hourly(i)._1) else None
    }
    val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)] // (start, len)
    bursts.foreach { h =>
      if (runs.nonEmpty && runs.last._1 + runs.last._2 == h)
        runs(runs.length - 1) = (runs.last._1, runs.last._2 + 1)
      else runs += ((h, 1L))
    }
    val expect = runs.groupBy(_._2).map { case (len, v) =>
      (len, v.size.toLong, v.map(_._1).min) }.toSeq.sortBy(_._1)
    val got = run("events_anomaly_runs").collect().map(r =>
      (r.getAs[Long]("len"), r.getAs[Long]("n_runs"),
        r.getAs[Long]("first_start_idx"))).toSeq
    assert(got == expect)
    assert(expect.exists(_._1 > 1), "fixture has a multi-hour run")
  }

  test("sim_centroid_drift: member counts match sim_ivf_train; drift sane") {
    val drift = run("sim_centroid_drift").collect()
    assert(drift.nonEmpty)
    val train1 = run("sim_ivf_train").collect()
      .map(r => r.getAs[Long]("cell") -> r.getAs[Long]("n")).toMap
    drift.foreach { r =>
      assert(r.getAs[Long]("n_members") == train1(r.getAs[Long]("cell")),
        "round-2 centroid means come from the round-1 assignment")
      assert(r.getAs[Long]("drift_l1_milli") >= r.getAs[Long]("max_dim_shift_milli"))
      assert(r.getAs[Long]("max_dim_shift_milli") >= 0)
    }
    assert(drift.exists(_.getAs[Long]("drift_l1_milli") > 0),
      "training actually moves at least one centroid")
  }

  test("sim_margin_stats: margins are non-negative and bounded by extremes") {
    val rows = run("sim_margin_stats").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi, mean) = (r.getAs[Long]("min_margin_bp"),
        r.getAs[Long]("max_margin_bp"), r.getAs[Long]("mean_margin_bp"))
      assert(lo >= 0, "top1 >= top2 by construction")
      assert(lo <= mean && mean <= hi)
      assert(r.getAs[Long]("n_vecs") > 0)
    }
  }
}
