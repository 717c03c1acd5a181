package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class Round11Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("sim_opq_rotate: rotation beats the serpentine baseline; energy conserved") {
    val rows = run("sim_opq_rotate").collect()
      .map(r => r.getAs[String]("layout") ->
        ((r.getAs[Long]("min_energy"), r.getAs[Long]("max_energy"),
          r.getAs[Long]("total_var"), r.getAs[Long]("imbalance_bp")))).toMap
    assert(rows.keySet == Set("rotated", "serpentine"))
    val (rot, ser) = (rows("rotated"), rows("serpentine"))
    // the point of the capstone: rotate-then-serpentine must balance
    // subspace energy at least as well as the permutation alone
    // (angle 0 = identity guarantees it can never lose to pairing)
    assert(rot._4 <= ser._4,
      s"rotated imbalance ${rot._4} bp > serpentine ${ser._4} bp")
    // a near-orthogonal rotation preserves total energy: the 7-angle
    // table's worst c²+s² error is 237 ppm, plus ≤1 truncation per dim
    val drift = math.abs(rot._3 - ser._3).toDouble / ser._3.toDouble
    assert(drift < 0.01, s"total energy drifted ${drift * 100}% under rotation")
    // sanity: both layouts partition all 64 dims (8 subspaces, min ≤ max)
    assert(rot._1 <= rot._2 && ser._1 <= ser._2)
  }

  test("sim_opq_rotate: per-pair equalization really narrows the variance spread") {
    // JVM twin of the pairing+rotation stage at the variance level:
    // after pairing rank k with rank 63-k and equalizing within pairs,
    // the max/min spread over dim variances can only shrink
    val q = graft.sources.Tables.embeddings(spark, TestSpark.sf)
      .select(graft.ops.Similarity.milliQuant(col("embedding")).as("mq"))
    val n = q.count()
    val moments = q.select(posexplode(col("mq")).as(Seq("d", "x")))
      .groupBy(col("d"))
      .agg(sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"))
      .collect().map(r => (r.getAs[Int]("d"),
        n * r.getAs[Long]("sxx") - r.getAs[Long]("sx") * r.getAs[Long]("sx")))
    val vars = moments.sortBy(m => (-m._2, m._1)).map(_._2)
    val pairMeans = (0 until 32).map(k => (vars(k) + vars(63 - k)) / 2)
    assert(pairMeans.max - pairMeans.min <= vars.max - vars.min,
      "hi-lo pairing narrows the energy spread")
    // and the registered query's rotated energies live inside the
    // original variance envelope (no pair can exceed its own extremes)
    val imb = run("sim_opq_rotate").collect()
      .map(r => r.getAs[String]("layout") -> r.getAs[Long]("imbalance_bp")).toMap
    assert(imb("rotated") >= 10000L, "imbalance is max/min ≥ 1")
  }

  private def md5hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
  private def h32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)

  test("text_boilerplate_lines: per-source boilerplate mass recomputes") {
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val blocks = docs.flatMap { case (src, id, text) =>
      // split(_, -1): Spark's split keeps trailing empty tokens
      text.trim.split(" ", -1).grouped(10).map(g => (src, id, g.mkString(" ")))
    }
    val expect = blocks.groupBy(_._1).map { case (src, bs) =>
      val stats = bs.groupBy(_._3).toSeq.map { case (_, occ) =>
        (occ.length.toLong, occ.map(_._2).distinct.length) }
      val boiler = stats.filter(_._2 >= 5)
      val occTotal = stats.map(_._1).sum
      val boilerOcc = boiler.map(_._1).sum
      src -> ((occTotal, stats.size.toLong, boiler.size.toLong, boilerOcc,
        boilerOcc * 10000 / occTotal))
    }
    val got = run("text_boilerplate_lines").collect().map(r =>
      r.getAs[String]("source") -> ((r.getAs[Long]("n_block_occ"),
        r.getAs[Long]("n_distinct_blocks"), r.getAs[Long]("n_boiler_blocks"),
        r.getAs[Long]("boiler_occ"), r.getAs[Long]("boiler_bp")))).toMap
    assert(got == expect)
  }

  test("text_char_entropy: banded pseudo-entropy recomputes per doc") {
    def ilog2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val docs = graft.sources.Tables.documents(spark, TestSpark.sf)
      .select(col("source"), col("doc_id"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(2))).filter(_._2.nonEmpty)
    val perDoc = docs.map { case (src, text) =>
      val counts = text.toSeq.groupBy(identity).map(_._2.length.toLong)
      val n = counts.sum
      val bits = counts.map(nc => nc * (ilog2(n) - ilog2(nc))).sum
      (src, bits * 100 / n)
    }
    val expect = perDoc.groupBy { case (src, cb) => (src, cb / 100) }
      .map { case (k, v) => k ->
        ((v.length.toLong, v.map(_._2).min, v.map(_._2).max)) }
    val got = run("text_char_entropy").collect().map(r =>
      (r.getAs[String]("source"), r.getAs[Long]("band")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("min_ent_cb"),
          r.getAs[Long]("max_ent_cb")))).toMap
    assert(got == expect)
    // prose lands in a sane band: some doc above 3 bits, none negative
    assert(perDoc.exists(_._2 >= 300) && perDoc.forall(_._2 >= 0))
  }

  test("q_hll_sketch: registers recompute; estimate within HLL error") {
    val users = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("user_id").isNotNull)
      .select(col("user_id")).collect().map(_.getLong(0))
    val regs = users.distinct.map(u => h32(u.toString))
      .groupBy(_ % 256).map { case (b, hs) =>
        b -> hs.map { h =>
          val rem = h / 256
          if (rem == 0) 25L else 25L - java.lang.Long.toBinaryString(rem).length
        }.max
      }
    val sumInv = regs.values.map(m => 1L << (30 - m).toInt).sum +
      (256 - regs.size) * (1L << 30)
    val row = run("q_hll_sketch").head
    assert(row.getAs[Long]("sum_inv_scaled") == sumInv)
    assert(row.getAs[Long]("max_register") == regs.values.max)
    assert(row.getAs[Long]("exact_distinct") == users.distinct.length.toLong)
    // The fixture sits in the SMALL-RANGE regime (n ≪ 2.5·m): the raw
    // harmonic estimate is biased high there by design, and the
    // standard estimator branches to linear counting on the emitted
    // zero-bucket count. The query emits exact integers only (a
    // cross-engine float ln would be a hash hazard); the client-side
    // branch is checked here with a real ln: lc = m·ln(m/V).
    val v = row.getAs[Long]("n_zero_buckets")
    assert(v > 0, "small-range fixture must leave empty buckets")
    val lc = math.round(256.0 * math.log(256.0 / v))
    val exact = row.getAs[Long]("exact_distinct")
    assert(math.abs(lc - exact) * 10 <= exact,
      s"linear-counting estimate $lc vs exact $exact out of 10% band")
    // the raw harmonic estimate biases HIGH in this regime (its floor
    // is α·m ≈ 184 when most registers are empty) — never low
    assert(row.getAs[Long]("hll_est") >= exact,
      "raw estimate biases high, never low, in the small range")
  }

  test("q_kmv_distinct: kth-min estimate recomputes exactly") {
    val users = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("user_id").isNotNull)
      .select(col("user_id")).collect().map(_.getLong(0)).distinct
    val hs = users.map(u => h32(u.toString)).distinct.sorted
    val row = run("q_kmv_distinct").head
    val k = math.min(256, hs.length)
    assert(row.getAs[Long]("k") == k.toLong)
    assert(row.getAs[Long]("kth_min_hash") == hs(k - 1))
    val est = if (k < 256) users.length.toLong
      else 255L * 4294967296L / hs(255)
    assert(row.getAs[Long]("kmv_est") == est)
    assert(row.getAs[Long]("err_bp") < 2000,
      s"KMV error ${row.getAs[Long]("err_bp")} bp out of band")
  }

  test("sim_mmr_rerank: greedy picks recompute; diversity really bites") {
    val rows = run("sim_mmr_rerank").collect().map(r =>
      (r.getAs[Long]("rank"), r.getAs[Long]("vec_id"), r.getAs[Long]("rel_bp"),
        r.getAs[Long]("max_sim_bp"), r.getAs[Long]("mmr_score10")))
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows.map(_._2).distinct.length == 4, "4 distinct picks")
    // JVM twin: rebuild shortlist + greedy from raw embeddings
    def quant(v: Seq[Float]): Array[Long] = v.map(x =>
      BigDecimal(x.toDouble).setScale(3,
        BigDecimal.RoundingMode.HALF_UP).*(1000).toLongExact).toArray
    def cosBp(a: Array[Long], b: Array[Long]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = a.map(x => x * x).sum; val nb = b.map(x => x * x).sum
      if (na * nb == 0) 0L
      else math.floor((dot * 10000L).toDouble / math.sqrt((na * nb).toDouble)).toLong
    }
    val embs = graft.sources.Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> quant(r.getSeq[Float](1))).toMap
    val qv = embs(0L)
    val sl = embs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, v, cosBp(v, qv)) }
      .sortBy { case (id, _, c) => (-c, id) }.take(8)
    var chosen = Vector(sl.head._1)
    var expect = Vector((1L, sl.head._1, sl.head._3, 0L, 5L * sl.head._3))
    for (r <- 2 to 4) {
      val cands = sl.filterNot(c => chosen.contains(c._1))
      val scored = cands.map { case (id, v, rel) =>
        val ms = chosen.map(cid => cosBp(v, embs(cid))).max
        (id, rel, ms, 5L * rel - 5L * ms)
      }
      val pick = scored.sortBy(s => (-s._4, s._1)).head
      chosen :+= pick._1
      expect :+= ((r.toLong, pick._1, pick._2, pick._3, pick._4))
    }
    assert(rows.toSeq == expect)
    // score identity holds on every non-seed row (λ = 0.5, ×10 scale)
    assert(rows.drop(1).forall(r => r._5 == 5 * r._3 - 5 * r._4))
  }

  test("graph_adamic_adar: top-20 AA scores recompute") {
    val sp = graft.sources.Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_suppkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def ilog2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val byPart = sp.groupBy(_._2).filter(_._2.length <= 64)
    val scores = collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    byPart.values.foreach { es =>
      val pd = es.length.toLong
      if (pd >= 2) {
        val w = 1000000L / ilog2(pd)
        val sks = es.map(_._1).sorted
        for (i <- sks.indices; j <- (i + 1) until sks.length) {
          val k = (sks(i), sks(j))
          val (aw, ai) = scores.getOrElse(k, (0L, 0L))
          scores(k) = (aw + w, ai + 1)
        }
      }
    }
    val expect = scores.toSeq
      .map { case ((a, b), (w, i)) => (a, b, w, i) }
      .sortBy { case (a, b, w, _) => (-w, a, b) }.take(20)
    val got = run("graph_adamic_adar").collect().map(r =>
      (r.getAs[Long]("s1"), r.getAs[Long]("s2"), r.getAs[Long]("aa_ppm"),
        r.getAs[Long]("inter"))).toSeq
    assert(got == expect)
  }

  test("events_control_chart: 3σ flags recompute by cross-multiplication") {
    val daily = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("ts").isNotNull)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val expect = daily.groupBy(_._1).toSeq.flatMap { case (t, ds) =>
      val n = ds.length.toLong
      val sx = ds.map(_._3).sum; val sxx = ds.map(d => d._3 * d._3).sum
      ds.flatMap { case (_, day, x) =>
        val dev = x * n - sx; val v9 = 9 * (n * sxx - sx * sx)
        if (dev * dev > v9)
          Some((t, day, x, dev, v9, if (dev > 0) "high" else "low"))
        else None
      }
    }.sortBy(r => (r._1, r._2))
    val got = run("events_control_chart").collect().map(r =>
      (r.getAs[String]("event_type"), r.getAs[String]("day"),
        r.getAs[Long]("x"), r.getAs[Long]("dev_n"), r.getAs[Long]("var9_n2"),
        r.getAs[String]("side"))).toSeq
    assert(got == expect)
  }

  test("graph_jaccard_coeff: top-20 recomputes; jaccard ≤ 1") {
    val sp = graft.sources.Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_suppkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byPart = sp.groupBy(_._2).filter(_._2.length <= 64)
    val kept = byPart.values.flatten.toSeq
    val deg = kept.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val inter = collection.mutable.Map.empty[(Long, Long), Long]
    byPart.values.foreach { es =>
      val sks = es.map(_._1).sorted
      for (i <- sks.indices; j <- (i + 1) until sks.length)
        inter((sks(i), sks(j))) = inter.getOrElse((sks(i), sks(j)), 0L) + 1
    }
    val expect = inter.toSeq.map { case ((a, b), i) =>
      (a, b, i, deg(a), deg(b), i * 10000 / (deg(a) + deg(b) - i))
    }.sortBy(r => (-r._6, r._1, r._2)).take(20)
    val got = run("graph_jaccard_coeff").collect().map(r =>
      (r.getAs[Long]("s1"), r.getAs[Long]("s2"), r.getAs[Long]("inter"),
        r.getAs[Long]("deg1"), r.getAs[Long]("deg2"),
        r.getAs[Long]("jaccard_bp"))).toSeq
    assert(got == expect)
    assert(got.forall(_._6 <= 10000L))
  }

  test("q_moment_sketch: moments recompute AND merge additively") {
    val qs = graft.sources.Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_returnflag"), round(col("l_quantity")).cast("long").as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expect = qs.groupBy(_._1).toSeq.map { case (f, v) =>
      val q = v.map(_._2)
      (f, q.length.toLong, q.sum, q.map(x => x * x).sum,
        q.map(x => x * x * x).sum, q.map(x => x * x * x * x).sum,
        q.min, q.max, q.sum * 1000 / q.length)
    }.sortBy(_._1)
    val got = run("q_moment_sketch").collect().map(r =>
      (r.getAs[String]("l_returnflag"), r.getAs[Long]("n"),
        r.getAs[Long]("s1"), r.getAs[Long]("s2"), r.getAs[Long]("s3"),
        r.getAs[Long]("s4"), r.getAs[Long]("q_min"), r.getAs[Long]("q_max"),
        r.getAs[Long]("mean_milli"))).toSeq
    assert(got == expect)
    // the MERGEABILITY property the sketch exists for: moments of two
    // halves ADD to the whole (min/max combine by min/max)
    val (h1, h2) = qs.partition(_._2 % 2 == 0)
    def mom(v: Seq[Long]) = (v.length.toLong, v.sum, v.map(x => x * x).sum)
    val all = mom(qs.map(_._2).toSeq)
    val (a, b) = (mom(h1.map(_._2).toSeq), mom(h2.map(_._2).toSeq))
    assert((a._1 + b._1, a._2 + b._2, a._3 + b._3) == all)
  }

  test("sim_ivf_rebalance: flags and split seeds are consistent") {
    val rows = run("sim_ivf_rebalance").collect().map(r =>
      (r.getAs[Long]("cell"), r.getAs[Long]("n"), r.getAs[Long]("flag"),
        r.getAs[Long]("seed1"), Option(r.getAs[java.lang.Long]("seed2"))))
    val total = rows.map(_._2).sum
    rows.foreach { case (cell, n, flag, seed1, seed2) =>
      assert((flag == 1) == (n * 8 > total * 2),
        s"cell $cell flag inconsistent with 2x-mean rule")
      assert(seed2.isDefined == (flag == 1),
        s"cell $cell split seeds present iff flagged")
      seed2.foreach(s2 => assert(s2 != seed1, "split seeds differ"))
    }
    // seed1 is the cell's minimum member id (checked via the shared
    // assignment kernel)
    val assign = graft.ops.Similarity.ivfAssignAll(
        graft.sources.Tables.embeddings(spark, TestSpark.sf),
        "vec_id", "embedding", 8)
      .select(col("cell"), col("vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val mins = assign.groupBy(_._1).map { case (c, v) => c -> v.map(_._2).min }
    rows.foreach { case (cell, n, _, seed1, _) =>
      assert(mins(cell) == seed1)
      assert(assign.count(_._1 == cell).toLong == n)
    }
  }

  test("etl_pseudonymize: mapping injective and RI-preserving on the fixture") {
    val row = run("etl_pseudonymize").head
    assert(row.getAs[Long]("n_collisions") == 0L,
      "16-hex-char salted md5 collides on the fixture?!")
    assert(row.getAs[Long]("n_distinct_keys") == row.getAs[Long]("n_customers"))
    assert(row.getAs[Long]("n_orphans_by_key") ==
      row.getAs[Long]("n_orphans_by_pseudo"),
      "referential integrity must be identical under the pseudonym")
  }
}
