package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based pins for the pure Column kernels, against independent
  * Scala reference implementations. Inputs come from deterministic
  * ScalaCheck generators (fixed seed — the suite must not flake), and
  * each property batches all its cases into ONE Spark job: the point is
  * coverage of the input space, not 200 job round-trips. */
class KernelPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic sample of `n` values from a Gen (seed fixed). */
  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.iterate(Seed(42L))(_.next)
      .map(s => g.pureApply(Gen.Parameters.default, s))
      .take(n).toSeq

  private val word: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))

  test("shinglesOf matches a sliding-window reference and the inline form on random token lists") {
    val docs = sample(Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, word)), 200)
      .map(_.mkString(" "))
    val df = docs.toDF("text")
      .withColumn("toks", graft.ops.TextAnalysis.tokens(col("text")))
      .select(col("text"),
        graft.ops.TextAnalysis.shinglesOf(col("toks"), 2).as("fast"),
        graft.ops.TextAnalysis.shingles(col("text"), 2).as("inline"))
    df.collect().foreach { r =>
      val text = r.getAs[String]("text")
      // reference: tokens are the single-space split of the trimmed text
      val toks = text.trim.split(" ", -1).toSeq
      val expected =
        if (toks.length < 2) Seq.empty else toks.sliding(2).map(_.mkString(" ")).toSeq
      assert(r.getSeq[String](1).toList == expected.toList, s"fast path for '$text'")
      assert(r.getSeq[String](2).toList == expected.toList, s"inline path for '$text'")
    }
  }

  test("md5 split-bucket rule matches a JVM MessageDigest reference on random ids") {
    val ids = sample(Gen.chooseNum(0L, 1000000L), 300).distinct
    val bucket = pmod(conv(substring(md5(col("id").cast("string")), 1, 2), 16, 10)
      .cast("long"), lit(10L))
    val got = ids.toDF("id").select(col("id"), bucket.as("b")).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("b")).toMap
    ids.foreach { id =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      val ref = ((h(0) & 0xFF) % 10 + 10) % 10
      assert(got(id) == ref.toLong, s"bucket for id $id")
    }
  }

  test("dsum DECIMAL accumulation equals an exact BigDecimal reference on random 2-dp values") {
    val vals = sample(Gen.chooseNum(-99999L, 99999L), 500).map(_ / 100.0)
    val got = vals.toDF("v").agg(graft.queries.dsum(col("v"))).collect()(0).getDouble(0)
    val ref = vals.map(v => BigDecimal(v).setScale(4)).sum.toDouble
    assert(got == ref, "decimal-accumulated sum must be bit-exact vs BigDecimal")
  }

  test("floor-log2 via bin-length equals numberOfLeadingZeros on random positive longs") {
    val ns = sample(Gen.chooseNum(1L, Long.MaxValue), 300).distinct
    val got = ns.toDF("n")
      .select(col("n"), (length(bin(col("n"))) - 1).cast("long").as("fl")).collect()
      .map(r => r.getAs[Long]("n") -> r.getAs[Long]("fl")).toMap
    ns.foreach { n =>
      assert(got(n) == (63 - java.lang.Long.numberOfLeadingZeros(n)).toLong,
        s"floor(log2($n))")
    }
  }

  test("Normalize.numOrNull accepts exactly the float-or-NULL grammar on random strings") {
    val junk = Gen.oneOf(Gen.stringOfN(3, Gen.alphaChar),
      Gen.const(""), Gen.const("  "), Gen.const("1.2.3"), Gen.const("--5"))
    val num = Gen.chooseNum(-100000L, 100000L).map(n => (n / 100.0).toString)
    val inputs = sample(Gen.oneOf(junk, num), 300)
    val got = inputs.toDF("s")
      .select(col("s"), graft.etl.Normalize.numOrNull(col("s")).as("v")).collect()
    got.foreach { r =>
      val s = r.getAs[String]("s")
      // reference semantics: JS `parseFloat(x) || null` — unparseable OR
      // zero both fold to NULL (falsy zero, etlService.js coercions)
      val expected = (try Some(s.trim.toDouble)
        catch { case _: NumberFormatException => None })
        .filterNot(_ == 0.0)
      val actual = Option(r.get(1)).map(_.asInstanceOf[Double])
      assert(actual == expected, s"numOrNull('$s')")
    }
  }

  test("discounted-revenue cents kernel matches an exact BigInteger reference") {
    // the Round9b/Tpch money rule: cents·(10⁴−disc_bp) div 10⁴, one
    // rounding per source column, integer after — the property pins
    // bounds (0 ≤ rev ≤ cents for valid discounts) AND exact values
    val cases = sample(for {
      price <- Gen.chooseNum(0L, 99999999L).map(_ / 100.0)
      disc <- Gen.chooseNum(0L, 10000L).map(_ / 10000.0)
    } yield (price, disc), 400)
    val cents = round(col("price") * 100).cast("long")
    val discBp = round(col("disc") * 10000).cast("long")
    val got = cases.toDF("price", "disc")
      .select(col("price"), col("disc"),
        org.apache.spark.sql.functions.call_function("div",
          cents * (lit(10000L) - discBp), lit(10000L)).as("rev")).collect()
    got.foreach { r =>
      val cents = math.round(r.getAs[Double]("price") * 100)
      val bp = math.round(r.getAs[Double]("disc") * 10000)
      val expect = cents * (10000L - bp) / 10000L
      val rev = r.getAs[Long]("rev")
      assert(rev == expect, s"rev(${r.get(0)}, ${r.get(1)})")
      assert(rev >= 0 && rev <= cents, "bounds")
    }
  }

  test("h3 md5 hash lands in [0, 4096) and matches a MessageDigest reference") {
    val keys = sample(Gen.chooseNum(0L, 10000000L), 300).distinct
    val h3 = conv(substring(md5(col("k").cast("string")), 1, 3), 16, 10).cast("long")
    val got = keys.toDF("k").select(col("k"), h3.as("h")).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Long]("h")).toMap
    keys.foreach { k =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8"))
      val ref = ((d(0) & 0xFF) << 4) | ((d(1) & 0xFF) >> 4)
      assert(got(k) == ref.toLong && got(k) >= 0 && got(k) < 4096, s"h3($k)")
    }
  }

  test("CMS estimates dominate exact counts on random streams (in-memory model)") {
    // the q_cms_heavy structural guarantee, checked over a random
    // multiset: min over d row-buckets of bucket sums ≥ the key's count
    val stream = sample(Gen.chooseNum(0L, 40L), 500)
    def bucket(r: Int, k: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$r:$k".getBytes("UTF-8"))
      ((((d(0) & 0xFF) << 4) | ((d(1) & 0xFF) >> 4)) % 1024 + 1024) % 1024
    }
    val sketch = Array.fill(4, 1024)(0L)
    stream.foreach(k => (0 until 4).foreach(r => sketch(r)(bucket(r, k)) += 1))
    val exact = stream.groupBy(identity).view.mapValues(_.length.toLong)
    exact.foreach { case (k, n) =>
      val est = (0 until 4).map(r => sketch(r)(bucket(r, k))).min
      assert(est >= n, s"CMS underestimated key $k: $est < $n")
    }
  }

  test("Merge.merge matches a JVM MERGE reference on random tables, all clause combos") {
    // random keyed tables: small key space forces matched/unmatched/
    // multi-source-row collisions; versions break source ties
    type R = (Long, Long, Long) // (k, v, ver)
    val row: Gen[R] = for {
      k <- Gen.chooseNum(0L, 15L)
      v <- Gen.chooseNum(0L, 99L)
      ver <- Gen.chooseNum(0L, 9L)
    } yield (k, v, ver)
    // target: one row per key (keyed tables are key-unique)
    val target: Seq[(Long, Long, Long)] = sample(Gen.listOfN(12, row), 1).head
      .groupBy(_._1).map(_._2.head).toSeq
    val source = sample(Gen.listOfN(14, row), 2).last
    // delete marker: on ~1/4 of source rows (derived from v so the JVM
    // reference sees the identical flag)
    def isDel(r: R): Boolean = r._2 % 4 == 0

    // keep (k, ver) collision-free among source rows per key so the
    // version tiebreak is total and both sides agree deterministically
    val srcClean: Seq[(Long, Long, Long)] =
      source.groupBy(r => (r._1, r._3)).map(_._2.head).toSeq
    val tDf = target.toDF("k", "v", "ver")
    val sDf = srcClean.toDF("k", "v", "ver")
    for {
      upd <- Seq(true, false)
      ins <- Seq(true, false)
      del <- Seq(true, false)
    } {
      val got = graft.etl.Merge.merge(tDf, sDf, Seq("k"),
          updateMatched = upd, insertUnmatched = ins,
          deleteCond = if (del) Some(col("v") % 4 === 0) else None,
          versionCols = Seq("ver"))
        .as[(Long, Long, Long)].collect().toSet
      val want = {
        val tByK = target.map(r => r._1 -> r).toMap
        val sWin = srcClean.groupBy(_._1).view.mapValues(_.maxBy(_._3)).toMap
        (tByK.keySet ++ sWin.keySet).toSeq.flatMap { k =>
          (tByK.get(k), sWin.get(k)) match {
            case (_, Some(s)) if del && isDel(s) => None
            case (Some(t), Some(s)) => Some(if (upd) s else t)
            case (None, Some(s)) => if (ins) Some(s) else None
            case (Some(t), None) => Some(t)
            case _ => None
          }
        }.toSet
      }
      assert(got == want, s"clause combo upd=$upd ins=$ins del=$del")
    }
  }

  test("hllRegisters matches a JVM fold and MAX-merges across splits") {
    // JVM twin of Sketch.hllRegisters: md5-prefix 32-bit hash, low byte
    // buckets, rho = leading-zero rank of the 24-bit remainder
    def jvmRegs(keys: Seq[String]): Map[Long, Long] =
      keys.map { k =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(k.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
        val h = java.lang.Long.parseLong(hex, 16)
        val (bucket, rem) = (h % 256, h / 256)
        bucket -> (if (rem == 0) 25L else 25L - (64 - java.lang.Long.numberOfLeadingZeros(rem)))
      }.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val keys = sample(word, 400)
    val sparkRegs = graft.ops.Sketch
      .hllRegisters(keys.toDF("k"), "k")
      .as[(Long, Long)].collect().toMap
    assert(sparkRegs == jvmRegs(keys), "Spark registers == JVM fold")
    // the HLL merge property the streaming twin relies on: registers of
    // a union are the element-wise MAX of the split registers
    val (a, b) = keys.splitAt(keys.length / 2)
    val (ra, rb) = (jvmRegs(a), jvmRegs(b))
    val merged = (ra.keySet ++ rb.keySet).map(k =>
      k -> math.max(ra.getOrElse(k, 0L), rb.getOrElse(k, 0L))).toMap
    assert(merged == jvmRegs(keys), "union registers == MAX-merge of splits")
  }

  test("momentVector is additively mergeable across arbitrary splits") {
    val rows = sample(Gen.zip(Gen.oneOf("a", "b", "c"),
      Gen.chooseNum(-50L, 50L)), 300)
    type M = (Long, Long, Long, Long, Long, Long, Long)
    def collect(rs: Seq[(String, Long)]): Map[String, M] =
      graft.ops.Sketch.momentVector(rs.toDF("g", "q"), "g", "q")
        .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7, r._8))).toMap
    val (x, y) = rows.splitAt(137)
    val (mx, my, whole) = (collect(x), collect(y), collect(rows))
    def merge(a: Option[M], b: Option[M]): M = (a, b) match {
      case (Some(p), Some(q)) => (p._1 + q._1, p._2 + q._2, p._3 + q._3,
        p._4 + q._4, p._5 + q._5, math.min(p._6, q._6), math.max(p._7, q._7))
      case (Some(p), None) => p
      case (None, Some(q)) => q
      case _ => throw new IllegalStateException("empty merge")
    }
    val merged = (mx.keySet ++ my.keySet).map(k =>
      k -> merge(mx.get(k), my.get(k))).toMap
    assert(merged == whole,
      "half + half moment vectors merge to the whole-set vector")
  }

  test("momentVector overflow surfaces as NULL, never a wrapped long") {
    // |q| = 10⁶ → q⁴ = 10²⁴ per row, far past Long.Max: raw long
    // arithmetic would silently wrap (non-ANSI); the decimal-accumulated
    // kernel must return NULL for the overflowed sums and exact values
    // for everything that still fits
    val rows = Seq(("big", 1000000L), ("big", 1000000L),
      ("small", 3L), ("small", -2L))
    val out = graft.ops.Sketch.momentVector(rows.toDF("g", "q"), "g", "q")
      .collect().map(r => r.getAs[String]("g") -> r).toMap
    val big = out("big")
    assert(big.getAs[Long]("n") == 2L && big.getAs[Long]("s1") == 2000000L)
    assert(big.getAs[Long]("s2") == 2000000000000L, "Σq² exact (fits)")
    assert(big.isNullAt(big.fieldIndex("s4")),
      "Σq⁴ = 2·10²⁴ exceeds Long — must be NULL, not a wrapped value")
    val small = out("small")
    assert((small.getAs[Long]("s1"), small.getAs[Long]("s2"),
      small.getAs[Long]("s3"), small.getAs[Long]("s4")) ==
      ((1L, 13L, 19L, 97L)), "in-range vectors stay exact")
  }

  test("native sketch aggregates: seeded random multi-partition runs are bit-equal to single-partition (empty partials, all-NULL groups)") {
    import graft.functions.SketchAggregates
    Seq(11, 42, 97).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val rows: Seq[(String, java.lang.Long)] = (1 to 2000).map { _ =>
        val g = "g" + rnd.nextInt(5)
        val k: java.lang.Long =
          if (g == "g0") null                  // an entirely-NULL group
          else if (rnd.nextInt(20) == 0) null  // sprinkled nulls elsewhere
          else java.lang.Long.valueOf(rnd.nextInt(500).toLong)
        (g, k)
      }
      val df = rows.toDF("grp", "key")
      def sketches(d: org.apache.spark.sql.DataFrame) =
        d.groupBy(col("grp")).agg(
            SketchAggregates.hllRegistersAgg(col("key")).as("hll"),
            SketchAggregates.cmsSketchAgg(col("key")).as("cms"),
            SketchAggregates.bitmapCellsAgg(col("key")).as("bmp"),
            SketchAggregates.kmvAgg(col("key")).as("kmv"))
          .collect().map(r => r.getString(0) -> (r.getSeq[Long](1),
            r.getSeq[Long](2), r.getSeq[Long](3), r.getSeq[Long](4)))
          .toMap
      val single = sketches(df.coalesce(1))
      // round-robin spread: each group's rows cross many partitions, so
      // partial buffers SERIALIZE, shuffle, and merge for real — the
      // path fixture data exercises only narrowly
      val spread = sketches(df.repartition(17))
      // grp-hashed over 64 partitions: ~59 EMPTY partials join the merge
      val sparse = sketches(df.repartition(64, col("grp")))
      assert(spread == single, s"seed $seed: spread-merge drifted")
      assert(sparse == single, s"seed $seed: empty-partial merge drifted")
      // the all-NULL group must equal the EMPTY sketches, never crash
      val g0 = single("g0")
      assert(g0._1.forall(_ == 0L) && g0._2.forall(_ == 0L) &&
        g0._3.isEmpty && g0._4.isEmpty,
        s"seed $seed: all-NULL group must yield empty sketches")
    }
  }

  test("momentVector per-ROW decimal overflow nulls the whole sum") {
    // |q| = 10¹⁰ → q⁴ = 10⁴⁰ exceeds DECIMAL(38,0) PER ROW: non-ANSI
    // Spark nulls that row's power and a naive sum() would silently
    // skip it, returning 16 (the other row's 2⁴) as a wrong-but-non-NULL
    // s4. The honest kernel compares count(power) to count(q) and nulls
    // the WHOLE sum — no partial sums ever escape.
    val rows = Seq(("g", 10000000000L), ("g", 2L))
    val out = graft.ops.Sketch.momentVector(rows.toDF("g", "q"), "g", "q")
      .collect().head
    assert(out.getAs[Long]("n") == 2L &&
      out.getAs[Long]("s1") == 10000000002L, "n/s1 unaffected")
    assert(out.isNullAt(out.fieldIndex("s4")),
      "one row's q⁴ overflowed 38 digits — s4 must be NULL, not 16")
    assert(out.getAs[Long]("q_max") == 10000000000L)
  }
}
