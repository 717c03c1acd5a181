package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class AsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def trades = Seq(
    (1L, 10L, "t1"), (1L, 20L, "t2"), (1L, 5L, "t0"),
    (2L, 15L, "t3"), (3L, 7L, "t4")
  ).toDF("sym", "t", "trade")

  private def quotes = Seq(
    (1L, 8L, 100.0), (1L, 10L, 101.0), (1L, 19L, 102.0),
    (2L, 30L, 200.0)
  ).toDF("qsym", "qt", "px")

  test("backward as-of: latest quote at-or-before each trade, nulls when none") {
    val r = AsOf.joinBackward(trades, quotes, "sym", "qsym", "t", "qt")
      .select($"trade", $"px").orderBy($"trade")
      .as[(String, Option[Double])].collect().toSeq
    assert(r == Seq(
      ("t0", None),          // sym 1 @5: earliest quote is 8
      ("t1", Some(101.0)),   // @10: quote at exactly 10 is inclusive
      ("t2", Some(102.0)),   // @20: quote 19
      ("t3", None),          // sym 2 @15: only quote is 30 (future)
      ("t4", None)))         // sym 3: no quotes at all
  }

  test("as-of survives a real shuffle (many keys, forced partitioning)") {
    val l = spark.range(0, 1000).select(
      (col("id") % 37).as("k"), (col("id") * 7 % 1000).as("t"), col("id").as("lid"))
      .repartition(13)
    val r = spark.range(0, 500).select(
      (col("id") % 37).as("rk"), (col("id") * 13 % 1000).as("rt"), col("id").as("rid"))
      .repartition(7)
    val native = AsOf.joinBackward(l, r, "k", "rk", "t", "rt")
      .select($"lid", $"rid").orderBy($"lid")
      .as[(Long, Option[Long])].collect().toSeq
    // composed reference: max-time right row per (key, t<=) via join+window
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"lid").orderBy($"rt".desc, $"rid".desc)
    val composed = l.join(r, $"k" === $"rk" && $"rt" <= $"t", "left")
      .withColumn("rn", row_number().over(w))
      .where($"rn" === 1)
      .select($"lid", $"rid").orderBy($"lid")
      .as[(Long, Option[Long])].collect().toSeq
    assert(native.size == 1000 && composed.size == 1000)
    // tie on rt: composed picks max rid; native picks the LAST in (rt, sort)
    // order — compare only where the answer is unique
    val tied = l.join(r, $"k" === $"rk" && $"rt" <= $"t")
      .groupBy($"lid", $"rt").agg(count(lit(1)).as("n"))
      .groupBy($"lid").agg(max($"n").as("mx"), max($"rt").as("top"))
      .where($"mx" > 1).select($"lid").as[Long].collect().toSet
    val nU = native.filterNot(p => tied(p._1))
    val cU = composed.filterNot(p => tied(p._1))
    assert(nU == cU)
  }

  test("null keys and self-derived right side") {
    val l = Seq((Some(1L), 10L, "a"), (None, 10L, "b"), (Some(2L), 3L, "c"))
      .toDF("k", "t", "tag")
    // right DERIVED FROM the left frame (shared lineage → exprId collision
    // without the re-alias in AsOf.joinBackward)
    val r = l.where($"tag" === "a").select($"k".as("rk"), ($"t" - 5).as("rt"), lit(9.0).as("v"))
    val got = AsOf.joinBackward(l, r, "k", "rk", "t", "rt")
      .select($"tag", $"v").orderBy($"tag")
      .as[(String, Option[Double])].collect().toSeq
    assert(got == Seq(("a", Some(9.0)), ("b", None), ("c", None)))
  }

  test("mismatched or unsupported key/time types fail at plan construction") {
    val l = Seq((1, 10L)).toDF("k", "t")                  // k: INT
    val r = Seq((1L, 5L, 1.0)).toDF("rk", "rt", "v")      // rk: BIGINT
    val ex = intercept[IllegalArgumentException] {
      AsOf.joinBackward(l, r, "k", "rk", "t", "rt")
    }
    assert(ex.getMessage.contains("key types differ"))
    val l2 = Seq((1L, 10)).toDF("k", "t")                 // t: INT
    val r2 = Seq((1L, 5L, 1.0)).toDF("rk", "rt", "v")     // rt: BIGINT
    val ex2 = intercept[IllegalArgumentException] {
      AsOf.joinBackward(l2, r2, "k", "rk", "t", "rt")
    }
    assert(ex2.getMessage.contains("time types differ"))
    // an unsupported (decimal) key fails at construction too, not in a task
    val l3 = Seq((BigDecimal(1), 10L)).toDF("k", "t")
    val r3 = Seq((BigDecimal(1), 5L, 1.0)).toDF("rk", "rt", "v")
    val ex3 = intercept[IllegalArgumentException] {
      AsOf.joinBackward(l3, r3, "k", "rk", "t", "rt")
    }
    assert(ex3.getMessage.contains("unsupported"))
  }

  test("physical plan: one exchange per side, no window, no row explosion") {
    val plan = AsOf.joinBackward(trades, quotes, "sym", "qsym", "t", "qt")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"))
    assert(!plan.contains("Window"))
    assert("Exchange".r.findAllIn(plan).size <= 2, plan)
  }

  test("forward as-of: earliest quote at-or-after each trade (equal time " +
      "matches), nulls when none") {
    val r = AsOf.joinForward(trades, quotes, "sym", "qsym", "t", "qt")
      .select($"trade", $"px").orderBy($"trade")
      .as[(String, Option[Double])].collect().toSeq
    assert(r == Seq(
      ("t0", Some(100.0)),   // sym 1 @5: next quote 8
      ("t1", Some(101.0)),   // @10: quote at exactly 10 is inclusive
      ("t2", None),          // @20: last quote was 19 (past)
      ("t3", Some(200.0)),   // sym 2 @15: quote 30 is ahead
      ("t4", None)))         // sym 3: no quotes at all
  }

  test("nearest as-of: closest quote either direction, equal gaps -> " +
      "backward") {
    // sym 1 trade @14: quotes 10 (gap 4) vs 19 (gap 5) -> backward 101;
    // trade @15: 10 vs 19 -> forward 102 (gap 4 < 5);
    // trade @14.5 impossible (long), use symmetric: quote gaps equal at
    // t=14.5 not representable — pin the tie with quotes 8/12 @ t=10
    val t2 = Seq((1L, 14L, "a"), (1L, 15L, "b"), (2L, 9L, "c"),
      (3L, 1L, "d")).toDF("sym", "t", "trade")
    val q2 = Seq((1L, 10L, 101.0), (1L, 19L, 102.0),
      (2L, 7L, 50.0), (2L, 11L, 60.0)).toDF("qsym", "qt", "px")
    val r = AsOf.joinNearest(t2, q2, "sym", "qsym", "t", "qt")
      .select($"trade", $"px").orderBy($"trade")
      .as[(String, Option[Double])].collect().toSeq
    assert(r == Seq(
      ("a", Some(101.0)),  // gaps 4 vs 5 -> backward
      ("b", Some(102.0)),  // gaps 5 vs 4 -> forward
      ("c", Some(50.0)),   // gaps 2 vs 2 -> TIE -> backward
      ("d", None)))        // sym 3: no quotes
  }

  test("forward + nearest match the composed join references under " +
      "shuffle (unique right times per key)") {
    // right times UNIQUE per key (the gated entries pre-aggregate to
    // unique (key, time) for exactly this determinism)
    val l = spark.range(0, 1000).select(
      (col("id") % 37).as("k"), (col("id") * 7 % 1000).as("t"),
      col("id").as("lid")).repartition(13)
    val r = spark.range(0, 500).select(
      (col("id") % 37).as("rk"),
      ((col("id") / 37).cast("long") * 37 * 13 % 997 + col("id") % 37)
        .as("rt0"), col("id").as("rid"))
      .groupBy($"rk", $"rt0").agg(min($"rid").as("rid"))
      .select($"rk", $"rt0".as("rt"), $"rid").repartition(7)
    import org.apache.spark.sql.expressions.Window

    val nativeF = AsOf.joinForward(l, r, "k", "rk", "t", "rt")
      .select($"lid", $"rid").orderBy($"lid")
      .as[(Long, Option[Long])].collect().toSeq
    val wf = Window.partitionBy($"lid").orderBy($"rt".asc)
    val composedF = l.join(r, $"k" === $"rk" && $"rt" >= $"t", "left")
      .withColumn("rn", row_number().over(wf)).where($"rn" === 1)
      .select($"lid", $"rid").orderBy($"lid")
      .as[(Long, Option[Long])].collect().toSeq
    assert(nativeF == composedF, "forward == composed argmin reference")

    val nativeN = AsOf.joinNearest(l, r, "k", "rk", "t", "rt")
      .select($"lid", $"rid").orderBy($"lid")
      .as[(Long, Option[Long])].collect().toSeq
    val wn = Window.partitionBy($"lid")
      .orderBy(abs($"rt" - $"t").asc,
        when($"rt" <= $"t", 0).otherwise(1).asc)
    val composedN = l.join(r, $"k" === $"rk", "left")
      .withColumn("rn", row_number().over(wn)).where($"rn" === 1)
      .select($"lid", $"rid").orderBy($"lid")
      .as[(Long, Option[Long])].collect().toSeq
    assert(nativeN == composedN, "nearest == composed argmin reference")
  }

  test("forward/nearest physical plan: still the single-pass merge — " +
      "one exchange per side, no window, no join explosion") {
    for (df <- Seq(
        AsOf.joinForward(trades, quotes, "sym", "qsym", "t", "qt"),
        AsOf.joinNearest(trades, quotes, "sym", "qsym", "t", "qt"))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin"))
      assert(!plan.contains("Window"))
      assert("Exchange".r.findAllIn(plan).size <= 2, plan)
    }
  }

  test("nearest rejects non-integral time types at plan construction") {
    val l = Seq((1L, "x", "a")).toDF("k", "t", "tag")
    val r = Seq((1L, "y", 1.0)).toDF("rk", "rt", "v")
    val ex = intercept[IllegalArgumentException] {
      AsOf.joinNearest(l, r, "k", "rk", "t", "rt")
    }
    assert(ex.getMessage.contains("integral"))
  }
}
