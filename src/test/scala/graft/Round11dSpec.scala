package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class Round11dSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def run(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf)

  test("sim_mrl_recall: one row per prefix, recall consistent with hits") {
    val rows = run("sim_mrl_recall").collect()
      .map(r => (r.getAs[Long]("prefix_dims"), r.getAs[Long]("n_hits"),
        r.getAs[Long]("recall_bp"))).sortBy(_._1)
    assert(rows.map(_._1) sameElements Array(8L, 16L, 32L))
    rows.foreach { case (_, hits, bp) =>
      assert(hits >= 0 && hits <= 10, "hits live in [0, k]")
      assert(bp == hits * 1000, "recall_bp is exactly hits/k in bp")
    }
    // the full-width curve point is exact by construction: the 64-dim
    // top-10 against itself recalls 10/10 — pin it through the kernel
    val emb = graft.sources.Tables.embeddings(spark, TestSpark.sf)
    val full = graft.ops.Similarity
      .topKBrute(emb, "vec_id", "embedding", 0L, 10)
    assert(full.count() == 10)
  }

  test("events_user_entropy: bands partition users; single-type users at 0") {
    val ev = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("user_id").isNotNull)
    val nUsers = ev.select(col("user_id")).distinct().count()
    val nTypes = ev.select(col("event_type")).distinct().count()
    val rows = run("events_user_entropy").collect()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers,
      "every user lands in exactly one entropy band")
    rows.foreach { r =>
      assert(r.getAs[Long]("max_types") <= nTypes)
      assert(r.getAs[Long]("min_ent_cb") >= 0)
      assert(r.getAs[Long]("min_ent_cb") <= r.getAs[Long]("max_ent_cb"))
    }
    // a user with one event type has zero pseudo-entropy: verify via a
    // direct single-type recount against the band-0 row's floor
    val singleTyped = ev.groupBy(col("user_id"))
      .agg(count_distinct(col("event_type")).as("nt"))
      .where(col("nt") === 1).count()
    val band0 = rows.find(_.getAs[Long]("band") == 0L)
      .map(_.getAs[Long]("n_users")).getOrElse(0L)
    assert(band0 >= singleTyped,
      "band 0 must contain at least every single-typed user")
  }

  test("events_sliding_distinct_sketch: bits bounded by exact and by m") {
    val rows = run("events_sliding_distinct_sketch").collect()
    val days = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("ts").cast("date")).distinct().count()
    assert(rows.length == days, "one window per observed day")
    rows.foreach { r =>
      val (bits, exact) =
        (r.getAs[Long]("bits_set"), r.getAs[Long]("exact_distinct"))
      assert(bits >= 1 && bits <= 4096L)
      assert(bits <= exact, "a hash image never exceeds its preimage")
      assert(r.getAs[Long]("sat_bp") == bits * 10000 / 4096)
    }
    // windows accumulate: the 7-day window ending at day d covers ≥ the
    // single-day distinct — check on the max window vs max single day
    val daily = graft.sources.Tables.events(spark, TestSpark.sf)
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("ts").cast("date").as("day"), col("user_id")).distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("exact_distinct")).max >= daily,
      "the widest window must cover at least the busiest day")
  }
}
