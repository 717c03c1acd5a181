package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SketchAggregatesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def events = graft.sources.Tables.events(spark, TestSpark.sf)
    .where(col("user_id").isNotNull)

  test("native HLL registers are bit-equal to the composed explode+groupBy kernel") {
    val native = graft.SparkEntry.queries("q_hll_native")(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val composed = graft.ops.Sketch.hllRegisters(
        graft.sources.Tables.events(spark, TestSpark.sf), "user_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native == composed, "register maps must be identical")
  }

  test("native CMS cells are bit-equal to the composed explode+groupBy kernel") {
    val native = graft.SparkEntry.queries("q_cms_native")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val composed = graft.ops.Sketch.cmsSketch(events, "user_id", 4, 1024L)
      .collect()
      .map(r => (r.getAs[Number]("r").longValue,
        r.getAs[Long]("bucket")) -> r.getAs[Long]("cnt")).toMap
    assert(native == composed, "cell grids must be identical")
  }

  test("native KMV equals the composed distinct + k-smallest path; merge = k-smallest of union") {
    val native = graft.SparkEntry.queries("q_kmv_native")(spark, TestSpark.sf)
      .collect().map(_.getLong(0)).toSeq
    val composed = events
      .select(expr("conv(substring(md5(cast(user_id as string)), 1, 8), 16, 10)")
        .cast("long").as("h"))
      .distinct().orderBy(col("h")).limit(256)
      .collect().map(_.getLong(0)).toSeq
    assert(native == composed, "ascending k-smallest hash sets identical")
    // split-merge identity: k smallest of (k smallest of each half)
    def kmv(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(SketchAggregates.kmvAgg(col("user_id")).as("hs"))
        .collect().head.getSeq[Long](0)
    val (a, b) = (events.where(col("event_id") % 2 === 0),
      events.where(col("event_id") % 2 =!= 0))
    val merged = (kmv(a) ++ kmv(b)).distinct.sorted.take(256)
    assert(merged == kmv(events), "KMV k-smallest-of-union merge identity")
  }

  test("merge identity: split-aggregate buffers combine to the whole") {
    def regs(df: org.apache.spark.sql.DataFrame): Array[Long] =
      df.agg(SketchAggregates.hllRegistersAgg(col("user_id")).as("r"))
        .collect().head.getSeq[Long](0).toArray
    def cells(df: org.apache.spark.sql.DataFrame): Array[Long] =
      df.agg(SketchAggregates.cmsSketchAgg(col("user_id")).as("c"))
        .collect().head.getSeq[Long](0).toArray
    val (a, b) = (events.where(col("event_id") % 2 === 0),
      events.where(col("event_id") % 2 =!= 0))
    // HLL: element-wise MAX of split registers == whole registers
    val hllMerged = regs(a).zip(regs(b)).map { case (x, y) => math.max(x, y) }
    assert(hllMerged.sameElements(regs(events)), "HLL max-merge identity")
    // CMS: element-wise SUM of split counters == whole counters
    val cmsMerged = cells(a).zip(cells(b)).map { case (x, y) => x + y }
    assert(cmsMerged.sameElements(cells(events)), "CMS add-merge identity")
  }

  test("plan: one partial/final aggregate pair, no Generate before the agg") {
    Seq("q_hll_native", "q_cms_native").foreach { q =>
      val plan = graft.SparkEntry.queries(q)(spark, TestSpark.sf)
        .queryExecution.executedPlan.toString
    // the sketch is built by ObjectHashAggregate (TypedImperativeAggregate)
    // in partial+final form; the only Generate is the FINAL ≤4096-row
    // posexplode of the finished buffer ABOVE the aggregate — the scan
    // side must carry none (the composed kernel's ×depth explode is gone)
      assert(plan.contains("ObjectHashAggregate"), s"$q: native agg absent")
      // tree prints top-down, so anything BELOW the aggregate appears
      // AFTER it — every Generate must print before the first (= final)
      // aggregate
      val aggIdx = plan.indexOf("ObjectHashAggregate")
      val genIdx = plan.lastIndexOf("Generate")
      assert(genIdx == -1 || genIdx < aggIdx,
        s"$q: a Generate below the aggregate means the scan still explodes")
    }
  }
}
