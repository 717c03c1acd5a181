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
