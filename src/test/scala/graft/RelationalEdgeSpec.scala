package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Degenerate-input robustness for the relational q* family (and the
  * graph/bitmap operators that read orders/lineitem): every registered
  * operator must execute cleanly when the star schema carries the
  * classic warehouse edge rows — an order with NO lineitems (outer-join
  * and FK paths), a zero-price/zero-quantity line, single-line orders,
  * and a customer with no orders. At 100 TB these are daily occurrences
  * (cancelled orders, free items, new accounts), not test exotica.
  */
class RelationalEdgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** sf0.001 tables with orders + lineitem replaced:
    *  - order 1: two normal lines
    *  - order 2: NO lineitems (exists only in orders)
    *  - order 3: one zero-price, zero-quantity line
    *  - order 4: single normal line, same customer as order 1
    *  - customer keys come from the real sf0.001 customer table
    *    (custkeys 1..3 exist there), so FK joins still resolve.
    */
  private lazy val edgeDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-rel-edge").toString
    val src = java.nio.file.Paths.get(TestSpark.sf)
    java.nio.file.Files.list(src).forEach { p =>
      val n = p.getFileName.toString
      if (n != "orders.parquet" && n != "lineitem.parquet")
        java.nio.file.Files.copy(p, java.nio.file.Paths.get(dir, n))
    }
    Seq(
      (1L, 1L, "O", 150.0, ts("2024-03-01 00:00:00"), "1-URGENT"),
      (2L, 2L, "F", 0.0, ts("2024-03-02 00:00:00"), "5-LOW"),
      (3L, 3L, "P", 0.0, ts("2024-03-03 00:00:00"), "3-MEDIUM"),
      (4L, 1L, "O", 50.0, ts("2024-03-04 00:00:00"), "2-HIGH"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    Seq(
      (1L, 1L, 1L, 1, 2.0, 100.0, 0.1, 0.02, "N", "O", ts("2024-03-05 00:00:00")),
      (1L, 2L, 2L, 2, 1.0, 50.0, 0.0, 0.0, "R", "F", ts("2024-04-15 00:00:00")),
      (3L, 3L, 3L, 1, 0.0, 0.0, 0.0, 0.0, "A", "F", ts("2024-03-03 00:00:00")),
      (4L, 1L, 2L, 1, 3.0, 50.0, 0.05, 0.01, "N", "O", ts("2024-03-10 00:00:00")))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.parquet(s"$dir/lineitem.parquet")
    dir
  }

  private val skip = Set.empty[String]
  SparkEntry.queries.keys
    .filter(n => (n.startsWith("q") || n == "graph_pagerank") && !skip(n))
    .toSeq.sorted.foreach { name =>
      test(s"$name executes over no-line orders / zero lines / idle customers") {
        val df = SparkEntry.queries(name)(spark, edgeDir)
        assert(df.columns.nonEmpty)
        df.count() // force full execution — must not throw
      }
    }

  test("q13_custdist counts the no-order customers in the zero bucket") {
    val out = SparkEntry.queries("q13_custdist")(spark, edgeDir)
      .select($"c_count", $"custdist").as[(Long, Long)].collect().toMap
    val nCust = graft.sources.Tables.customer(spark, edgeDir).count()
    // customers 1..3 hold all 4 orders (cust 1 has two); everyone else
    // lands in the zero bucket the LEFT join must preserve
    assert(out(0L) == nCust - 3)
    assert(out(2L) == 1L && out(1L) == 2L)
  }

  test("q12_ship_latency keeps the no-line order out and bands the rest") {
    val out = SparkEntry.queries("q12_ship_latency")(spark, edgeDir)
      .select($"band", $"high_line_count", $"low_line_count")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // order 2 has no lines → contributes nothing; 4 lines total:
    // order 1 line 1 ships in 4 d (high), line 2 in 45 d (high);
    // order 3 same-day (low); order 4 in 6 d (high)
    assert(out("0-30d") == ((2L, 1L)))
    assert(out("31-90d") == ((1L, 0L)))
    assert(out.values.map(t => t._1 + t._2).sum == 4L)
  }

  test("q9_profit survives the zero-price zero-quantity line") {
    val rows = SparkEntry.queries("q9_profit")(spark, edgeDir).collect()
    assert(rows.map(_.getAs[Long]("n_items")).sum == 4L)
    // the zero line contributes exactly 0 profit, not NULL
    rows.foreach(r => assert(!r.isNullAt(r.fieldIndex("profit_cents"))))
  }

  test("q18_big_orders is empty when no order reaches the quantity bar") {
    assert(SparkEntry.queries("q18_big_orders")(spark, edgeDir).count() == 0L)
  }
}
