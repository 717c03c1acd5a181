package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query runs at sf0.001, has an oracle, and the flagship
  * entry returns rows. The cross-engine value check is tools/verify_local.py
  * (DuckDB oracle); this spec guards the contract shape. */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("every query has an oracle and every oracle has a query") {
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
  }

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"query $name executes at sf0.001") {
      val df = fn(spark, TestSpark.sf)
      assert(df.columns.nonEmpty)
      df.count() // force full execution
    }
  }
}
