package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query runs at sf0.001, has an oracle, and the flagship
  * entry returns rows. The cross-engine value check is tools/verify_local.py
  * (DuckDB oracle); this spec guards the contract shape. */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("every oracle has a query; only sketch queries lack an oracle") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    // sketch-based ops get a rows-only check (engine-specific sketches
    // can't be reproduced in the DuckDB oracle); everything else must
    // have one
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("q_approx_distinct", "q_approx_quantile"))
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
