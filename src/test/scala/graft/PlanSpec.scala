package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.SimpleMode

/** Plan-shape regression guards: the scale properties SURVEY §5 promises
  * must be visible in the physical plan, not just intended. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sf)
      .queryExecution.explainString(SimpleMode)

  // Deliberate tiny-side broadcast nested-loop joins:
  //  - sim_topk_brute / sim_ann_search: single-row query vector vs all
  //    rows (that IS the brute-force / candidate scan),
  //  - sim_ivf_cells / sim_ivf_search / sim_ivf_multiprobe: every vector
  //    vs the 8 broadcast seed centroids (that IS the IVF assignment),
  //  - text_tfidf: 1-row corpus-size scalar joined to every (doc, token).
  private val allowNestedLoop = Set("sim_topk_brute", "sim_ann_search",
    "sim_ivf_cells", "sim_ivf_search", "sim_ivf_multiprobe", "text_tfidf")

  SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
    test(s"plan of $name has no cartesian product / stray nested-loop join") {
      val plan = planOf(name)
      assert(!plan.contains("CartesianProduct"), s"cartesian product in:\n$plan")
      if (!allowNestedLoop(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop join in:\n$plan")
    }
  }

  test("no query reads a parquet source more than its join arity needs") {
    // regression guard for the round-3 scan-elimination work: the dedup
    // pair generators checkpoint their index (0-1 scans in the final
    // plan), ANN assignment is computed in place (never a join back to
    // the vector table), and the widest query is the 6-table star join.
    val worst = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      val plan = planOf(name)
      name -> "Scan parquet".r.findAllIn(plan).size
    }.maxBy(_._2)
    assert(worst._2 <= 6, s"${worst._1} scans parquet ${worst._2}x:\n${planOf(worst._1)}")
  }

  test("q_filter_pushdown pushes both predicates into the parquet scan") {
    val plan = SparkEntry.queries("q_filter_pushdown")(spark, TestSpark.sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters:"))
    assert(plan.contains("GreaterThanOrEqual(l_shipdate") && plan.contains("LessThan(l_quantity"))
  }

  test("q5_multi_join broadcasts all five dimension sides") {
    val plan = planOf("q5_multi_join")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
    assert(broadcasts == 5, s"expected 5 broadcast joins, got $broadcasts:\n$plan")
  }

  test("narrow projections prune the scan schema") {
    val plan = SparkEntry.queries("q_topk")(spark, TestSpark.sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    // only the three needed columns are read
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double,o_orderdate:timestamp"))
  }
}
