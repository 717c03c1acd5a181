package graft
/** Prints formatted plans for representative queries and greps for the
  * properties we require: PushedFilters reaching the scan, broadcast
  * joins on dim tables, whole-stage codegen coverage. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_filter_pushdown", "q5_multi_join", "q3_join_agg", "etl_changelog_extract")
    for (q <- names) {
      println(s"===== $q")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
