package graft
import org.apache.spark.sql.functions._
import graft.sinks.KeyedParquetSink
import graft.sources.Tables
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8)
      .config("spark.sql.warehouse.dir", java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    KeyedParquetSink.writeBucketed(Tables.lineitem(spark, dir), "bp_lineitem", Seq("l_orderkey"), 8)
    KeyedParquetSink.writeBucketed(
      Tables.orders(spark, dir).select(col("o_orderkey").as("l_orderkey"), col("o_totalprice")),
      "bp_orders", Seq("l_orderkey"), 8)
    val j = spark.table("bp_lineitem").hint("merge").join(spark.table("bp_orders"), Seq("l_orderkey"))
    val plan = j.queryExecution.executedPlan.toString
    println("BUCKET exchanges_in_plan=" + "Exchange".r.findAllIn(plan).size +
      " joined_rows=" + j.count())
    // scheduled runner over real data
    val reports = graft.etl.Runner.runScheduled(spark, Seq(
      graft.etl.Runner.Stage("count_li", s => Tables.lineitem(s, dir).limit(10))),
      intervalMs = 50, iterations = 3)
    println("SCHED runs=" + reports.size + " all_ok=" + reports.forall(_.ok))
    spark.stop()
  }
}
