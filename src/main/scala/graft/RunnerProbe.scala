package graft
import org.apache.spark.sql.functions._
import graft.etl.{Runner, Normalize, Quality}
import graft.sources.Tables
/** Drives the orchestration surface over real tables: a clean→validate
  * pipeline with a transient failure injected into the first attempt. */
object RunnerProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    var flaky = 0
    val report = Runner.run(spark, Seq(
      Runner.Stage("clean_customer", s =>
        Tables.customer(s, dir).select(col("c_custkey"),
          Normalize.upperTrim(col("c_name")).as("n"))),
      Runner.Stage("validate_lineitem_flaky", s => {
        flaky += 1
        if (flaky < 2) sys.error("simulated transient source failure")
        Quality.keyReport(Tables.lineitem(s, dir), "lineitem",
          Quality.keysPresent(Seq("l_orderkey", "l_linenumber")))
      })), retries = 3, backoffMs = 10)
    report.results.foreach(r => println(
      s"RUNNER stage=${r.stage} ok=${r.ok} attempts=${r.attempts} rows=${r.rows}"))
    println("RUNNER report_ok=" + report.ok + " status_set=" + Runner.status.exists(_.ok))
    report.toDF(spark).show(false)
    spark.stop()
  }
}
