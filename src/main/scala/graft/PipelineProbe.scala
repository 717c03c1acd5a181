package graft
import graft.etl.Pipelines
import graft.sinks.KeyedParquetSink
/** Drives the full reference-equivalent ETL flow twice (initial sync +
  * idempotent re-run) against real testdata. */
object PipelineProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val target = java.nio.file.Files.createTempDirectory("graft_pipe").toString + "/customers"
    val r1 = Pipelines.referenceSync(spark, "/root/testdata/sf0.001", target)
    r1.results.foreach(r => println(s"PIPE stage=${r.stage} ok=${r.ok} rows=${r.rows}"))
    val n1 = KeyedParquetSink.read(spark, target).count()
    val r2 = Pipelines.referenceSync(spark, "/root/testdata/sf0.001", target)
    val n2 = KeyedParquetSink.read(spark, target).count()
    println(s"PIPE run1_ok=${r1.ok} run2_ok=${r2.ok} table_rows=$n1 after_rerun=$n2 idempotent=${n1 == n2}")
    spark.stop()
  }
}
