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

    // the corpus production job: dedup → keeper → batched keyed load →
    // Z-order compaction, with the before/after layout numbers
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val corpusDir = java.nio.file.Files.createTempDirectory("graft_corpus").toString + "/c"
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val cr = Pipelines.corpusRewrite(spark, docs, corpusDir)
    println(s"PIPE corpus rows_in=${cr.rowsIn} kept=${cr.rowsKept} " +
      s"dups_dropped=${cr.dupsDropped} files=${cr.filesBefore}->${cr.filesAfter} " +
      s"bytes=${cr.bytesBefore}->${cr.bytesAfter} compacted=${cr.partitionsCompacted}")
    val audit = Pipelines.layoutAudit(spark, corpusDir)
      .agg(org.apache.spark.sql.functions.sum("inversions")).collect().head.getLong(0)
    println(s"PIPE corpus layout_inversions=$audit")
    spark.stop()
  }
}
