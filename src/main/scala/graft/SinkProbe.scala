package graft
import org.apache.spark.sql.functions._
import graft.sinks.KeyedParquetSink
import graft.sources.Tables
import graft.etl.Upsert
/** Drives the keyed sink end-to-end over real testdata: write orders as a
  * bucketed table, upsert the same P→F update batch the etl_upsert_merge
  * query models, read back, and diff against the in-memory merge. */
object SinkProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = java.nio.file.Files.createTempDirectory("graft_sinkprobe").toString + "/orders"
    val base = Tables.orders(spark, "/root/testdata/sf0.001")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice"))
    KeyedParquetSink.write(base, dir, Seq("o_orderkey"), numBuckets = 16)
    val updates = base.where(col("o_orderstatus") === "P")
      .withColumn("o_orderstatus", lit("F"))
      .withColumn("o_totalprice", (col("o_totalprice") * lit(1.1)).cast("decimal(18,3)").cast("double"))
    println("PROBE base=" + base.count() + " updates=" + updates.count())
    KeyedParquetSink.upsert(spark, dir, updates, Seq("o_orderkey"), numBuckets = 16)
    val got = KeyedParquetSink.read(spark, dir)
    val want = Upsert.merge(base, updates, Seq("o_orderkey"))
    val diff = got.exceptAll(want).count() + want.exceptAll(got).count()
    println("PROBE table_rows=" + got.count() + " diff_vs_inmemory_merge=" + diff)
    // re-delivery: same updates again must change nothing
    KeyedParquetSink.upsert(spark, dir, updates, Seq("o_orderkey"), numBuckets = 16)
    val got2 = KeyedParquetSink.read(spark, dir)
    val diff2 = got2.exceptAll(want).count() + want.exceptAll(got2).count()
    println("PROBE after_redelivery_diff=" + diff2)
    spark.stop()
  }
}
