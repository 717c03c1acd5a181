package graft
import org.apache.spark.sql.functions._
import graft.streaming.StreamOps
/** Drives StreamOps via a REAL file-source streaming query over the
  * events table (ns-timestamp path included). */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[4]", 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // file streaming source needs an explicit schema; events.ts arrives as
    // long ns under nanosAsLong → same conversion as the batch loader
    val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val stream = spark.readStream.schema(batch.schema)
      .parquet("/tmp/events_stream_dir")
      .withColumn("ts", graft.sources.Tables.nsToTs(col("ts")))

    val q1 = StreamOps.windowedAgg(stream, "ts", "event_type", "value")
      .writeStream.outputMode("complete").format("memory").queryName("wagg").start()
    q1.processAllAvailable(); q1.stop()
    val agg = spark.table("wagg").orderBy(col("win_start"), col("event_type"))
    println("WINDOWED rows=" + agg.count())
    agg.show(5, false)

    val q2 = StreamOps.dedupByKey(stream, "ts", Seq("user_id"))
      .writeStream.outputMode("append").format("memory").queryName("dk").start()
    q2.processAllAvailable(); q2.stop()
    println("DEDUP user rows=" + spark.table("dk").count() +
      " distinct_users_batch=" + batch.select("user_id").distinct().count())

    val q3 = StreamOps.cleanStream(stream)
      .writeStream.outputMode("append").format("memory").queryName("cl").start()
    q3.processAllAvailable(); q3.stop()
    println("CLEAN rows=" + spark.table("cl").count())
    spark.table("cl").show(3, false)

    // Stateful sessionization (flatMapGroupsWithState) over the real file
    // stream; closed sessions must be a subset of the batch operator's
    // sessions (open tails aren't flushed without a watermark-advancing
    // event).
    val q4 = StreamOps.sessionizeStream(stream, gapMinutes = 30, watermark = "0 seconds")
      .writeStream.outputMode("append").format("memory").queryName("sess").start()
    q4.processAllAvailable(); q4.stop()
    val streamSess = spark.table("sess")
      .select(col("user_id"), col("n_events"), col("dur_sec"))
    val batchSess = graft.ops.Events.sessionStats(
        batch.withColumn("ts", graft.sources.Tables.nsToTs(col("ts"))),
        "user_id", "ts", "event_id", 30)
      .select(col("user_id"), col("n_events"), col("dur_sec"))
    val extra = streamSess.exceptAll(batchSess).count()
    println("SESSIONS stream_closed=" + streamSess.count() +
      " batch_total=" + batchSess.count() + " not_in_batch=" + extra)

    // Stream-stream interval join over the real file stream vs the batch
    // twin — pair sets must match exactly (all data fits one watermark).
    val q5 = StreamOps.correlateEvents(stream, "purchase", "error")
      .writeStream.outputMode("append").format("memory").queryName("corr").start()
    q5.processAllAvailable(); q5.stop()
    val batchCorr = StreamOps.correlateEvents(
      batch.withColumn("ts", graft.sources.Tables.nsToTs(col("ts"))),
      "purchase", "error")
    val corrDiff = spark.table("corr").exceptAll(batchCorr).count() +
      batchCorr.exceptAll(spark.table("corr")).count()
    println("CORRELATE stream_pairs=" + spark.table("corr").count() +
      " batch_pairs=" + batchCorr.count() + " diff=" + corrDiff)

    // PROBE: batch/stream parity — same windowed agg computed in batch mode
    val batchAgg = batch
      .withColumn("ts", graft.sources.Tables.nsToTs(col("ts")))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,4)")).cast("double").as("total"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"), col("total"))
    val diff = batchAgg.exceptAll(spark.table("wagg")).count() +
               spark.table("wagg").exceptAll(batchAgg).count()
    println("PARITY batch-vs-stream diff rows=" + diff)
    spark.stop()
  }
}
