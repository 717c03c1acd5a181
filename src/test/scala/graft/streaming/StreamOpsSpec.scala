package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.TestSpark

case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
              event_type: String, value: Double)

class StreamOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(min: Int): java.sql.Timestamp =
    java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("windowedAgg aggregates tumbling event-time windows") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Ev]
    input.addData(
      Ev(1, ts(1), 1, "click", 1.0), Ev(2, ts(2), 1, "click", 2.0),
      Ev(3, ts(5), 2, "view", 5.0))
    val q = StreamOps.windowedAgg(input.toDF(), "ts", "event_type", "value",
        windowLen = "10 minutes", watermark = "5 minutes")
      .writeStream.outputMode("complete").format("memory").queryName("wagg").start()
    q.processAllAvailable(); q.stop()
    val byType = spark.table("wagg").select($"event_type", $"n", $"total")
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byType("click") == ((2L, 3.0)) && byType("view") == ((1L, 5.0)))
  }

  test("dedupByKey drops duplicate keys within the watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Ev]
    input.addData(
      Ev(10, ts(1), 1, "click", 1.0), Ev(10, ts(1), 1, "click", 1.0),
      Ev(11, ts(2), 1, "view", 2.0))
    val q = StreamOps.dedupByKey(input.toDF(), "ts", Seq("event_id"))
      .writeStream.outputMode("append").format("memory").queryName("dedup").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup").count() == 2)
  }

  test("cleanStream applies the batch Normalize kernel to a stream") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Ev]
    input.addData(Ev(1, ts(1), 1, " error ", 0.0), Ev(2, ts(2), 2, "click", 3.5))
    val q = StreamOps.cleanStream(input.toDF())
      .writeStream.outputMode("append").format("memory").queryName("clean").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("clean").orderBy("event_id")
      .select($"val", $"iserr", $"et").collect()
      .map(r => (Option(r.get(0)), r.getInt(1), r.getString(2))).toSeq
    // " error " is upper-trimmed but bool01 compares the raw value
    assert(got == Seq((None, 0, "ERROR"), (Some(3.5), 0, "CLICK")))
  }
}
