package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.LogicalRDD

/** The cluster-safe checkpoint switch for session-shared frames:
  * default mode is byte-identical to the historical
  * pin(localCheckpoint(true)); `spark.graft.checkpoint.mode=reliable`
  * routes the same frames through a reliable Dataset.checkpoint whose
  * partitions are FILES — the path that survives executor loss on a
  * real cluster — and reuse (including across a Caches.sweep) keeps
  * answering from the checkpoint. */
class CachesSharedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def rootIsLogicalRdd(df: org.apache.spark.sql.DataFrame) =
    df.queryExecution.analyzed match {
      case _: LogicalRDD => true
      case _ => false
    }

  test("default local mode: shared() == pin(localCheckpoint(true)), " +
      "and an already-rooted frame is not copied again") {
    import spark.implicits._
    val base = (1L to 100L).toDF("x")
      .groupBy((col("x") % 7).as("k")).agg(sum(col("x")).as("s"))
    val sh = Caches.shared(base)
    assert(rootIsLogicalRdd(sh), "local mode roots the frame in blocks")
    def rootRddId(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed
        .asInstanceOf[LogicalRDD].rdd.id
    val again = Caches.shared(sh)
    assert(rootRddId(again) == rootRddId(sh),
      "an already-rooted frame must not be re-checkpointed")
    assert(again.collect().map(_.getLong(1)).sum ==
      sh.collect().map(_.getLong(1)).sum)
  }

  test("reliable mode: shared frames live as checkpoint FILES and " +
      "survive a sweep (executor-loss-safe reuse)") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_reliable_ckpt").toString
    spark.conf.set(Caches.ModeKey, "reliable")
    spark.conf.set(Caches.DirKey, dir)
    try {
      val base = (1L to 1000L).toDF("x")
        .groupBy((col("x") % 13).as("k")).agg(sum(col("x")).as("s"))
      val sh = Caches.shared(base)
      val want = base.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      // the frame is rooted in a RELIABLY-checkpointed RDD: its
      // partitions are files under the configured dir, not executor
      // blocks — this is the property that survives executor loss
      val rdds = sh.queryExecution.analyzed.collect {
        case l: LogicalRDD => l.rdd
      }
      assert(rdds.nonEmpty && rdds.forall(_.getCheckpointFile.isDefined),
        "reliable mode must root shared frames in checkpoint FILES")
      def files(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles.map(files).sum
        else if (f.getName.startsWith("part-")) 1L else 0L
      assert(files(new java.io.File(dir)) > 0,
        "checkpoint partitions written under spark.graft.checkpoint.dir")

      // reuse still works after the cross-query cache sweep: the sweep
      // drops storage blocks, and the reliable frame re-reads its files
      Caches.sweep(spark)
      val got = sh.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == want, "post-sweep reuse answers from the checkpoint")
    } finally {
      spark.conf.set(Caches.ModeKey, "local")
      spark.conf.unset(Caches.DirKey)
    }
  }
}
