package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** SURVEY §5's co-located-join claim, machine-checked: when both join
  * sides are bucketed by the join key with the same bucket count, the
  * sort-merge join runs with ZERO shuffle exchanges — the layout step
  * that turns the daily 100 TB fact ⋈ fact join from two full-network
  * exchanges into a local merge per bucket. (Pre-bucketing is paid once
  * at write time; every subsequent co-keyed join rides it free.)
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  test("same-bucket-count tables join with zero exchanges; unbucketed join shuffles") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bucketed").toString
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.sources.Tables.orders(spark, graft.TestSpark.sf)
        .select(col("o_orderkey"), col("o_totalprice"))
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$dir/orders_b").mode("overwrite")
        .saveAsTable("graft_orders_b")
      graft.sources.Tables.lineitem(spark, graft.TestSpark.sf)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$dir/lineitem_b").mode("overwrite")
        .saveAsTable("graft_lineitem_b")

      val bucketed = spark.table("graft_orders_b")
        .join(spark.table("graft_lineitem_b"), Seq("o_orderkey"))
        .groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
      val bPlan = bucketed.queryExecution.executedPlan.toString
      assert(!bPlan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$bPlan")

      // the same join over raw parquet DOES shuffle — the baseline the
      // bucketed layout removes
      val raw = graft.sources.Tables.orders(spark, graft.TestSpark.sf)
        .select(col("o_orderkey"), col("o_totalprice"))
        .join(graft.sources.Tables.lineitem(spark, graft.TestSpark.sf)
          .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
          Seq("o_orderkey"))
      assert(raw.queryExecution.executedPlan.toString.contains("Exchange"))

      // and the bucketed result is the raw result
      val want = raw.groupBy(col("o_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
      val got = bucketed.collect()
        .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
      assert(got.toSeq == want.toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_lineitem_b")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
