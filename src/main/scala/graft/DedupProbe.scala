package graft

import org.apache.spark.sql.functions._
import graft.ops.Dedup
import graft.sources.Tables

/** Stage-by-stage timing probe for the dedup_clusters pipeline — pair
  * generation vs label propagation — to target optimization where the
  * time actually goes. */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.documents(spark, dir)
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (i <- 1 to 2) {
      time(s"shingles run$i") {
        noop(Dedup.shingleHashes(docs, "doc_id", "text", 3))
      }
      val sh = Dedup.shingleHashes(docs, "doc_id", "text", 3)
      time(s"df_group run$i") {
        noop(sh.groupBy(col("s")).agg(count(lit(1)).as("df")))
      }
      time(s"filtered run$i") {
        val rare = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
          .where(col("df") <= 50).select(col("s"))
        noop(sh.join(rare, Seq("s")))
      }
      val pairs = time(s"pairs_t05 run$i") {
        val p = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
          .localCheckpoint(true)
        println(s"  n_pairs = ${p.count()}")
        p
      }
      time(s"minlabel3 run$i") {
        Dedup.minLabelClusters(pairs, 3)
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_members"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"full_query run$i") {
        SparkEntry.queries("dedup_clusters")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
