package graft

import org.apache.spark.sql.functions._

/** Scale-stress probe for the capped pair generators: replicates the
  * sf0.1 corpus `SPARK_GRAFT_SCALE_MULT`× with IDENTICAL text (the worst
  * case — every hot LSH band bucket and stop-shingle posting grows by
  * the full multiplier) and times the three operators whose uncapped
  * forms are quadratic in bucket occupancy. With the caps, work per
  * bucket is bounded, so runtime should grow ~linearly with the
  * multiplier; without them the degenerate bucket alone would emit
  * (0.8·n)²/2 pairs (≈ 800M rows at 10×).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val mult = sys.env.getOrElse("SPARK_GRAFT_SCALE_MULT", "10").toInt
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.sources.Tables.documents(spark, dir)
      .crossJoin(spark.range(mult).toDF("rep"))
      .select((col("doc_id") * mult + col("rep")).as("doc_id"), col("text"))
      .localCheckpoint(true)
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .crossJoin(spark.range(mult).toDF("rep"))
      .select((col("vec_id") * mult + col("rep")).as("vec_id"), col("embedding"))
      .localCheckpoint(true)
    println(s"SCALE mult=$mult docs=${docs.count()} vectors=${emb.count()}")

    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"SCALE $tag rows=$rows ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("lsh_candidate_pairs")(
      graft.ops.Dedup.lshCandidatePairs(docs, "doc_id", "text", 8, 4).count())
    time("ngram_jaccard_pairs")(
      graft.ops.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.1).count())
    time("nn_join")(
      graft.ops.Similarity.nnJoin(emb, "vec_id", "embedding",
        graft.ops.Similarity.autoPlanes(emb.count(), 64), 64, 256).count())
    // the fuzzy-dedup kernel: O(len²) DP per candidate pair — the band
    // cap must bound the pair count (and therefore total DP work) even
    // when every replica lands in the same buckets
    time("edit_distance") {
      val t = docs.withColumn("len", length(col("text")).cast("long"))
      graft.ops.Dedup.lshCandidatePairs(docs, "doc_id", "text", 8, 4)
        .join(t.select(col("doc_id").as("a"), col("text").as("ta"),
          col("len").as("la")), "a")
        .join(t.select(col("doc_id").as("b"), col("text").as("tb"),
          col("len").as("lb")), "b")
        .where(col("la") <= 400 && col("lb") <= 400)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(levenshtein(col("ta"), col("tb")).as("d"))
        .agg(sum(col("d"))).count()
    }
    spark.stop()
  }
}
