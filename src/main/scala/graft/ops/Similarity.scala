package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Baseline: brute-force cosine top-k (correctness reference). Scale path:
  * random-hyperplane LSH — each vector maps to a small bucket id, the
  * search touches only its bucket's candidates (O(n / #buckets) per query
  * on a 1000-executor cluster, bucket assignment is a narrow map stage).
  *
  * Determinism: hyperplane weights derive from md5 hex digits and the dot
  * products for bucketing are computed in exact DECIMAL arithmetic over
  * 3-dp-quantized components, so bucket ids are bit-stable across engines
  * (a SQL oracle reproduces them) and across partitionings — float
  * summation order never matters.
  */
object Similarity {

  /** Cosine similarity of two float arrays: elementwise product in double,
    * left-to-right fold — deterministic for a fixed element order. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Brute-force top-k by cosine against the vector of `queryId`.
    * The single-row query side is broadcast; tiebreak on id keeps the
    * top-k deterministic. */
  def topKBrute(emb: DataFrame, idCol: String, vecCol: String,
                queryId: Long, k: Int): DataFrame = {
    val q = emb.where(col(idCol) === lit(queryId))
      .select(col(vecCol).as("qvec"))
    emb.where(col(idCol) =!= lit(queryId))
      .crossJoin(broadcast(q))
      .withColumn("cos", round(cosine(col(vecCol), col("qvec")), 4))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Deterministic hyperplane weight for (plane p, dim d): an integer in
    * [-7, 8] from the first md5 hex digit of "p_d". */
  private def planeWeightExpr: String =
    "instr('0123456789abcdef', substring(md5(concat(p, '_', d)), 1, 1)) - 8"

  /** Assign each vector an LSH bucket id from `planes` random hyperplanes.
    * Output: (id, bucket). Exact decimal dot products → stable signs. */
  def lshBuckets(emb: DataFrame, idCol: String, vecCol: String,
                 planes: Int, dim: Int): DataFrame = {
    val comps = emb.select(col(idCol).as("vid"), posexplode(col(vecCol)).as(Seq("d", "x")))
      .withColumn("xq", expr("CAST(round(CAST(x AS DOUBLE), 3) AS DECIMAL(7,3))"))
    val withPlanes = comps.select(col("vid"), col("d"), col("xq"),
        explode(sequence(lit(0), lit(planes - 1))).as("p"))
      .withColumn("w", expr(planeWeightExpr))
    val dots = withPlanes.groupBy(col("vid"), col("p"))
      .agg(sum(col("xq") * col("w")).as("dot"))
    dots.groupBy(col("vid"))
      .agg(sum(expr("CASE WHEN dot > 0 THEN shiftleft(1L, p) ELSE 0L END")).as("bucket"))
      .select(col("vid").as(idCol), col("bucket"))
  }

  /** Bucket occupancy summary (the ANN index statistics). */
  def lshBucketStats(emb: DataFrame, idCol: String, vecCol: String,
                     planes: Int, dim: Int): DataFrame =
    lshBuckets(emb, idCol, vecCol, planes, dim)
      .groupBy("bucket").agg(count(lit(1)).as("n"), min(col(idCol)).as("min_id"))

  /** ANN top-k: search only within the query vector's LSH bucket, rank by
    * exact cosine. The candidate set is an equality join on bucket id. */
  def annSearch(emb: DataFrame, idCol: String, vecCol: String,
                queryId: Long, k: Int, planes: Int, dim: Int): DataFrame = {
    val buckets = lshBuckets(emb, idCol, vecCol, planes, dim)
    val withB = emb.join(buckets, Seq(idCol))
    val q = withB.where(col(idCol) === lit(queryId))
      .select(col("bucket"), col(vecCol).as("qvec"))
    withB.join(broadcast(q), Seq("bucket"))
      .where(col(idCol) =!= lit(queryId))
      .withColumn("cos", round(cosine(col(vecCol), col("qvec")), 4))
      .select(col(idCol), col("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }
}
