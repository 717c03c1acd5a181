package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sinks.KeyedParquetSink

/** The PERSISTED scale-adaptive IVF index — the production shape of
  * [[Similarity.ivfAutoTrain]]: train once, store the artifact, serve
  * every later search/append from the STORE, never from the training
  * corpus. (The oracle-checked sim_ivf_auto* queries recompute the same
  * index inline because the correctness gate is stateless; this is the
  * stateful twin, the same pattern as [[IncrementalDedup]] for the
  * dedup index and TokenizerModel for the vocabulary.)
  *
  * Layout under `path` (each a bucket-partitioned keyed parquet table,
  * [[graft.sinks.KeyedParquetSink]]):
  *   - `centroids/`: (cell, cvec: array<long>, dcc, n_cells) — the
  *     trained milli-unit centroid arrays with their exact squared
  *     norms; ≤ 4096 rows, read whole and broadcast by every consumer.
  *   - `vectors/`:   (vid, cell, xq: array<long>, dxx) — the corpus
  *     assignment, keyed by CELL so a search's
  *     [[KeyedParquetSink.readBuckets]] scans ONLY the nprobe probe
  *     cells' buckets: candidate I/O per query is O(nprobe · n/cells) =
  *     O(nprobe · √n) under the autoCells rule, and at 100 TB the probe
  *     read is |probe buckets| / numBuckets of the table, never a scan.
  *
  * All stored numbers are the exact-integer milli-unit representation
  * ([[Similarity.milliQuant]]), so a search through the store is
  * bit-identical to the inline ivfAutoSearch ranking (spec-pinned with
  * the training corpus DELETED before the search).
  */
object IvfIndex {

  final case class BuildReport(cells: Int, nVectors: Long, nCentroids: Long)

  private def ldot(a: Column, b: Column): Column =
    graft.functions.LongVectorFunctions.vecDotLong(a, b)

  /** Train on `emb` (sampled-Lloyd, cells ≈ √n) and persist the index. */
  def build(spark: SparkSession, emb: DataFrame, idCol: String,
            vecCol: String, path: String, sampleFactor: Int = 8,
            numBuckets: Int = 16): BuildReport =
    buildFrom(spark,
      Similarity.ivfAutoTrain(emb, idCol, vecCol, sampleFactor),
      path, numBuckets)

  /** Persist an already-trained index (e.g. the session-shared frame) —
    * training is never paid twice to get the artifact. */
  def buildFrom(spark: SparkSession, t: Similarity.TrainedIvf, path: String,
                numBuckets: Int): BuildReport = {
    KeyedParquetSink.write(
      t.centArr.withColumn("n_cells", lit(t.cells.toLong)),
      s"$path/centroids", Seq("cell"), math.min(4, numBuckets))
    KeyedParquetSink.write(
      t.assigned.select(col("vid"), col("cell"), col("xq"), col("dxx")),
      s"$path/vectors", Seq("cell"), numBuckets)
    BuildReport(t.cells,
      KeyedParquetSink.read(spark, s"$path/vectors").count(),
      KeyedParquetSink.read(spark, s"$path/centroids").count())
  }

  /** The stored centroid arrays (cell, cvec, dcc) — ≤ 4096 rows. */
  def centroids(spark: SparkSession, path: String): DataFrame =
    KeyedParquetSink.read(spark, s"$path/centroids")
      .select(col("cell"), col("cvec"), col("dcc"))

  /** Quantize a raw query/batch frame to the index representation via
    * the SAME Spark expression the build used (never a driver-side
    * reimplementation of the rounding — it cannot drift). */
  private def quantOf(df: DataFrame, idCol: String, vecCol: String) =
    df.select(col(idCol).as("vid"),
      Similarity.milliQuant(col(vecCol)).as("xq"))

  /** Assign new vectors against the STORED centroids and append them
    * into the index — one broadcast-centroids map stage over the batch
    * (the training corpus is never touched, no retrain, no rescan).
    * Batches are trusted vid-disjoint (the [[KeyedParquetSink.append]]
    * contract). Returns the appended row count. */
  def append(spark: SparkSession, batch: DataFrame, idCol: String,
             vecCol: String, path: String, numBuckets: Int = 16): Long = {
    val cent = centroids(spark, path)
    val assigned = Similarity.lloydRankedArr(quantOf(batch, idCol, vecCol), cent)
      .where(col("rn") === 1)
      .select(col("vid"), col("cell"), col("xq"), col("dxx"))
      .localCheckpoint(true) // count + write below must agree
    KeyedParquetSink.append(assigned, s"$path/vectors", Seq("cell"), numBuckets)
    assigned.count()
  }

  /** Exact integer-bp cosine top-k for an EXTERNAL query vector, served
    * entirely from the stored artifact:
    *   1. the query is quantized by the build's own Spark expression and
    *      ranked against the broadcast stored centroids (≤ cells rows);
    *   2. its `nprobe` best cells are collected (bounded by nprobe);
    *   3. ONLY those cells' buckets are read ([[KeyedParquetSink
    *      .readBuckets]]) and scored against the broadcast query row.
    * `excludeId` drops a stored vector from the candidates (searching
    * for a vector already in the index — the ivfAutoSearch contract). */
  def search(spark: SparkSession, path: String, queryVec: Seq[Float],
             k: Int, nprobe: Int, numBuckets: Int = 16,
             idCol: String = "vid",
             excludeId: Option[Long] = None): DataFrame = {
    import spark.implicits._
    val cent = centroids(spark, path)
    val q = quantOf(Seq((-1L, queryVec)).toDF("vid", "qv"), "vid", "qv")
    // the query's probe cells through the same ranked-cells kernel the
    // inline search uses (cos_bp desc, cell tiebreak)
    val qRanked = Similarity.lloydRankedArr(q, cent)
      .where(col("rn") <= nprobe)
      .select(col("cell"), col("xq").as("qxq"), col("dxx").as("qdxx"))
      .localCheckpoint(true) // feeds the bucket prune AND the score join
    val cand = KeyedParquetSink.readBuckets(spark, s"$path/vectors",
        Seq("cell"), numBuckets, qRanked.select(col("cell")))
    val scored = cand.join(broadcast(qRanked), Seq("cell"))
      .withColumn("q_cos_bp",
        Similarity.cosBp(ldot(col("xq"), col("qxq")), col("dxx"), col("qdxx")))
    excludeId.fold(scored)(id => scored.where(col("vid") =!= lit(id)))
      .select(col("vid").as(idCol), col("q_cos_bp").as("cos_bp"))
      .orderBy(col("cos_bp").desc, col(idCol))
      .limit(k)
  }

  /** BATCHED top-k against the STORED artifact — the production
    * retrieval shape (one request carries Q queries), composed from two
    * proven pieces: the one-broadcast probe-cell ranking of
    * [[Similarity.ivfAutoSearchBatchFrom]] and ONE
    * [[KeyedParquetSink.readBuckets]] point read over the UNION of
    * every query's probe cells. Candidate I/O per batch is
    * |distinct probe buckets| / numBuckets of the table — the read is
    * amortized across the batch instead of paid per query, and a
    * stored vector is scored at most once per query regardless of how
    * many queries probe its cell. `queries` carries (qidCol, vecCol)
    * rows; a stored row whose vid equals a qid is excluded from that
    * query's candidates (the searching-for-a-member contract of the
    * inline batch search — external queries should use ids disjoint
    * from stored vids, e.g. negative). Output: (qid, idCol, cos_bp,
    * rank), rank 1..k per query. */
  def searchBatch(spark: SparkSession, path: String, queries: DataFrame,
                  qidCol: String, vecCol: String, k: Int, nprobe: Int,
                  numBuckets: Int = 16, idCol: String = "vid"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cent = centroids(spark, path)
    // all Q queries rank their probe cells in ONE broadcast-centroids
    // pass (≤ Q·nprobe rows, checkpointed — feeds the bucket prune AND
    // the score join, and hides the legitimate broadcast cross)
    val qRanked = Similarity.lloydRankedArr(
        quantOf(queries, qidCol, vecCol), cent)
      .where(col("rn") <= nprobe)
      .select(col("vid").as("qid"), col("cell"),
        col("xq").as("qxq"), col("dxx").as("qdxx"))
      .localCheckpoint(true)
    val cand = KeyedParquetSink.readBuckets(spark, s"$path/vectors",
      Seq("cell"), numBuckets, qRanked.select(col("cell")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("q_cos_bp").desc, col("vid"))
    cand.join(broadcast(qRanked), Seq("cell"))
      .where(col("vid") =!= col("qid"))
      .withColumn("q_cos_bp",
        Similarity.cosBp(ldot(col("xq"), col("qxq")), col("dxx"), col("qdxx")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("qid"), col("vid").as(idCol),
        col("q_cos_bp").as("cos_bp"), col("rk").cast("long").as("rank"))
      .orderBy(col("qid"), col("rank"))
  }

  /** Subject ERASURE through the stored artifact — the GDPR path the
    * batch audits (etl_subject_access / etl_erasure_audit) plan for,
    * applied to the ANN store: remove the given vector ids so no later
    * search, batch search, append-assignment or stats can ever return
    * them. Centroids are NOT retrained (they are aggregate statistics,
    * not subject rows — the same no-retrain contract as [[append]]).
    *
    * Two-phase, because the table is bucketed by CELL to serve search
    * and an id gives no bucket:
    *   1. LOCATE — a column-pruned scan of (vid, cell) only (two narrow
    *      columns, never the vector payload) semi-joined against the
    *      ids: yields each subject's cell, ≤ |ids| rows.
    *   2. REWRITE — [[KeyedParquetSink.deleteMatching]] prunes to the
    *      buckets those cells hash into, anti-joins the vids, and
    *      dynamic-partition-overwrites just those buckets; untouched
    *      buckets are never opened.
    * Idempotent (re-deleting matches nothing). Returns rows removed. */
  def delete(spark: SparkSession, path: String, ids: DataFrame,
             idCol: String, numBuckets: Int = 16): Long = {
    val idf = ids.select(col(idCol).cast("long").as("vid")).distinct()
      .localCheckpoint(true) // feeds the locate pass once
    val located = KeyedParquetSink.read(spark, s"$path/vectors")
      .select(col("vid"), col("cell"))
      .join(broadcast(idf), Seq("vid"), "left_semi")
      .localCheckpoint(true) // ≤ |ids| rows; prune list + match rows
    KeyedParquetSink.deleteMatching(spark, s"$path/vectors",
      Seq("cell"), numBuckets, located, Seq("vid"))
  }

  /** Occupancy audit of the STORED index (the sim_ivf_auto stats shape
    * over the artifact — drifts as appends land): per cell the member
    * count, min vid and centroid norm, plus the trained cell count. */
  def stats(spark: SparkSession, path: String): DataFrame = {
    val cent = KeyedParquetSink.read(spark, s"$path/centroids")
    KeyedParquetSink.read(spark, s"$path/vectors")
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n"), min(col("vid")).as("min_id"))
      .join(broadcast(cent.select(col("cell"),
        floor(sqrt(col("dcc").cast("double"))).cast("long").as("c_norm_milli"),
        col("n_cells"))), Seq("cell"))
      .orderBy(col("cell"))
  }
}
