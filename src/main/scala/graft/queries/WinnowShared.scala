package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.ops.{TextAnalysis => TA}

/** The shared per-document winnowing fingerprint frame — memoized per
  * (session, dataset) exactly like [[GraphShared]] and
  * [[SimIvf.sharedAuto]], so the winnowing family (text_winnowing /
  * dedup_winnow_pairs / text_template_fps and any future consumer) pays
  * for ONE tokenize → 3-shingle → md5 → winnowMinima(w=4) corpus pass
  * instead of one per registry entry. This retires the family's
  * rebuild-per-query cost (the three entries were the top of the
  * round-14 slow list at 4.4 / 4.2 / 4.1 s each, dominated by the
  * identical base pass) the same way the shared trained IVF frame
  * retired the sim_ivf_auto* rebuilds.
  *
  * One checkpointed frame serves all consumers:
  *   (doc_id, source, nw, nf, fps)
  * where `nw` = window count (selected minima INCLUDING repeats — the
  * density denominator), `nf` = distinct-fingerprint count, and `fps`
  * = the distinct fingerprint array a consumer explodes into postings.
  * Docs with < 4 shingles are excluded (no full window), matching the
  * previous per-query `size(sh) >= 4` guard.
  *
  * The frame is ~|selected fingerprints| ≈ 2/(w+1) of the shingle
  * stream — far smaller than re-tokenizing the corpus, and pinned so
  * the between-query cache sweep keeps it alive.
  */
object WinnowShared {

  private val cache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  /** The checkpointed (doc_id, source, nw, nf, fps) frame. */
  private[graft] def docWinnow(s: SparkSession, dir: String): DataFrame = {
    cache.filterInPlace { case ((sess, _), _) => !sess.sparkContext.isStopped }
    cache.getOrElseUpdate((s, dir), {
      val base = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), TA.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("source"),
          TA.shinglesOf(col("toks"), 3).as("sh"))
        .where(size(col("sh")) >= 4)
        .select(col("doc_id"), col("source"),
          TA.winnowMinima(transform(col("sh"), x => md5(x)), 4).as("wins"))
        .select(col("doc_id"), col("source"),
          size(col("wins")).cast("long").as("nw"),
          size(array_distinct(col("wins"))).cast("long").as("nf"),
          array_distinct(col("wins")).as("fps"))
      graft.Caches.shared(base)
    })
  }

  /** The exploded (doc_id, f) fingerprint postings view. */
  private[graft] def fpPostings(s: SparkSession, dir: String): DataFrame =
    docWinnow(s, dir).select(col("doc_id"), explode(col("fps")).as("f"))

  private val pairCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  /** The df≤50-capped winnow candidate pairs (a, b, shared), shared ≥ 2 —
    * ONE materialized pair frame serving dedup_winnow_pairs,
    * dedup_winnow_cc, and dedup_winnow_containment (the sharedPairs05
    * convention: the pair graph is infrastructure its cluster/audit
    * consumers query, not something each rebuilds). The df cap keeps
    * pair work ∝ true overlap at any corpus size (a boilerplate
    * fingerprint shared by thousands of docs carries no match signal). */
  private[graft] def winnowPairs(s: SparkSession, dir: String): DataFrame = {
    pairCache.filterInPlace { case ((sess, _), _) =>
      !sess.sparkContext.isStopped }
    pairCache.getOrElseUpdate((s, dir), {
      val fp = fpPostings(s, dir)
      val capped = fp.join(
        fp.groupBy(col("f")).agg(count(lit(1)).as("df"))
          .where(col("df") <= 50), Seq("f"))
        .localCheckpoint(true)
      val pairs = capped.select(col("f"), col("doc_id").as("a"))
        .join(capped.select(col("f"), col("doc_id").as("b")), Seq("f"))
        .where(col("a") < col("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("shared"))
        .where(col("shared") >= 2)
      graft.Caches.shared(pairs)
    })
  }

  /** Materialize the shared frames (bench warmup) — same convention as
    * [[GraphShared.warmShared]]: without it, whichever winnowing entry
    * runs first absorbs the whole corpus pass as its own cost. */
  def warmShared(s: SparkSession, dir: String): Unit = {
    docWinnow(s, dir).count(); winnowPairs(s, dir).count(); ()
  }
}
