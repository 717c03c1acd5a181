package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sinks.KeyedParquetSink

/** Persisted tokenizer artifacts — train once, ship, apply to every
  * later batch without retraining (the deployment half of
  * text_vocab_build / text_bpe_train, which are oracle-gated as
  * stateless queries):
  *
  *   - `vocab/`  (token, token_id, n)  keyed by token — the top-K id
  *     table `encode`/OOV joins broadcast.
  *   - `merges/` (round, pair)         keyed by round — the ordered
  *     BPE merge list.
  *
  * `segment` applies the STORED merges to a new batch through ONE
  * native expression ([[graft.functions.BpeSegment]]): the ordered
  * merge list (bounded by the merge-table size — a tokenizer CONFIG,
  * not data) is collected once and embedded as a codegen reference
  * object; each word is segmented in a single per-row pass with the
  * EXACT left-to-right replace semantics the trainer used (including
  * the shared-boundary-space skip rule), so deployment reproduces
  * training segmentation bit-for-bit — spec-pinned against the
  * replace() fold. A 32k-merge model stays one expression node where
  * the fold would be 32k chained replaces past Janino's method limit.
  * Like IncrementalDedup, the spec proves artifact-only application by
  * deleting the training corpus before the batch runs.
  */
object TokenizerModel {

  def save(spark: SparkSession, vocab: DataFrame, merges: DataFrame,
           path: String, numBuckets: Int = 8): Unit = {
    KeyedParquetSink.write(vocab, s"$path/vocab", Seq("token"), numBuckets)
    KeyedParquetSink.write(merges, s"$path/merges", Seq("round"), 1)
  }

  def vocab(spark: SparkSession, path: String): DataFrame =
    KeyedParquetSink.read(spark, s"$path/vocab")

  /** The ordered merge list (driver-side; bounded by the merge count —
    * a model hyperparameter, not data volume). */
  def merges(spark: SparkSession, path: String): Seq[String] =
    KeyedParquetSink.read(spark, s"$path/merges")
      .orderBy(col("round")).select(col("pair"))
      .collect().map(_.getString(0)).toSeq

  /** Chars of `w` as a sentinel-spaced symbol sequence: ' h e l l o '. */
  def charSeq(w: Column): Column =
    concat(lit(" "), concat_ws(" ",
      transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))),
      lit(" "))

  /** Apply stored merges in round order — the trainer's exact fuse. */
  def fuse(seq: Column, mergeList: Seq[String]): Column =
    mergeList.foldLeft(seq)((c, m) =>
      replace(c, lit(s" $m "), lit(" " + m.replace(" ", "") + " ")))

  /** The production form of [[fuse]]: ONE native expression
    * (functions.BpeSegment) applying the whole ordered merge list per
    * word — no chained replace nodes (a 32k-merge model would blow
    * Janino's method limit and fall back to interpreted), no
    * per-merge string re-materialization. Returns the word's pieces;
    * replay-exact with the fold (spec-pinned on the fixture corpus,
    * including the shared-boundary-space skip rule). */
  def pieces(word: Column, mergeList: Seq[String]): Column =
    graft.functions.BpeFunctions.bpeSegment(word, mergeList)

  /** Segment a batch with the stored model: per document, whitespace
    * token count and BPE piece count after the stored merges — the
    * "how many pieces will this cost" readout every packing/budget
    * planner needs, computed without the training corpus. */
  def segment(spark: SparkSession, docs: DataFrame, idCol: String,
              textCol: String, path: String): DataFrame = {
    val ms = merges(spark, path)
    docs
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .select(col("doc_id"),
        size(pieces(col("w"), ms)).cast("long").as("np"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("np")).as("n_pieces"))
  }
}
