package graft.ops

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-data pipelines.
  *
  * Scale design: every variant is one-or-two shuffles with map-side partial
  * aggregation and *no cross joins* — candidate generation always goes
  * through equality buckets (hash, LSH band, simhash value, shared shingle)
  * so the pairwise work is bounded by bucket sizes, not n².
  */
object Dedup {

  import TextAnalysis.tokens

  /** Exact dedup via content hash: one hash-aggregate. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("keeper"))

  /** MinHash signatures: k independent hash functions h_s(t) = md5(s:t),
    * signature row per (doc, seed). Computed from the *distinct* token set
    * with a map-side partial min — one narrow shuffle of (doc, seed).
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        k: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("doc"),
        explode(array_distinct(tokens(col(textCol)))).as("tok"))
    val seeds = toks.select(col("doc"), col("tok"),
        explode(sequence(lit(0), lit(k - 1))).as("seed"))
    seeds.groupBy(col("doc"), col("seed"))
      .agg(min(md5(concat(col("seed").cast("string"), lit(":"), col("tok")))).as("mh"))
  }

  /** LSH banding over minhash signatures: docs sharing any full band are
    * candidate near-duplicate pairs. Join is on (band, bandkey) equality —
    * no cross join. Returns distinct (a, b) with a < b. */
  def lshCandidatePairs(sigs: DataFrame, rowsPerBand: Int): DataFrame = {
    val bands = sigs
      .withColumn("band", col("seed").divide(lit(rowsPerBand)).cast("int"))
      .groupBy(col("doc"), col("band"))
      .agg(concat_ws(",", transform(array_sort(collect_list(struct(col("seed"), col("mh")))),
        s => s.getField("mh"))).as("bandkey"))
    val l = bands.select(col("doc").as("a"), col("band"), col("bandkey"))
    val r = bands.select(col("doc").as("b"), col("band"), col("bandkey"))
    l.join(r, Seq("band", "bandkey"))
      .where(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** 16-bit SimHash from md5 nibbles: per token, bit j of the hash votes
    * ±1; the sign of each bit's vote total forms the fingerprint. Exactly
    * reproducible in SQL via hex-digit lookup — no engine-private hash. */
  def simhash16(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("tok"))
      .withColumn("h", md5(col("tok")))
    val bits = tok.select(col("doc"), col("h"),
        explode(sequence(lit(0), lit(15))).as("j"))
      .withColumn("nib",
        expr("instr('0123456789abcdef', substring(h, 1 + (j div 4), 1)) - 1"))
      .withColumn("vote", expr("CASE WHEN (shiftright(nib, j % 4) % 2) = 1 THEN 1 ELSE -1 END"))
    val votes = bits.groupBy(col("doc"), col("j")).agg(sum(col("vote")).as("v"))
    votes.groupBy(col("doc"))
      .agg(sum(expr("CASE WHEN v > 0 THEN shiftleft(1L, j) ELSE 0L END")).as("simhash"))
  }

  /** SimHash bucket summary: identical fingerprints = near-dup cluster. */
  def simhashBuckets(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    simhash16(docs, idCol, textCol)
      .groupBy("simhash").agg(count(lit(1)).as("n"), min(col("doc")).as("keeper"))

  /** Word n-gram Jaccard similarity pairs. Candidates come from an
    * equality join on shared shingles (inverted-index shape), so pair work
    * is proportional to true overlap, not n². */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double): DataFrame = {
    val sh = docs.select(col(idCol).as("doc"),
        explode(array_distinct(TextAnalysis.shingles(col(textCol), n))).as("s"))
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    val inter = sh.select(col("doc").as("a"), col("s"))
      .join(sh.select(col("doc").as("b"), col("s")), Seq("s"))
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc").as("a"), col("n_sh").as("na")), Seq("a"))
      .join(sizes.select(col("doc").as("b"), col("n_sh").as("nb")), Seq("b"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
      .where(col("jaccard") >= lit(threshold))
      .select(col("a"), col("b"), col("inter"), col("jaccard"))
  }

  /** Embedding-cosine near-duplicate pairs, partitioned by a blocking
    * column (e.g. cluster label) so the pairwise join stays within blocks. */
  def embeddingPairs(emb: DataFrame, idCol: String, vecCol: String,
                     blockCol: String, threshold: Double): DataFrame = {
    val l = emb.select(col(blockCol).as("blk"), col(idCol).as("a"), col(vecCol).as("va"))
    val r = emb.select(col(blockCol).as("blk"), col(idCol).as("b"), col(vecCol).as("vb"))
    l.join(r, Seq("blk")).where(col("a") < col("b"))
      .withColumn("cos", round(Similarity.cosine(col("va"), col("vb")), 4))
      .where(col("cos") >= lit(threshold))
      .select(col("a"), col("b"), col("cos"))
  }
}
