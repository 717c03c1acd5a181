package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, chunk ("frame") addressing, and a
  * clearly-marked decode stub.
  *
  * The container has no image/audio codecs, so decode derives deterministic
  * fake metadata from the payload hash — the Spark-side schema,
  * partitioning and batch shape are real; swapping the stub for a true
  * codec (a mapInArrow stage on a cluster with native libraries) changes
  * only the innermost expression, not the pipeline.
  */
object Multimodal {

  /** Frame/chunk size in bytes for chunk addressing. */
  val ChunkBytes = 64

  /** Opaque binary payload from a string column (stands in for real media
    * bytes in the synthetic corpus). */
  def payload(c: Column): Column = encode(c, "UTF-8")

  def payloadSize(c: Column): Column = octet_length(payload(c)).cast("long")

  /** Number of fixed-size chunks covering the payload (integer ceil). */
  def chunkCount(c: Column): Column =
    floor((payloadSize(c) + lit(ChunkBytes - 1)) / lit(ChunkBytes)).cast("long")

  /** STUB decode: deterministic fake width/height from md5 nibbles of the
    * content. A real implementation decodes the binary with a codec; the
    * downstream schema (ints) is identical. */
  def fakeDims(textCol: String): (Column, Column) = (
    expr(s"instr('0123456789abcdef', substring(md5($textCol), 1, 1)) * 16").cast("int"),
    expr(s"instr('0123456789abcdef', substring(md5($textCol), 2, 1)) * 16").cast("int"))

  /** Explode a document into sampled chunk rows (every `stride`-th chunk),
    * md5-fingerprinting each chunk — the "frame sampling" shape: one narrow
    * explode, no shuffle until the caller aggregates. */
  def sampleChunks(docs: DataFrame, idCol: String, textCol: String,
                   stride: Int): DataFrame = {
    docs.select(col(idCol), col(textCol).as("_graft_payload"))
      .withColumn("chunk_idx",
        explode(sequence(lit(0L), chunkCount(col("_graft_payload")) - lit(1L))))
      .where(col("chunk_idx") % lit(stride) === lit(0))
      .withColumn("chunk_md5",
        expr(s"md5(substring(_graft_payload, CAST(chunk_idx * $ChunkBytes + 1 AS INT), $ChunkBytes))"))
      .drop("_graft_payload")
  }
}
