package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Typed metadata produced by the decode stage. */
case class MediaMeta(doc_id: Long, size_bytes: Long, width: Int, height: Int,
                     n_frames: Long)

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

  /** STUB decoder over raw bytes: deterministic dims from the md5 of the
    * payload (hex digit d1 → width 16·(d1+1), d2 → height; frames =
    * 64-byte chunk count). A real deployment swaps this lambda for a
    * codec call — the batch shape around it doesn't change. */
  def decodeStub(bytes: Array[Byte]): (Int, Int) = {
    val h = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    (16 * (((h(0) >> 4) & 0xf) + 1), 16 * ((h(0) & 0xf) + 1))
  }

  /** Batch-shaped decode stage: one partition of (id, payload) rows at a
    * time through `decoder` via mapPartitions — the Spark-side plumbing
    * (typed schema, per-partition batching, no shuffle) is exactly what a
    * real codec needs; only the innermost lambda is a stub here. The
    * decoder is called once per row inside the partition iterator, so a
    * real implementation can hold per-partition state (a codec context)
    * outside the loop. */
  def decodeBatch(docs: DataFrame, idCol: String, textCol: String,
                  decoder: Array[Byte] => (Int, Int) = decodeStub): Dataset[MediaMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), payload(col(textCol)))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup would init a codec context here
        it.map { case (id, bytes) =>
          val (w, h) = decoder(bytes)
          MediaMeta(id, bytes.length.toLong, w, h,
            (bytes.length + ChunkBytes - 1) / ChunkBytes)
        }
      }
  }

  /** Chunk count in CHARACTER units — chunk addressing goes through
    * `substring`, which is character-based in both engines; deriving the
    * count from bytes would mis-address multi-byte text (phantom empty
    * trailing chunks whose md5('') collides across documents). */
  def charChunkCount(c: Column): Column =
    floor((length(c).cast("long") + lit(ChunkBytes - 1)) / lit(ChunkBytes)).cast("long")

  /** Explode a document into sampled chunk rows (every `stride`-th chunk),
    * md5-fingerprinting each chunk — the "frame sampling" shape: one narrow
    * explode, no shuffle until the caller aggregates. */
  def sampleChunks(docs: DataFrame, idCol: String, textCol: String,
                   stride: Int): DataFrame = {
    // guard empty payloads: Spark's sequence(0, -1) steps DOWN to [0, -1]
    // and would emit phantom chunks (same pitfall TextAnalysis.shingles
    // guards); an empty array explodes to no rows, matching range(0, 0)
    val nch = charChunkCount(col("_graft_payload"))
    docs.select(col(idCol), col(textCol).as("_graft_payload"))
      .withColumn("chunk_idx",
        explode(when(nch > 0, sequence(lit(0L), nch - lit(1L)))
          .otherwise(array().cast("array<bigint>"))))
      .where(col("chunk_idx") % lit(stride) === lit(0))
      .withColumn("chunk_md5",
        expr(s"md5(substring(_graft_payload, CAST(chunk_idx * $ChunkBytes + 1 AS INT), $ChunkBytes))"))
      .drop("_graft_payload")
  }
}
