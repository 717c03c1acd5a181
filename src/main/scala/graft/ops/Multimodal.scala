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

  // ---- REAL header decode: BMP geometry, no codec library -------------
  // The Windows BMP container (public layout): magic 'BM' at byte 0,
  // and in the BITMAPINFOHEADER, int32 little-endian width at byte
  // offset 18 and height at offset 22. A magic-driven header parse
  // needs only byte slicing + hex arithmetic — all codegen'd string
  // expressions over hex(payload), reproducible verbatim in the SQL
  // oracle (DuckDB: ('0x' || hex)::BIGINT).

  /** Lowercase hex of the payload bytes — the parse domain (2 hex chars
    * per byte, so byte offset k = 1-based hex offset 2k+1). */
  def payloadHex(bin: Column): Column = lower(hex(bin))

  /** Unsigned 32-bit little-endian int at 0-based byte offset `off` of a
    * lowercase-hex payload: swap the four byte pairs to big-endian and
    * convert. Pure codegen'd substring/concat/conv. */
  def leU32(hexs: Column, off: Int): Column = {
    val p = 2 * off + 1
    conv(concat(substring(hexs, p + 6, 2), substring(hexs, p + 4, 2),
      substring(hexs, p + 2, 2), substring(hexs, p, 2)), 16, 10).cast("long")
  }

  /** 'BM' magic at byte 0. */
  def bmpMagic(hexs: Column): Column = substring(hexs, 1, 4) === lit("424d")

  /** Parseable BMP header: the magic AND enough bytes for the geometry
    * fields (26 = through the height int32 at offset 22..25). A
    * TRUNCATED file that kept its magic must take the opaque path, not
    * emit NULL geometry from a short hex slice. */
  def bmpParseable(hexs: Column): Column =
    bmpMagic(hexs) && length(hexs) >= lit(52)

  /** SIGNED 32-bit little-endian int at byte offset `off` — the
    * BITMAPINFOHEADER geometry fields are int32, not DWORD: a genuine
    * top-down BMP stores a NEGATIVE height, which the unsigned read
    * would decode as ~4.29e9 and corrupt every band/aspect-ratio
    * rollup downstream. Sign-extend when bit 31 is set. */
  def leI32(hexs: Column, off: Int): Column = {
    val u = leU32(hexs, off)
    when(u >= lit(2147483648L), u - lit(4294967296L)).otherwise(u)
  }

  def bmpWidth(hexs: Column): Column = leI32(hexs, 18)

  /** Pixel height = |signed height field| — negative means top-down row
    * order (same geometry, different scanline direction). */
  def bmpHeight(hexs: Column): Column = abs(leI32(hexs, 22))

  /** 4-byte little-endian lowercase hex of a non-negative int — the
    * write side of [[leU32]], for synthesizing container bytes
    * in-query (the container has no real media files). */
  def leHex4(v: Column): Column = {
    val be = lpad(lower(hex(v)), 8, "0")
    concat(substring(be, 7, 2), substring(be, 5, 2),
      substring(be, 3, 2), substring(be, 1, 2))
  }

  /** A real BMP file prefix (hex) for the given pixel geometry:
    * 'BM' + file size + reserved + pixel offset 54 + DIB size 40 +
    * width + height — byte-compatible with an actual .bmp header, so
    * [[bmpWidth]]/[[bmpHeight]] read synthesized and genuine files
    * alike (spec-pinned against a hand-assembled real header). */
  def bmpHeaderHex(w: Column, h: Column): Column =
    concat(lit("424d"),
      leHex4(lit(54L) + w * h * lit(3L)), // claimed file size (24bpp)
      lit("00000000"),                    // reserved
      leHex4(lit(54L)),                   // pixel data offset
      leHex4(lit(40L)),                   // BITMAPINFOHEADER size
      leHex4(w), leHex4(h))

  // ---- PNG geometry (public layout, round 17) -------------------------
  // 8-byte signature 89 50 4E 47 0D 0A 1A 0A, then the IHDR chunk:
  // 4-byte BIG-endian length (13), 'IHDR' at bytes 12-15, u32-BE width
  // at byte offset 16, u32-BE height at offset 20. Pure byte slicing
  // like the BMP path — no codec library anywhere.

  /** Unsigned 32-bit BIG-endian int at 0-based byte offset `off` — PNG
    * chunk fields are network order, no byte swap needed. */
  def beU32(hexs: Column, off: Int): Column =
    conv(substring(hexs, 2 * off + 1, 8), 16, 10).cast("long")

  private val PngMagicHex = "89504e470d0a1a0a"

  /** The 8-byte PNG signature at byte 0. */
  def pngMagic(hexs: Column): Column =
    substring(hexs, 1, 16) === lit(PngMagicHex)

  /** Signature AND enough bytes for the IHDR geometry (through the
    * height u32 at 20..23 = 24 bytes = 48 hex chars) AND the chunk at
    * 12 really is IHDR — a signature-only prefix takes the opaque
    * path, exactly like a truncated BMP. */
  def pngParseable(hexs: Column): Column =
    pngMagic(hexs) && length(hexs) >= lit(48) &&
      substring(hexs, 25, 8) === lit("49484452") // 'IHDR'

  /** PNG pixel width/height — u32-BE; the spec caps them at 2³¹−1 so
    * the unsigned read is exact. */
  def pngWidth(hexs: Column): Column = beU32(hexs, 16)
  def pngHeight(hexs: Column): Column = beU32(hexs, 20)

  /** 4-byte big-endian lowercase hex of a non-negative int. */
  def beHex4(v: Column): Column = lpad(lower(hex(v)), 8, "0")

  /** A real PNG file prefix (hex) for the given geometry: signature +
    * IHDR length 13 + 'IHDR' + width + height + bit depth 8, color
    * type 2 (truecolor), compression/filter/interlace 0 — the byte
    * layout of an actual .png through the interlace flag, so
    * [[pngWidth]]/[[pngHeight]] read synthesized and genuine files
    * alike (spec-pinned against a hand-assembled real header). */
  def pngHeaderHex(w: Column, h: Column): Column =
    concat(lit(PngMagicHex),
      lit("0000000d"),  // IHDR data length 13, BE
      lit("49484452"),  // 'IHDR'
      beHex4(w), beHex4(h),
      lit("0802000000")) // depth 8, truecolor, deflate, filter 0, no interlace

  // ---- GIF geometry (public layout, round 17) -------------------------
  // 'GIF87a' or 'GIF89a' at byte 0, then the logical screen descriptor:
  // u16 LITTLE-endian width at byte offset 6, height at offset 8.

  /** Unsigned 16-bit little-endian int at 0-based byte offset `off`. */
  def leU16(hexs: Column, off: Int): Column = {
    val p = 2 * off + 1
    conv(concat(substring(hexs, p + 2, 2), substring(hexs, p, 2)), 16, 10)
      .cast("long")
  }

  /** 'GIF87a' / 'GIF89a' at byte 0. */
  def gifMagic(hexs: Column): Column =
    substring(hexs, 1, 8) === lit("47494638") &&
      substring(hexs, 9, 4).isin("3761", "3961") // '7a' | '9a'

  /** Magic AND the full 13-byte logical screen descriptor header
    * region (header 6 + LSD 7 = 13 bytes = 26 hex chars). */
  def gifParseable(hexs: Column): Column =
    gifMagic(hexs) && length(hexs) >= lit(26)

  /** GIF logical-screen width/height — u16-LE at offsets 6/8. */
  def gifWidth(hexs: Column): Column = leU16(hexs, 6)
  def gifHeight(hexs: Column): Column = leU16(hexs, 8)

  /** 2-byte little-endian lowercase hex of an int in [0, 65535]. */
  def leHex2(v: Column): Column = {
    val be = lpad(lower(hex(v)), 4, "0")
    concat(substring(be, 3, 2), substring(be, 1, 2))
  }

  /** A real GIF89a file prefix (hex): magic + LE screen size + GCT
    * flags f7 (global table, 8-bit) + background 0 + aspect 0 — the
    * complete 13-byte header of an actual .gif. */
  def gifHeaderHex(w: Column, h: Column): Column =
    concat(lit("474946383961"), leHex2(w), leHex2(h), lit("f70000"))

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
