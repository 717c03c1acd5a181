package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The PNG IHDR and GIF logical-screen header decodes (round 17) —
  * real-layout parses pinned against HAND-ASSEMBLED genuine headers
  * (not produced by the writer side, so a shared bug can't mask),
  * round-tripped through actual bytes, and dispatch-pinned. */
class MultimodalPngGifSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def hexDf(hx: String) = {
    import spark.implicits._
    Seq(hx).toDF("hx")
      .select(Multimodal.payloadHex(unhex(col("hx"))).as("p"))
  }

  test("pngWidth/pngHeight read a hand-assembled REAL .png header") {
    // The ubiquitous 1x1 RGBA PNG file prefix, byte-for-byte from the
    // public layout: signature, IHDR length 13, 'IHDR', width 1 BE,
    // height 1 BE, depth 8, color 6, the real CRC 1f15c489.
    val real = "89504e470d0a1a0a" + "0000000d" + "49484452" +
      "00000001" + "00000001" + "0806000000" + "1f15c489"
    val row = hexDf(real).select(
      Multimodal.pngMagic(col("p")), Multimodal.pngParseable(col("p")),
      Multimodal.pngWidth(col("p")), Multimodal.pngHeight(col("p"))).head
    assert(row.getBoolean(0) && row.getBoolean(1) &&
      row.getLong(2) == 1L && row.getLong(3) == 1L,
      s"real 1x1 PNG header must parse to (1, 1): $row")
    // and a non-trivial geometry: 640x480, hand-encoded BE
    val big = "89504e470d0a1a0a" + "0000000d" + "49484452" +
      "00000280" + "000001e0" + "0802000000"
    val r2 = hexDf(big).select(
      Multimodal.pngWidth(col("p")), Multimodal.pngHeight(col("p"))).head
    assert(r2.getLong(0) == 640L && r2.getLong(1) == 480L)
  }

  test("PNG dispatch: signature-only / wrong-chunk prefixes take the " +
      "opaque path") {
    // signature but truncated before the geometry
    val trunc = "89504e470d0a1a0a" + "0000000d" + "4948"
    assert(!hexDf(trunc).select(Multimodal.pngParseable(col("p"))).head
      .getBoolean(0), "truncated PNG must not be parseable")
    // signature + full length but the first chunk is NOT IHDR (a
    // corrupt writer): must take the opaque path, not read garbage
    val wrongChunk = "89504e470d0a1a0a" + "0000000d" + "69484452" +
      "00000280" + "000001e0" + "0802000000"
    assert(!hexDf(wrongChunk).select(Multimodal.pngParseable(col("p"))).head
      .getBoolean(0), "non-IHDR first chunk must not be parseable")
    // BMP magic is not PNG
    val bmp = "424d" + "4e000000" + "00000000" + "36000000" +
      "28000000" + "04000000" + "02000000"
    assert(!hexDf(bmp).select(Multimodal.pngMagic(col("p"))).head
      .getBoolean(0))
  }

  test("gifWidth/gifHeight read hand-assembled REAL GIF87a/89a headers") {
    // genuine 2x2 GIF89a logical screen descriptor: LE 0200 / 0200
    val g89 = "474946383961" + "0200" + "0200" + "f0" + "00" + "00"
    val row = hexDf(g89).select(
      Multimodal.gifMagic(col("p")), Multimodal.gifParseable(col("p")),
      Multimodal.gifWidth(col("p")), Multimodal.gifHeight(col("p"))).head
    assert(row.getBoolean(0) && row.getBoolean(1) &&
      row.getLong(2) == 2L && row.getLong(3) == 2L,
      s"real 2x2 GIF89a header must parse to (2, 2): $row")
    // GIF87a with 640x480: LE 8002 / e001
    val g87 = "474946383761" + "8002" + "e001" + "f7" + "00" + "00"
    val r2 = hexDf(g87).select(
      Multimodal.gifParseable(col("p")),
      Multimodal.gifWidth(col("p")), Multimodal.gifHeight(col("p"))).head
    assert(r2.getBoolean(0) && r2.getLong(1) == 640L && r2.getLong(2) == 480L)
    // 'GIF90a' is not a real version: magic must reject it
    val bad = "474946393061" + "8002" + "e001" + "f70000"
    assert(!hexDf(bad).select(Multimodal.gifMagic(col("p"))).head
      .getBoolean(0), "unknown GIF version must not be magic-matched")
  }

  test("pngHeaderHex / gifHeaderHex round-trip through BYTES") {
    import spark.implicits._
    val dims = Seq((1L, 1L), (16L, 496L), (640L, 480L), (655L, 495L))
    val got = dims.toDF("w", "h")
      .withColumn("pp", Multimodal.payloadHex(
        unhex(Multimodal.pngHeaderHex(col("w"), col("h")))))
      .withColumn("gp", Multimodal.payloadHex(
        unhex(Multimodal.gifHeaderHex(col("w"), col("h")))))
      .select(col("w"), col("h"),
        Multimodal.pngParseable(col("pp")).as("pok"),
        Multimodal.pngWidth(col("pp")).as("pw"),
        Multimodal.pngHeight(col("pp")).as("ph"),
        Multimodal.gifParseable(col("gp")).as("gok"),
        Multimodal.gifWidth(col("gp")).as("gw"),
        Multimodal.gifHeight(col("gp")).as("gh"))
      .collect()
    got.foreach { r =>
      assert(r.getBoolean(2) && r.getLong(3) == r.getLong(0) &&
        r.getLong(4) == r.getLong(1), s"png round-trip: $r")
      assert(r.getBoolean(5) && r.getLong(6) == r.getLong(0) &&
        r.getLong(7) == r.getLong(1), s"gif round-trip: $r")
    }
  }
}
