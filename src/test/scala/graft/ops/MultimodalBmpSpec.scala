package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** The BMP header decode: real-layout parse (magic + LE offsets), pinned
  * against a hand-assembled GENUINE .bmp header, round-tripped through
  * actual bytes, and dispatch-pinned (only 'BM' payloads take the
  * parsed path). */
class MultimodalBmpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bmpWidth/bmpHeight read a hand-assembled REAL .bmp header") {
    import spark.implicits._
    // A genuine 4x2 24bpp BMP file prefix, assembled byte-for-byte from
    // the public layout: BM, size 54+4*2*3=78=0x4E, reserved, offset 54,
    // DIB 40, width 4, height 2 — NOT produced by bmpHeaderHex, so the
    // writer can't mask a reader bug.
    val real = "424d" + "4e000000" + "00000000" + "36000000" +
      "28000000" + "04000000" + "02000000"
    val df = Seq(real).toDF("hx")
      .select(Multimodal.payloadHex(unhex(col("hx"))).as("p"))
    val row = df.select(
      Multimodal.bmpMagic(col("p")), Multimodal.bmpWidth(col("p")),
      Multimodal.bmpHeight(col("p"))).head
    assert(row.getBoolean(0) && row.getLong(1) == 4L && row.getLong(2) == 2L,
      s"real BMP header must parse to (4, 2): $row")
  }

  test("a TOP-DOWN BMP (negative int32 height) parses as |height|") {
    import spark.implicits._
    // Genuine top-down 4x2 header: height field = -2 (0xFFFFFFFE LE) —
    // the BITMAPINFOHEADER geometry is SIGNED int32, so an unsigned
    // read would decode ~4.29e9 and corrupt every band downstream.
    val topDown = "424d" + "4e000000" + "00000000" + "36000000" +
      "28000000" + "04000000" + "feffffff"
    val df = Seq(topDown).toDF("hx")
      .select(Multimodal.payloadHex(unhex(col("hx"))).as("p"))
    val row = df.select(
      Multimodal.bmpParseable(col("p")), Multimodal.bmpWidth(col("p")),
      Multimodal.bmpHeight(col("p")),
      Multimodal.leI32(col("p"), 22)).head
    assert(row.getBoolean(0) && row.getLong(1) == 4L && row.getLong(2) == 2L,
      s"top-down BMP must parse to (4, |−2| = 2): $row")
    assert(row.getLong(3) == -2L,
      s"the raw signed field must sign-extend to −2: ${row.getLong(3)}")
  }

  test("bmpHeaderHex round-trips through BYTES for arbitrary geometry") {
    import spark.implicits._
    val dims = Seq((1L, 1L), (16L, 496L), (640L, 480L), (655L, 495L),
      (65535L, 1L), (12345L, 54321L))
    val got = dims.toDF("w", "h")
      .withColumn("p", Multimodal.payloadHex(
        unhex(Multimodal.bmpHeaderHex(col("w"), col("h")))))
      .select(col("w"), col("h"), Multimodal.bmpMagic(col("p")).as("m"),
        Multimodal.bmpWidth(col("p")).as("pw"),
        Multimodal.bmpHeight(col("p")).as("ph"))
      .collect()
    got.foreach { r =>
      assert(r.getAs[Boolean]("m") &&
        r.getAs[Long]("pw") == r.getAs[Long]("w") &&
        r.getAs[Long]("ph") == r.getAs[Long]("h"),
        s"write→bytes→parse must be the identity: $r")
    }
  }

  test("decode dispatch: only 'BM' magic takes the parsed path") {
    import spark.implicits._
    // jpeg-like (FFD8), png-like (89504E47), and a BM payload
    val payloads = Seq("ffd8ffe0" + "00" * 22, "89504e47" + "00" * 22)
    val df = payloads.toDF("hx")
      .select(Multimodal.payloadHex(unhex(col("hx"))).as("p"))
    assert(df.where(Multimodal.bmpMagic(col("p"))).count() == 0,
      "foreign magics must never reach the BMP parser")
    // a TRUNCATED file that kept its magic (header cut before the
    // geometry fields) must take the opaque path, never emit NULL dims
    val cut = Seq("424d4e0000").toDF("hx")
      .select(Multimodal.payloadHex(unhex(col("hx"))).as("p"))
    val cutRow = cut.select(Multimodal.bmpMagic(col("p")),
      Multimodal.bmpParseable(col("p"))).head
    assert(cutRow.getBoolean(0) && !cutRow.getBoolean(1),
      "magic present but header short: parseable must be false")
    // registry dispatch: every parsed doc in mm_resolution_bands_bmp is
    // an image-class doc, and at least one of each path exists
    val bands = graft.SparkEntry.queries("mm_resolution_bands_bmp")(
      spark, TestSpark.sf).collect()
    val parsed = bands.map(_.getAs[Long]("n_parsed")).sum
    val total = bands.map(_.getAs[Long]("n_docs")).sum
    val imgDocs = graft.sources.Tables.documents(spark, TestSpark.sf)
      .where(substring(col("text"), 1, 1).between("a", "f")).count()
    assert(parsed == imgDocs, s"parsed=$parsed must equal image-class docs=$imgDocs")
    assert(parsed > 0 && parsed < total,
      s"both decode paths must be exercised: $parsed of $total")
  }
}
