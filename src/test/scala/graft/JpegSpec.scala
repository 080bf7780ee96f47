package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.JpegCodec

/** JpegCodec pins (the lossy transform-format decode-seam proof,
  * VERDICT r15 item 4). Unlike BMP/PNG the format is lossy, so the pins
  * are split:
  *
  *   - the BLOCK-CONSTANT corpus discipline round-trips BIT-EXACT (the
  *     property the p_mm_jpeg_* oracles rely on);
  *   - a gradient (non-block-constant) image decodes within tight DCT
  *     tolerance — a raster approximation, NOT a byte replay;
  *   - a high-frequency image at LOW quality decodes with visible loss —
  *     a byte stub or a secret lossless path would return it exactly,
  *     so nonzero error here proves a genuine quantizing transform
  *     codec sits behind the seam;
  *   - the emitted container is a real JPEG stream (SOI/EOI markers,
  *     JFIF APP0) decodable by any conformant reader.
  */
class JpegSpec extends AnyFunSuite {

  private def blockRaster(id: Long, w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h) { p =>
      ((id + 17 * ((p % w) / 8) + 31 * ((p / w) / 8)) % 256).toByte
    }

  test("emitted bytes are a real JPEG stream (SOI, JFIF APP0, EOI)") {
    val bytes = JpegCodec.encodeGray(16, 8, blockRaster(3L, 16, 8))
    assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8, "missing SOI")
    assert((bytes(2) & 0xff) == 0xff && (bytes(3) & 0xff) == 0xe0, "missing APP0")
    assert(new String(bytes.slice(6, 10), "US-ASCII") == "JFIF", "missing JFIF id")
    val n = bytes.length
    assert((bytes(n - 2) & 0xff) == 0xff && (bytes(n - 1) & 0xff) == 0xd9, "missing EOI")
  }

  test("block-constant corpus round-trips bit-exact at quality 1.0") {
    // the exactness the p_mm_jpeg_decode / p_mm_jpeg_resize oracles
    // stand on: DC-only blocks + unit quant tables — checked across
    // every (dims, id-phase) combination the corpus generates
    for (id <- 0L until 24L) {
      val w = 8 * (1 + id % 3).toInt
      val h = 8 * (1 + id % 2).toInt
      val raster = blockRaster(id, w, h)
      val g = JpegCodec.decodeGray(JpegCodec.encodeGray(w, h, raster))
      assert(g.width == w && g.height == h, s"id=$id dims ${g.width}x${g.height}")
      assert(g.raster.sameElements(raster), s"id=$id: block-constant not exact")
    }
  }

  test("gradient decodes within DCT tolerance (approximation, not replay)") {
    val (w, h) = (16, 16)
    val raster = Array.tabulate(w * h)(p => ((p % w) * 3 + (p / w) * 5).toByte)
    val g = JpegCodec.decodeGray(JpegCodec.encodeGray(w, h, raster))
    val maxErr = raster.indices.map(i => math.abs((g.raster(i) & 0xff) - (raster(i) & 0xff))).max
    assert(maxErr <= 6, s"gradient max pixel error $maxErr — decoder off the DCT path")
  }

  test("high-frequency image at low quality loses information (genuinely lossy)") {
    val (w, h) = (16, 16)
    val raster = Array.tabulate(w * h)(p => if ((p % w + p / w) % 2 == 0) 0.toByte else 255.toByte)
    // encode at low quality via the raw ImageIO path the codec wraps
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, raster(y * w + x) & 0xff)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(0.3f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios); writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose(); ios.close()
    val g = JpegCodec.decodeGray(bos.toByteArray)
    val totErr = raster.indices.map(i => math.abs((g.raster(i) & 0xff) - (raster(i) & 0xff))).sum
    assert(totErr > 0, "checkerboard at quality 0.3 decoded exactly — not a real lossy codec")
  }

  test("halveGray is the exact 2x2 integer box mean") {
    // hand raster: 4x2, means computed by hand
    val g = JpegCodec.Gray(4, 2, Array[Byte](10, 20, 30, 40, 50, 60, 70, 80))
    val t = JpegCodec.halveGray(g)
    assert(t.width == 2 && t.height == 1)
    assert(t.raster.toSeq == Seq((10 + 20 + 50 + 60) / 4, (30 + 40 + 70 + 80) / 4).map(_.toByte))
  }

  private def tileRaster(id: Long, w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h) { p =>
      ((id + 17 * ((p % w) / 16) + 31 * ((p / w) / 16)) % 256).toByte
    }

  test("16x16-tile corpus survives decode -> halve -> re-encode -> decode bit-exact") {
    // the p_mm_resize closure (round 17): a 16x16 tile is four aligned
    // constant 8x8 blocks, so the SOURCE encode is DC-only, the box-mean
    // halving maps tiles to 8x8 blocks exactly, and the THUMB re-encode
    // is DC-only again — both lossy stages are bit-exact, across every
    // (dims, id-phase) combination the corpus generates
    for (id <- 0L until 24L) {
      val w = 16 * (1 + id % 3).toInt
      val h = 16 * (1 + id % 2).toInt
      val src = tileRaster(id, w, h)
      val g = JpegCodec.decodeGray(JpegCodec.encodeGray(w, h, src))
      assert(g.raster.sameElements(src), s"id=$id: source round-trip not exact")
      val half = JpegCodec.halveGray(g)
      val rt = JpegCodec.decodeGray(
        JpegCodec.encodeGray(half.width, half.height, half.raster))
      assert(rt.width == w / 2 && rt.height == h / 2, s"id=$id thumb dims")
      assert(rt.raster.sameElements(half.raster), s"id=$id: thumb round-trip not exact")
    }
  }

  /** Runs p_mm_metadata's actual codegen'd SOF locator + field parse on
    * a hex stream, returning (sofPos, precision, height, width). */
  private def sqlSofParse(hx: String): (Long, Long, Long, Long) = {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val r = Seq(hx).toDF("hx")
      .select(org.apache.spark.sql.functions.expr(
        graft.operators.MultimodalOps.jpegSofPos).as("sof"),
        org.apache.spark.sql.functions.col("hx"))
      .selectExpr("cast(sof as bigint) as sof",
        "cast(conv(substring(hx, sof + 8, 2), 16, 10) as bigint) as precision",
        "cast(conv(substring(hx, sof + 10, 4), 16, 10) as bigint) as height",
        "cast(conv(substring(hx, sof + 14, 4), 16, 10) as bigint) as width")
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  test("segment-walk SOF parse matches the decoder's dims across the corpus") {
    // pins p_mm_metadata's codegen'd parse (round 18: a marker-segment
    // walk, no longer first-FFC0): precision at +8, height at +10,
    // width at +14 (1-based hex offsets from the located marker)
    for (id <- 0L until 24L) {
      val w = 8 * (1 + id % 3).toInt
      val h = 8 * (1 + id % 2).toInt
      val bytes = JpegCodec.encodeGray(w, h, blockRaster(id, w, h))
      val hx = bytes.map(b => f"${b & 0xff}%02X").mkString
      val (sof, prec, ph, pw) = sqlSofParse(hx)
      // on this clean corpus the walk and the naive first-FFC0 scan agree
      assert(sof == hx.indexOf("FFC0") + 1, s"id=$id walk position")
      assert(prec == 8, s"id=$id precision")
      assert(ph == h, s"id=$id height")
      assert(pw == w, s"id=$id width")
      assert(hx.substring(12, 22) == "4A46494600", s"id=$id JFIF signature")
    }
  }

  private def seg(marker: Int, payload: Array[Byte]): Array[Byte] =
    Array(0xff.toByte, marker.toByte,
      (((payload.length + 2) >> 8) & 0xff).toByte,
      ((payload.length + 2) & 0xff).toByte) ++ payload

  test("segment walk survives an FFC0 byte pair inside a COM/DQT payload") {
    // the adversarial fixture VERDICT r17 item 2 asks for: a comment
    // segment and a DQT payload each carrying the literal FF C0 byte
    // pair BEFORE the real frame header — a first-FFC0 scan mis-locates
    // here; the length-hopping walk must not
    val sofPayload = Array[Byte](8, 0, 24, 0, 40, 1, 0x11, 0) // prec 8, 24x40, 1 comp
    val bytes =
      Array(0xff.toByte, 0xd8.toByte) ++                      // SOI
        seg(0xfe, Array(0x68, 0x69, 0xff.toByte, 0xc0.toByte)) ++ // COM "hi" + FFC0
        seg(0xdb, Array[Byte](0, 0xff.toByte, 0xc0.toByte, 1, 1)) ++ // DQT-ish + FFC0
        seg(0xc0, sofPayload)                                 // the real SOF0
    val hx = bytes.map(b => f"${b & 0xff}%02X").mkString
    val naive = hx.indexOf("FFC0") + 1
    val (sof, prec, ph, pw) = sqlSofParse(hx)
    assert(naive < sof, "fixture must place a decoy FFC0 before the real SOF")
    // SOF segment = marker(4 hex) + length(4 hex) + payload(2·|payload| hex)
    assert(sof == hx.length - 2 * sofPayload.length - 8 + 1, "walk landed off the SOF marker")
    assert(prec == 8 && ph == 24 && pw == 40,
      s"walk parse got ${pw}x$ph precision $prec — decoy FFC0 won")
  }

  test("segment walk finds SOF1/SOF2 (extended-sequential / progressive) too") {
    for (m <- Seq(0xc1, 0xc2)) {
      val sofPayload = Array[Byte](8, 0, 16, 0, 32, 1, 0x11, 0)
      val bytes = Array(0xff.toByte, 0xd8.toByte) ++
        seg(0xfe, Array(0xff.toByte, 0xc0.toByte)) ++ seg(m, sofPayload)
      val hx = bytes.map(b => f"${b & 0xff}%02X").mkString
      val (_, prec, ph, pw) = sqlSofParse(hx)
      assert(prec == 8 && ph == 16 && pw == 32, f"marker FF$m%02X not located")
    }
  }

  test("segment walk on markerless input yields NULL, not a garbage read") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    // SOI + one COM segment, then the stream ends without any SOF
    val bytes = Array(0xff.toByte, 0xd8.toByte) ++ seg(0xfe, Array[Byte](1, 2))
    val hx = bytes.map(b => f"${b & 0xff}%02X").mkString
    val r = Seq(hx).toDF("hx")
      .selectExpr(s"(${graft.operators.MultimodalOps.jpegSofPos}) as sof")
      .collect().head
    assert(r.isNullAt(0), s"expected NULL sof on markerless input, got ${r.get(0)}")
  }
}
