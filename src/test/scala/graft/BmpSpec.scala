package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BmpCodec

/** The real-format proof behind the multimodal decode seam (SURVEY.md
  * §8.3, VERDICT r08 ask #4): BmpCodec implements the PUBLIC 24-bit BMP
  * layout, so encode is pinned against hand-assembled golden file bytes
  * (not just its own decoder) and decode round-trips every stride-padding
  * class. Pure JVM — no SparkSession. */
class BmpSpec extends AnyFunSuite {

  test("encode matches the hand-assembled BMP file byte-for-byte (2x1)") {
    // w=2, h=1, logical RGB raster: px0=(1,2,3), px1=(4,5,6)
    // stride = 8 (6 pixel bytes + 2 pad), fileSize = 54 + 8 = 62
    val bytes = BmpCodec.encode(2, 1, Array[Byte](1, 2, 3, 4, 5, 6))
    val golden = Array(
      // file header: 'B' 'M', size 62 LE, reserved, pixel offset 54
      0x42, 0x4d, 0x3e, 0, 0, 0, 0, 0, 0, 0, 0x36, 0, 0, 0,
      // BITMAPINFOHEADER: size 40, w 2, h 1, planes 1, bpp 24,
      // compression 0, image size 8, 2835 ppm x/y, palette 0s
      0x28, 0, 0, 0, 2, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0x18, 0,
      0, 0, 0, 0, 8, 0, 0, 0, 0x13, 0x0b, 0, 0, 0x13, 0x0b, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0,
      // raster, single bottom-up row: BGR(px0) BGR(px1) + 2 pad bytes
      3, 2, 1, 6, 5, 4, 0, 0).map(_.toByte)
    assert(bytes.toSeq == golden.toSeq)
  }

  test("decode round-trips every stride-padding class and the bottom-up flip") {
    // widths 2..7 hit pads 2,3,0,1,2,3; heights up to 4 exercise the flip
    for (w <- 2 to 7; h <- 1 to 4) {
      val raster = Array.tabulate(3 * w * h)(p => ((p * 37 + w + h) % 256).toByte)
      val bmp = BmpCodec.decode(BmpCodec.encode(w, h, raster))
      assert(bmp.width == w && bmp.height == h && bmp.bpp == 24)
      assert(bmp.raster.toSeq == raster.toSeq, s"raster mismatch at $w x $h")
    }
  }

  test("decode is order-sensitive: a flipped file decodes to different bytes") {
    // two rows with distinct content: the bottom-up flip matters
    val raster = Array.tabulate(3 * 2 * 2)(p => p.toByte)
    val bytes = BmpCodec.encode(2, 2, raster)
    // swap the two raster rows in the FILE (stride 8, offset 54)
    val flipped = bytes.clone()
    for (i <- 0 until 8) {
      flipped(54 + i) = bytes(62 + i); flipped(62 + i) = bytes(54 + i)
    }
    assert(BmpCodec.decode(flipped).raster.toSeq != raster.toSeq)
  }

  test("decode fails loudly on non-BMP, wrong bpp, and truncation") {
    intercept[IllegalArgumentException](BmpCodec.decode(Array.fill[Byte](60)(0)))
    val ok = BmpCodec.encode(2, 1, Array[Byte](1, 2, 3, 4, 5, 6))
    val wrongBpp = ok.clone(); wrongBpp(28) = 32
    intercept[IllegalArgumentException](BmpCodec.decode(wrongBpp))
    intercept[IllegalArgumentException](BmpCodec.decode(ok.take(56)))
  }
}
