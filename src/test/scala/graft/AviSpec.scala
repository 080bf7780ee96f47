package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{AviCodec, JpegCodec}

/** AviCodec pins — the video leg of the decode seam (round 18): golden
  * container-byte checks against the hand-computed RIFF/AVI layout, the
  * demux round trip, a hand-ASSEMBLED container with junk/index chunks
  * spliced in (proving a real chunk walk, not fixed offsets), the MJPEG
  * composition with JpegCodec, and malformed-input raises. Pure JVM —
  * no SparkSession. */
class AviSpec extends AnyFunSuite {

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  private val f0 = Array[Byte](1, 2, 3, 4)
  private val f1 = Array[Byte](5, 6, 7) // odd length — exercises RIFF padding

  test("encode emits the golden RIFF/AVI layout (hand-computed offsets)") {
    val bytes = AviCodec.encode(8, 8, Seq(f0, f1), fps = 25)
    // RIFF header
    assert(tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "AVI ")
    assert(le32(bytes, 4) == bytes.length - 8, "riff size")
    // LIST hdrl at 12: avih chunk (8+56) + LIST strl (8+4+64+48)
    assert(tag(bytes, 12) == "LIST" && tag(bytes, 20) == "hdrl")
    assert(le32(bytes, 16) == 4 + 64 + 124, "hdrl list size")
    assert(tag(bytes, 24) == "avih" && le32(bytes, 28) == 56)
    assert(le32(bytes, 32) == 40000, "us per frame at 25 fps")
    assert(le32(bytes, 32 + 16) == 2, "total frames")
    assert(le32(bytes, 32 + 24) == 1, "stream count")
    assert(le32(bytes, 32 + 32) == 8 && le32(bytes, 32 + 36) == 8, "avih dims")
    // LIST strl at 88: strh 'vids'/'MJPG' + strf BITMAPINFOHEADER
    assert(tag(bytes, 88) == "LIST" && tag(bytes, 96) == "strl")
    assert(tag(bytes, 100) == "strh" && le32(bytes, 104) == 56)
    assert(tag(bytes, 108) == "vids" && tag(bytes, 112) == "MJPG")
    assert(le32(bytes, 108 + 20) == 1 && le32(bytes, 108 + 24) == 25, "scale/rate")
    assert(le32(bytes, 108 + 32) == 2, "strh length")
    assert(tag(bytes, 164) == "strf" && le32(bytes, 168) == 40)
    assert(le32(bytes, 172) == 40 && le32(bytes, 176) == 8 && le32(bytes, 180) == 8,
      "BITMAPINFOHEADER size/dims")
    assert(tag(bytes, 172 + 16) == "MJPG", "biCompression")
    // LIST movi at 212: 00dc(4B f0) + 00dc(3B f1 + 1 pad)
    assert(tag(bytes, 212) == "LIST" && tag(bytes, 220) == "movi")
    assert(le32(bytes, 216) == 4 + (8 + 4) + (8 + 4), "movi size incl. odd-frame pad")
    assert(tag(bytes, 224) == "00dc" && le32(bytes, 228) == 4)
    assert(bytes.slice(232, 236).toSeq == f0.toSeq)
    assert(tag(bytes, 236) == "00dc" && le32(bytes, 240) == 3, "declared size unpadded")
    assert(bytes.slice(244, 247).toSeq == f1.toSeq)
    assert(bytes(247) == 0, "RIFF pad byte after odd frame")
    assert(bytes.length == 248, "total container size")
  }

  test("demux round-trips frames, dims, and handles odd-length padding") {
    val frames = Seq(f0, f1, Array[Byte](9))
    val avi = AviCodec.decode(AviCodec.encode(320, 240, frames))
    assert(avi.width == 320 && avi.height == 240)
    assert(avi.frames.size == 3)
    frames.zip(avi.frames).foreach { case (in, out) =>
      assert(out.toSeq == in.toSeq, "frame bytes differ")
    }
  }

  test("demux WALKS chunks: JUNK / idx1 / LIST INFO splices still decode") {
    // hand-reassemble: take a canonical file and splice unknown chunks
    // between the top-level lists and inside movi — a fixed-offset
    // parser breaks on every one of these
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](8 + payload.length + (payload.length & 1))
      id.zipWithIndex.foreach { case (c, i) => out(i) = c.toByte }
      out(4) = (payload.length & 0xff).toByte
      out(5) = ((payload.length >> 8) & 0xff).toByte
      System.arraycopy(payload, 0, out, 8, payload.length)
      out
    }
    val clean = AviCodec.encode(8, 8, Seq(f0, f1))
    val hdrlLen = 8 + le32(clean, 16) // LIST header + size
    val hdrl = clean.slice(12, 12 + hdrlLen)
    val movi = clean.drop(12 + hdrlLen)
    // splice JUNK between hdrl and movi, idx1 after movi, and an INFO
    // list before hdrl
    val info = chunk("LIST", "INFO".getBytes("US-ASCII") ++ Array[Byte](1, 2))
    val junk = chunk("JUNK", Array[Byte](0, 0, 0, 0, 0))
    val idx1 = chunk("idx1", Array[Byte](1, 2, 3, 4))
    val body = info ++ hdrl ++ junk ++ movi ++ idx1
    val out = new Array[Byte](12 + body.length)
    "RIFF".zipWithIndex.foreach { case (c, i) => out(i) = c.toByte }
    out(4) = ((4 + body.length) & 0xff).toByte
    out(5) = (((4 + body.length) >> 8) & 0xff).toByte
    "AVI ".zipWithIndex.foreach { case (c, i) => out(8 + i) = c.toByte }
    System.arraycopy(body, 0, out, 12, body.length)
    val avi = AviCodec.decode(out)
    assert(avi.width == 8 && avi.frames.size == 2)
    assert(avi.frames(0).toSeq == f0.toSeq && avi.frames(1).toSeq == f1.toSeq)
  }

  test("MJPEG composition: demuxed frames JPEG-decode to the source rasters") {
    // the p_mm_framesample corpus discipline: 8x8 block-constant frames
    // at quality 1.0 round-trip bit-exact through container + codec
    val rasters = (0 until 4).map(k => Array.fill(64)(((37 + 41 * k) % 256).toByte))
    val bytes = AviCodec.encode(8, 8, rasters.map(JpegCodec.encodeGray(8, 8, _)))
    val avi = AviCodec.decode(bytes)
    assert(avi.frames.size == 4)
    rasters.zip(avi.frames).foreach { case (src, jpg) =>
      val g = JpegCodec.decodeGray(jpg)
      assert(g.width == 8 && g.height == 8)
      assert(g.raster.sameElements(src), "pixel drift through container+codec")
    }
  }

  test("malformed input raises rather than yielding garbage frames") {
    val good = AviCodec.encode(8, 8, Seq(f0))
    intercept[IllegalArgumentException](AviCodec.decode(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException] { // bad magic
      val b = good.clone(); b(9) = 'X'.toByte; AviCodec.decode(b)
    }
    intercept[IllegalArgumentException] { // truncated movi: declared size overruns
      AviCodec.decode(good.dropRight(8 + f0.length))
    }
    intercept[IllegalArgumentException] { // truncated mid-hdrl: chunk overrun
      AviCodec.decode(good.take(20))
    }
    intercept[IllegalArgumentException] { // avih declares 2 frames, movi holds 1
      val b = good.clone(); b(48) = 2 // dwTotalFrames patched (avih payload +16)
      AviCodec.decode(b)
    }
  }
}
