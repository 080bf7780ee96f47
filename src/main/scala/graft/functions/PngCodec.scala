package graft.functions

import java.util.zip.{CRC32, Deflater, Inflater}

/** Real pure-JVM PNG encode/decode — the COMPRESSED-format proof of the
  * multimodal decode seam (SURVEY.md §8.3; round 9's BmpCodec proved it
  * for uncompressed rasters, this proves it where decode cost dominates
  * scan cost, which is the realistic 100 TB case). Zero new
  * dependencies: the deflate/inflate kernel is `java.util.zip`, the
  * file layout below is the public PNG specification, not any library.
  *
  * The on-disk layout this codec implements:
  *   - 8-byte signature 137 80 78 71 13 10 26 10;
  *   - chunks: length (BE u32), 4-char type, data, CRC32 (BE u32 over
  *     type+data);
  *   - IHDR (13 bytes): width/height (BE u32), bit depth 8, color type
  *     2 (truecolor RGB), compression 0, filter 0, interlace 0;
  *   - IDAT: one zlib stream of filtered scanlines — each row prefixed
  *     by a filter-type byte (0 None, 1 Sub, 2 Up, 3 Average, 4 Paeth),
  *     filters computed on the RECONSTRUCTED bytes of the left/up/
  *     up-left neighbors at 3-byte pixel stride;
  *   - IEND: empty. Ancillary chunks are CRC-checked and skipped.
  *
  * [[encode]] cycles the filter type per row (`y mod 5`), so a decoder
  * bug in ANY of the five defilter paths breaks the round-trip on
  * images of height ≥ 5 — the defiltering is load-bearing, not
  * decorative. [[decode]] returns the raster in LOGICAL order
  * (row-major top-down, R,G,B — the same contract as BmpCodec), fails
  * loudly on anything unsupported (a decode seam must never return
  * garbage), and accepts any spec-valid zlib stream — PngSpec feeds it
  * a hand-assembled STORED-block file the encoder cannot produce.
  */
object PngCodec {

  final case class Png(width: Int, height: Int,
      /** Row-major top-down R,G,B bytes, length = 3·width·height. */
      raster: Array[Byte])

  private val SIG: Array[Byte] =
    Array(137, 80, 78, 71, 13, 10, 26, 10).map(_.toByte)

  private def putBE32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = ((v >>> 24) & 0xff).toByte
    b(off + 1) = ((v >>> 16) & 0xff).toByte
    b(off + 2) = ((v >>> 8) & 0xff).toByte
    b(off + 3) = (v & 0xff).toByte
  }
  private def getBE32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def chunk(tpe: String, data: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](12 + data.length)
    putBE32(out, 0, data.length)
    System.arraycopy(tpe.getBytes("US-ASCII"), 0, out, 4, 4)
    System.arraycopy(data, 0, out, 8, data.length)
    val crc = new CRC32
    crc.update(out, 4, 4 + data.length)
    putBE32(out, 8 + data.length, crc.getValue.toInt)
    out
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode a logical raster (top-down, RGB) as an 8-bit truecolor PNG,
    * cycling the scanline filter type per row (`y mod 5`). */
  def encode(width: Int, height: Int, raster: Array[Byte]): Array[Byte] = {
    require(raster.length == 3 * width * height, "raster size mismatch")
    val bpl = 3 * width
    val filtered = new Array[Byte]((bpl + 1) * height)
    var y = 0
    while (y < height) {
      val ft = y % 5
      filtered(y * (bpl + 1)) = ft.toByte
      var i = 0
      while (i < bpl) {
        val x = raster(y * bpl + i) & 0xff
        val a = if (i >= 3) raster(y * bpl + i - 3) & 0xff else 0
        val b = if (y > 0) raster((y - 1) * bpl + i) & 0xff else 0
        val c = if (y > 0 && i >= 3) raster((y - 1) * bpl + i - 3) & 0xff else 0
        val f = ft match {
          case 0 => x
          case 1 => x - a
          case 2 => x - b
          case 3 => x - (a + b) / 2
          case _ => x - paeth(a, b, c)
        }
        filtered(y * (bpl + 1) + 1 + i) = (f & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val d = new Deflater() // default = zlib wrapper, as IDAT requires
    d.setInput(filtered); d.finish()
    val bos = new java.io.ByteArrayOutputStream
    val buf = new Array[Byte](8192)
    while (!d.finished()) {
      val n = d.deflate(buf)
      bos.write(buf, 0, n)
    }
    d.end()
    val ihdr = new Array[Byte](13)
    putBE32(ihdr, 0, width); putBE32(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: truecolor RGB
    SIG ++ chunk("IHDR", ihdr) ++ chunk("IDAT", bos.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Parse an 8-bit truecolor non-interlaced PNG; throws on anything
    * else — including a CRC mismatch on ANY chunk and a short or
    * over-long IDAT stream. */
  def decode(bytes: Array[Byte]): Png = {
    require(bytes.length >= 8 && (0 until 8).forall(i => bytes(i) == SIG(i)),
      "missing PNG signature")
    var off = 8
    var width = -1; var height = -1
    val idat = new java.io.ByteArrayOutputStream
    var done = false
    while (!done) {
      require(off + 8 <= bytes.length, "truncated chunk header")
      val len = getBE32(bytes, off)
      require(len >= 0 && off + 12 + len <= bytes.length, "truncated chunk")
      val tpe = new String(bytes, off + 4, 4, "US-ASCII")
      val crc = new CRC32
      crc.update(bytes, off + 4, 4 + len)
      require(crc.getValue.toInt == getBE32(bytes, off + 8 + len),
        s"bad CRC in $tpe chunk")
      tpe match {
        case "IHDR" =>
          width = getBE32(bytes, off + 8)
          height = getBE32(bytes, off + 12)
          val depth = bytes(off + 16) & 0xff
          val color = bytes(off + 17) & 0xff
          val interlace = bytes(off + 20) & 0xff
          require(depth == 8 && color == 2,
            s"unsupported depth/color $depth/$color (8-bit truecolor only)")
          require(interlace == 0, "interlaced PNG unsupported")
        case "IDAT" => idat.write(bytes, off + 8, len)
        case "IEND" => done = true
        case _      => () // ancillary chunk: CRC-checked above, skipped
      }
      off += 12 + len
    }
    require(width > 0 && height > 0, "missing or empty IHDR")
    val bpl = 3 * width
    val filtered = new Array[Byte]((bpl + 1) * height)
    val inf = new Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    while (got < filtered.length && !inf.finished()) {
      val n = inf.inflate(filtered, got, filtered.length - got)
      if (n == 0 && inf.needsInput())
        throw new IllegalArgumentException("truncated IDAT stream")
      got += n
    }
    require(got == filtered.length, s"short IDAT: $got of ${filtered.length}")
    // the loop exits on `got == filtered.length` without draining the
    // stream — probe one extra byte so trailing compressed data beyond
    // the expected raster fails loudly (the documented contract)
    if (!inf.finished()) {
      val extra = inf.inflate(new Array[Byte](1), 0, 1)
      require(extra == 0 && inf.finished(),
        "over-long IDAT stream: compressed data beyond the raster")
    }
    require(inf.getRemaining == 0,
      "over-long IDAT stream: trailing bytes after the deflate stream")
    inf.end()
    val raster = new Array[Byte](bpl * height)
    var y = 0
    while (y < height) {
      val ft = filtered(y * (bpl + 1)) & 0xff
      require(ft <= 4, s"unknown scanline filter $ft")
      var i = 0
      while (i < bpl) {
        val x = filtered(y * (bpl + 1) + 1 + i) & 0xff
        val a = if (i >= 3) raster(y * bpl + i - 3) & 0xff else 0
        val b = if (y > 0) raster((y - 1) * bpl + i) & 0xff else 0
        val c = if (y > 0 && i >= 3) raster((y - 1) * bpl + i - 3) & 0xff else 0
        val r = ft match {
          case 0 => x
          case 1 => x + a
          case 2 => x + b
          case 3 => x + (a + b) / 2
          case _ => x + paeth(a, b, c)
        }
        raster(y * bpl + i) = (r & 0xff).toByte
        i += 1
      }
      y += 1
    }
    Png(width, height, raster)
  }
}
