package graft.functions

/** Real pure-JVM BMP (Windows bitmap) encode/decode — the proof that the
  * multimodal decode seam is genuine, not a claim (SURVEY.md §8.3; the
  * container ships no image codecs, so the format chosen is one a ~60-line
  * parser covers completely: 24-bit uncompressed BITMAPINFOHEADER).
  *
  * The BMP on-disk layout this codec implements (the public file-format
  * spec, not any library):
  *   - 14-byte file header: 'B' 'M', file size (LE u32), 2×u16 reserved,
  *     pixel-array offset (LE u32, here always 54);
  *   - 40-byte BITMAPINFOHEADER: header size 40, width (LE i32), height
  *     (LE i32 — POSITIVE means the raster is stored BOTTOM-UP), planes 1,
  *     bits-per-pixel 24, compression 0 (BI_RGB), image size, resolution,
  *     palette fields 0;
  *   - raster: rows bottom-up, pixels left-to-right, channels B,G,R,
  *     each row zero-padded to a 4-byte stride.
  *
  * [[decode]] undoes all three layout quirks (bottom-up flip, BGR→RGB,
  * stride padding) and returns the raster in LOGICAL order: row-major
  * top-down, channels R,G,B — so decode(encode(px)) == px byte-for-byte,
  * which MultimodalOps' oracle checks against a position-weighted
  * checksum (order-sensitive: a missed flip or channel swap cannot pass).
  */
object BmpCodec {

  final case class Bmp(width: Int, height: Int, bpp: Int,
      /** Row-major top-down R,G,B bytes, length = 3·width·height. */
      raster: Array[Byte])

  private def putLE32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }
  private def getLE32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def getLE16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def stride(width: Int): Int = ((3 * width + 3) / 4) * 4

  /** Encode a logical raster (top-down, RGB) as a 24-bit BMP file. */
  def encode(width: Int, height: Int, raster: Array[Byte]): Array[Byte] = {
    require(raster.length == 3 * width * height, "raster size mismatch")
    val rs = stride(width)
    val fileSize = 54 + rs * height
    val out = new Array[Byte](fileSize)
    out(0) = 'B'; out(1) = 'M'
    putLE32(out, 2, fileSize)
    putLE32(out, 10, 54)
    putLE32(out, 14, 40)
    putLE32(out, 18, width)
    putLE32(out, 22, height) // positive: bottom-up raster
    out(26) = 1 // planes
    out(28) = 24 // bpp
    putLE32(out, 34, rs * height)
    putLE32(out, 38, 2835); putLE32(out, 42, 2835) // 72 dpi
    var y = 0
    while (y < height) {
      val rowOff = 54 + (height - 1 - y) * rs // logical row y stores bottom-up
      var x = 0
      while (x < width) {
        val p = 3 * (y * width + x)
        out(rowOff + 3 * x) = raster(p + 2)     // B
        out(rowOff + 3 * x + 1) = raster(p + 1) // G
        out(rowOff + 3 * x + 2) = raster(p)     // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Parse a 24-bit uncompressed BMP; throws on anything else (a decode
    * seam must fail loudly on unsupported input, never return garbage). */
  def decode(bytes: Array[Byte]): Bmp = {
    require(bytes.length >= 54, s"truncated BMP: ${bytes.length} bytes")
    require(bytes(0) == 'B' && bytes(1) == 'M', "missing BM signature")
    val off = getLE32(bytes, 10)
    val width = getLE32(bytes, 18)
    val height = getLE32(bytes, 22)
    val bpp = getLE16(bytes, 28)
    val compression = getLE32(bytes, 30)
    require(width > 0 && height > 0, s"unsupported dimensions $width x $height")
    require(bpp == 24, s"unsupported bpp $bpp (24-bit only)")
    require(compression == 0, s"unsupported compression $compression (BI_RGB only)")
    val rs = stride(width)
    require(bytes.length >= off + rs * height, "truncated raster")
    val raster = new Array[Byte](3 * width * height)
    var y = 0
    while (y < height) {
      val rowOff = off + (height - 1 - y) * rs
      var x = 0
      while (x < width) {
        val p = 3 * (y * width + x)
        raster(p) = bytes(rowOff + 3 * x + 2)     // R
        raster(p + 1) = bytes(rowOff + 3 * x + 1) // G
        raster(p + 2) = bytes(rowOff + 3 * x)     // B
        x += 1
      }
      y += 1
    }
    Bmp(width, height, bpp, raster)
  }
}
