package graft.functions

/** Real pure-JVM AVI (RIFF) MJPEG container encode/demux — the VIDEO leg
  * of the multimodal decode seam (VERDICT r17 item 3: the one remaining
  * stub op was video frame sampling, and an in-JDK path exists because
  * AVI is RIFF — the chunk-walk discipline [[WavCodec]] already proves —
  * and MJPEG frames are whole JPEG files, which [[JpegCodec]] already
  * decodes). No new dependencies: this is ~160 lines of the public
  * RIFF/AVI layout (the Microsoft "AVI RIFF File Reference" format,
  * implemented from the byte layout, not from any library).
  *
  * On-disk layout this codec implements:
  *   - 12-byte RIFF header: 'RIFF', riff size (LE u32 = file − 8), 'AVI ';
  *   - LIST 'hdrl':
  *       - 'avih' main header (56 B): µs/frame, max bytes/s, padding,
  *         flags, TOTAL FRAMES, initial frames, stream count, suggested
  *         buffer, WIDTH, HEIGHT, 4 reserved words;
  *       - LIST 'strl': 'strh' stream header (56 B, fccType 'vids',
  *         handler 'MJPG', scale/rate = frames-per-second as a
  *         rational, length = frame count) + 'strf' BITMAPINFOHEADER
  *         (40 B, biCompression 'MJPG');
  *   - LIST 'movi': one '00dc' (stream-0 compressed video) chunk per
  *     frame, each payload an ENTIRE JPEG file, RIFF-padded to even;
  *   - no 'idx1' index (optional in the spec; players rebuild it).
  *
  * [[decode]] WALKS the chunk lists like WavCodec does (hdrl/movi at any
  * position, unknown chunks — 'JUNK', 'idx1', LIST 'INFO' — skipped by
  * their declared size, both at top level and INSIDE movi), so a file
  * with injected padding still demuxes. Strict checks: magics, stream-0
  * video chunk ids, declared-vs-walked frame count, chunk overruns —
  * malformed input raises rather than yielding garbage frames. Frame
  * payloads are returned as opaque JPEG byte arrays: pixel decode is the
  * caller's composition with [[JpegCodec.decodeGray]], keeping demux
  * (container walk, cheap) separable from decode (DCT, expensive) the
  * way a 100 TB video pipeline wants — sample frames first, decode only
  * the sampled ones. */
object AviCodec {

  final case class Avi(width: Int, height: Int,
      /** One element per frame, each an entire JPEG file. */
      frames: Vector[Array[Byte]])

  private def putLE32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }
  private def putLE16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putTag(b: Array[Byte], off: Int, t: String): Unit = {
    var i = 0
    while (i < 4) { b(off + i) = t.charAt(i).toByte; i += 1 }
  }
  private def getLE32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Encode MJPEG frames (each an entire JPEG file) as a canonical AVI
    * container at a nominal `fps` (metadata only — no timing payload). */
  def encode(width: Int, height: Int, frames: Seq[Array[Byte]],
      fps: Int = 25): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(fps > 0, s"bad fps $fps")
    val avih = new Array[Byte](56)
    putLE32(avih, 0, 1000000 / fps) // dwMicroSecPerFrame
    putLE32(avih, 16, frames.size) // dwTotalFrames
    putLE32(avih, 24, 1) // dwStreams
    putLE32(avih, 32, width)
    putLE32(avih, 36, height)
    val strh = new Array[Byte](56)
    putTag(strh, 0, "vids")
    putTag(strh, 4, "MJPG")
    putLE32(strh, 20, 1) // dwScale
    putLE32(strh, 24, fps) // dwRate (rate/scale = fps)
    putLE32(strh, 32, frames.size) // dwLength
    putLE16(strh, 48, width.toShort) // rcFrame right
    putLE16(strh, 50, height.toShort) // rcFrame bottom
    val strf = new Array[Byte](40) // BITMAPINFOHEADER
    putLE32(strf, 0, 40) // biSize
    putLE32(strf, 4, width)
    putLE32(strf, 8, height)
    putLE16(strf, 12, 1) // biPlanes
    putLE16(strf, 14, 24) // biBitCount
    putTag(strf, 16, "MJPG") // biCompression
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val padded = payload.length + (payload.length & 1)
      val out = new Array[Byte](8 + padded)
      putTag(out, 0, id)
      putLE32(out, 4, payload.length)
      System.arraycopy(payload, 0, out, 8, payload.length)
      out
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](12 + body.length)
      putTag(out, 0, "LIST")
      putLE32(out, 4, 4 + body.length)
      putTag(out, 8, listType)
      System.arraycopy(body, 0, out, 12, body.length)
      out
    }
    val strl = list("strl", chunk("strh", strh) ++ chunk("strf", strf))
    val hdrl = list("hdrl", chunk("avih", avih) ++ strl)
    val movi = list("movi", frames.toArray.flatMap(f => chunk("00dc", f)))
    val body = hdrl ++ movi
    val out = new Array[Byte](12 + body.length)
    putTag(out, 0, "RIFF")
    putLE32(out, 4, 4 + body.length)
    putTag(out, 8, "AVI ")
    System.arraycopy(body, 0, out, 12, body.length)
    out
  }

  /** Demux an AVI container: chunk-walk to the hdrl main header (dims +
    * declared frame count) and the movi list (frame payloads), skipping
    * unknown chunks by declared size. decode(encode(x)).frames == x. */
  def decode(bytes: Array[Byte]): Avi = {
    require(bytes.length >= 12, s"truncated AVI: ${bytes.length} bytes")
    require(tag(bytes, 0) == "RIFF", "bad RIFF magic")
    require(tag(bytes, 8) == "AVI ", "bad AVI magic")
    val riffEnd = math.min(bytes.length.toLong, 12L + getLE32(bytes, 4) - 4)
    var width = -1; var height = -1; var declared = -1
    val frames = Vector.newBuilder[Array[Byte]]
    var nFrames = 0
    var off = 12
    while (off + 8 <= riffEnd) {
      val id = tag(bytes, off)
      val sz = getLE32(bytes, off + 4)
      require(sz >= 0 && off.toLong + 8L + sz <= bytes.length,
        s"chunk $id overruns the file (size $sz at offset $off)")
      if (id == "LIST") {
        require(sz >= 4, s"LIST chunk too small: $sz")
        tag(bytes, off + 8) match {
          case "hdrl" =>
            // inner walk of the header list for the 'avih' main header
            var in = off + 12
            val end = off + 8 + sz
            while (in + 8 <= end && width < 0) {
              val iid = tag(bytes, in)
              val isz = getLE32(bytes, in + 4)
              require(isz >= 0 && in.toLong + 8L + isz <= bytes.length,
                s"chunk $iid overruns the hdrl list (size $isz at offset $in)")
              if (iid == "avih") {
                require(isz >= 40, s"avih too small: $isz")
                declared = getLE32(bytes, in + 8 + 16)
                width = getLE32(bytes, in + 8 + 32)
                height = getLE32(bytes, in + 8 + 36)
              }
              in += 8 + isz + (isz & 1)
            }
          case "movi" =>
            // inner walk of the frame list: stream-0 compressed video
            // chunks are the frames; rec LISTs / padding are skipped
            var in = off + 12
            val end = off + 8 + sz
            while (in + 8 <= end) {
              val iid = tag(bytes, in)
              val isz = getLE32(bytes, in + 4)
              require(isz >= 0 && in.toLong + 8L + isz <= bytes.length,
                s"chunk $iid overruns the movi list (size $isz at offset $in)")
              if (iid == "00dc") {
                frames += java.util.Arrays.copyOfRange(bytes, in + 8, in + 8 + isz)
                nFrames += 1
              }
              in += 8 + isz + (isz & 1)
            }
          case _ => () // LIST INFO / rec — skip whole list
        }
      }
      // JUNK / idx1 / unknown top-level chunks — skip by declared size
      off += 8 + sz + (sz & 1)
    }
    require(width > 0 && height > 0, "no avih main header")
    require(declared == nFrames,
      s"avih declares $declared frames but movi holds $nFrames")
    Avi(width, height, frames.result())
  }
}
