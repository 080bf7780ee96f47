package graft.functions

/** Real pure-JVM WAV (RIFF PCM) encode/decode — the AUDIO leg of the
  * multimodal decode seam, completing the format proofs (BMP proved
  * uncompressed rasters, PNG proved compressed ones; WAV proves the
  * audio container whose chunked layout every real audio pipeline
  * walks). The container ships no audio codecs, so the format chosen is
  * one a ~70-line parser covers completely: 16-bit little-endian
  * integer PCM inside a canonical RIFF/WAVE chunk list.
  *
  * The WAV on-disk layout this codec implements (the public RIFF spec,
  * not any library):
  *   - 12-byte RIFF header: 'RIFF', riff size (LE u32 = file − 8),
  *     'WAVE';
  *   - chunk sequence, each '4-char id' + LE u32 size + payload, sizes
  *     padded to even offsets per RIFF;
  *   - 'fmt ' chunk (16 bytes for PCM): audio format 1 (integer PCM),
  *     channels (LE u16), sample rate (LE u32), byte rate, block align,
  *     bits per sample 16;
  *   - 'data' chunk: interleaved frames, each sample a signed 16-bit LE.
  *
  * [[decode]] WALKS the chunk list (it does not assume fmt/data are at
  * fixed offsets — real encoders interleave LIST/INFO chunks), so a
  * file with extra metadata chunks still decodes; unknown chunks are
  * skipped by their declared size. Strict checks: magic ids, PCM
  * format, 16-bit, data size consistent with block alignment —
  * malformed input raises rather than yielding garbage samples (the
  * corrupt-quarantine ops catch those rows upstream).
  */
object WavCodec {

  final case class Wav(channels: Int, sampleRate: Int,
      /** Interleaved samples, length = frames × channels. */
      samples: Array[Short]) {
    def frames: Int = samples.length / channels
  }

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
  private def getLE32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def getLE16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Encode interleaved 16-bit PCM as a canonical WAV file. */
  def encode(channels: Int, sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(channels > 0 && samples.length % channels == 0, "partial frame")
    val dataSize = 2 * samples.length
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLE32(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putLE32(out, 16, 16) // PCM fmt chunk size
    putLE16(out, 20, 1) // integer PCM
    putLE16(out, 22, channels)
    putLE32(out, 24, sampleRate)
    putLE32(out, 28, sampleRate * channels * 2) // byte rate
    putLE16(out, 32, channels * 2) // block align
    putLE16(out, 34, 16) // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putLE32(out, 40, dataSize)
    var i = 0
    while (i < samples.length) {
      putLE16(out, 44 + 2 * i, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Decode a RIFF/WAVE file: chunk-walk to fmt + data, strict PCM-16
    * checks, raises on malformed input. decode(encode(x)) == x. */
  def decode(bytes: Array[Byte]): Wav = {
    require(bytes.length >= 44, s"truncated WAV: ${bytes.length} bytes")
    require(tag(bytes, 0) == "RIFF", "bad RIFF magic")
    require(tag(bytes, 8) == "WAVE", "bad WAVE magic")
    val riffEnd = math.min(bytes.length.toLong, 8L + getLE32(bytes, 4))
    var off = 12
    var channels = -1; var rate = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (off + 8 <= riffEnd && (channels < 0 || dataOff < 0)) {
      val id = tag(bytes, off)
      val sz = getLE32(bytes, off + 4)
      require(sz >= 0 && off.toLong + 8L + sz <= bytes.length,
        s"chunk $id overruns the file (size $sz at offset $off)")
      id match {
        case "fmt " =>
          require(sz >= 16, s"fmt chunk too small: $sz")
          require(getLE16(bytes, off + 8) == 1, "not integer PCM")
          channels = getLE16(bytes, off + 10)
          rate = getLE32(bytes, off + 12)
          bits = getLE16(bytes, off + 22)
          require(bits == 16, s"only 16-bit PCM supported, got $bits")
          require(channels > 0, "zero channels")
        case "data" =>
          dataOff = off + 8; dataLen = sz
        case _ => () // LIST/INFO/fact/... — skip by declared size
      }
      off += 8 + sz + (sz & 1) // RIFF pads chunks to even offsets
    }
    require(channels > 0, "no fmt chunk")
    require(dataOff >= 0, "no data chunk")
    require(dataLen % (2 * channels) == 0,
      s"data size $dataLen not a whole number of $channels-channel frames")
    val samples = new Array[Short](dataLen / 2)
    var i = 0
    while (i < samples.length) {
      samples(i) = getLE16(bytes, dataOff + 2 * i).toShort
      i += 1
    }
    Wav(channels, rate, samples)
  }
}
