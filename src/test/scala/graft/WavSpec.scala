package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.WavCodec

/** The audio-format proof behind the multimodal decode seam: WavCodec
  * implements the PUBLIC RIFF/PCM-16 layout, so encode is pinned against
  * hand-assembled golden file bytes (not just its own decoder), decode
  * round-trips, the chunk WALK survives interleaved metadata chunks
  * (what distinguishes a real RIFF parser from a fixed-offset reader),
  * and malformed inputs raise. Pure JVM — no SparkSession. */
class WavSpec extends AnyFunSuite {

  test("encode matches the hand-assembled WAV file byte-for-byte (mono, 2 frames)") {
    // 1 channel, 8000 Hz, samples [1, -2]: dataSize 4, riff size 40
    val bytes = WavCodec.encode(1, 8000, Array[Short](1, -2))
    val golden = Array[Int](
      'R', 'I', 'F', 'F', 40, 0, 0, 0, 'W', 'A', 'V', 'E',
      'f', 'm', 't', ' ', 16, 0, 0, 0,
      1, 0, // integer PCM
      1, 0, // mono
      0x40, 0x1f, 0, 0, // 8000 Hz
      0x80, 0x3e, 0, 0, // byte rate 16000
      2, 0, // block align
      16, 0, // bits per sample
      'd', 'a', 't', 'a', 4, 0, 0, 0,
      1, 0, // sample 1
      0xfe, 0xff // sample -2 (LE two's complement)
    ).map(_.toByte)
    assert(bytes.toSeq == golden.toSeq)
  }

  test("decode round-trips stereo, extreme values, and odd frame counts") {
    for {
      ch <- Seq(1, 2, 3)
      frames <- Seq(1, 5, 64)
    } {
      val samples = Array.tabulate(frames * ch)(i =>
        (i * 12289 % 65536 - 32768).toShort)
      val wav = WavCodec.decode(WavCodec.encode(ch, 44100, samples))
      assert(wav.channels == ch && wav.sampleRate == 44100 && wav.frames == frames)
      assert(wav.samples.toSeq == samples.toSeq)
    }
    // the int16 extremes survive the sign round-trip
    val ext = WavCodec.decode(WavCodec.encode(1, 8000,
      Array[Short](Short.MinValue, Short.MaxValue, 0, -1)))
    assert(ext.samples.toSeq == Seq[Short](-32768, 32767, 0, -1))
  }

  test("the chunk walk skips interleaved metadata (fmt/data not at fixed offsets)") {
    // canonical file, then splice a LIST chunk (odd size — exercises the
    // even-offset padding rule) BETWEEN fmt and data
    val base = WavCodec.encode(1, 8000, Array[Short](7, -7))
    val list = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0,
      'I', 'N', 'F', 'O', 'x', 0 /* pad to even */)
    val spliced = base.slice(0, 36) ++ list ++ base.slice(36, base.length)
    // riff size grows by the spliced bytes
    val fixed = spliced.clone()
    val newRiff = spliced.length - 8
    fixed(4) = (newRiff & 0xff).toByte; fixed(5) = ((newRiff >> 8) & 0xff).toByte
    val wav = WavCodec.decode(fixed)
    assert(wav.samples.toSeq == Seq[Short](7, -7))
  }

  test("malformed files raise: bad magic, truncation, partial frames, non-PCM") {
    val good = WavCodec.encode(2, 8000, Array[Short](1, 2, 3, 4))
    def mutated(f: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); f(b); b
    }
    intercept[IllegalArgumentException](
      WavCodec.decode(mutated(b => b(0) = 'X')))          // bad RIFF magic
    intercept[IllegalArgumentException](
      WavCodec.decode(mutated(b => b(8) = 'X')))          // bad WAVE magic
    intercept[IllegalArgumentException](
      WavCodec.decode(good.slice(0, 30)))                 // truncated
    intercept[IllegalArgumentException](
      WavCodec.decode(mutated(b => b(40) = 6)))           // 6 bytes ≠ whole stereo frames
    intercept[IllegalArgumentException](
      WavCodec.decode(mutated(b => b(20) = 3)))           // IEEE float, not integer PCM
    intercept[IllegalArgumentException](
      WavCodec.decode(mutated(b => b(34) = 8)))           // 8-bit unsupported
  }

  test("a data chunk whose declared size overruns the file raises") {
    val good = WavCodec.encode(1, 8000, Array[Short](1))
    val b = good.clone()
    b(40) = 100 // declared data size far beyond the real 2 bytes
    intercept[IllegalArgumentException](WavCodec.decode(b))
  }
}
