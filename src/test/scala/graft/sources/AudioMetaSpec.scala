package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class AudioMetaSpec extends AnyFunSuite {

  test("parses synthesized WAVs across rates/channels/bit depths") {
    val b = AudioMeta.synthesize(44100, 2, 16, nSamples = 1000, seed = 3)
    val m = AudioMeta.parse(b).get
    assert(m === AudioMeta.Meta("audio/wav", 44100, 2, 16, 4000L))
    assert(m.durationMs === 4000L * 8000 / (44100L * 2 * 16)) // ≈22 ms
  }

  test("chunk walk skips unknown chunks (LIST before data) with odd-length padding") {
    val base = AudioMeta.synthesize(8000, 1, 8, nSamples = 100, seed = 1)
    // splice an odd-length junk chunk right after "fmt " (ends at 12+8+16=36)
    val junk = "LIST".getBytes("US-ASCII") ++ Array[Byte](5, 0, 0, 0) ++ Array[Byte](1, 2, 3, 4, 5, 0) // 5 + pad
    val spliced = base.take(36) ++ junk ++ base.drop(36)
    assert(AudioMeta.parse(spliced) === Some(AudioMeta.Meta("audio/wav", 8000, 1, 8, 100L)))
  }

  test("non-WAV and truncated payloads return None") {
    assert(AudioMeta.parse("RIFFnot really a wave file".getBytes) === None)
    assert(AudioMeta.parse(Array[Byte](1, 2, 3)) === None)
    assert(AudioMeta.parse(ImageMeta.synthesize("image/png", 4, 4, 4, 1)) === None)
  }

  test("malformed u32 chunk length is rejected instead of looping (ADVICE r02)") {
    val base = AudioMeta.synthesize(8000, 1, 8, nSamples = 100, seed = 2)
    // corrupt the fmt chunk length to 0xFFFFFFF8: advance would be 0 → spin
    val evil = base.clone()
    evil(16) = 0xf8.toByte; evil(17) = 0xff.toByte; evil(18) = 0xff.toByte; evil(19) = 0xff.toByte
    assert(AudioMeta.parse(evil) === None) // must return, not hang
    // and a merely-negative-index variant (0x80000010)
    val evil2 = base.clone()
    evil2(16) = 0x10.toByte; evil2(17) = 0; evil2(18) = 0; evil2(19) = 0x80.toByte
    assert(AudioMeta.parse(evil2) === None)
  }

  test("PCM features decode real sample bytes (8-bit bias, 16-bit sign extension)") {
    // 16-bit: bytes k = (seed*17 + 3k) % 121 → sample m = b(2m) + 256*b(2m+1)
    val b16 = AudioMeta.synthesize(8000, 1, 16, nSamples = 4, seed = 5)
    val (n16, sum16, peak16) = AudioMeta.pcmFeatures(b16).get
    val exp16 = (0 until 4).map(m => ((5 * 17 + 6 * m) % 121) + 256 * ((5 * 17 + 6 * m + 3) % 121))
    assert(n16 === 4L && sum16 === exp16.sum.toLong && peak16 === exp16.max.toLong)
    // 8-bit unsigned: sample = byte − 128
    val b8 = AudioMeta.synthesize(8000, 2, 8, nSamples = 3, seed = 2)
    val (n8, sum8, peak8) = AudioMeta.pcmFeatures(b8).get
    val exp8 = (0 until 6).map(k => math.abs(((2 * 17 + 3 * k) % 121) - 128))
    assert(n8 === 6L && sum8 === exp8.sum.toLong && peak8 === exp8.max.toLong)
    // true sign extension: a hand-built s16le sample of -2 (0xFE 0xFF)
    val neg = b16.clone()
    val dataOfs = b16.length - 8 // 4 samples * 2 bytes from the end
    neg(dataOfs) = 0xfe.toByte; neg(dataOfs + 1) = 0xff.toByte
    val (_, _, peakNeg) = AudioMeta.pcmFeatures(neg).get
    assert(peakNeg === math.max(2L, exp16.drop(1).max.toLong))
  }

  test("gate fixture payloads parse to exactly the twin metadata") {
    AudioFixture.rows.foreach { case (id, payload, rate, ch, bits, durMs) =>
      val m = AudioMeta.parse(payload)
      assert(m.isDefined, s"audio $id")
      assert(m.get.sampleRate === rate && m.get.channels === ch && m.get.bitsPerSample === bits, s"audio $id")
      assert(m.get.durationMs === durMs, s"audio $id")
    }
  }
}
