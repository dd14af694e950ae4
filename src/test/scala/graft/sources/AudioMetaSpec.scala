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

  test("gate fixture payloads parse to exactly the twin metadata") {
    AudioFixture.rows.foreach { case (id, payload, rate, ch, bits, durMs) =>
      val m = AudioMeta.parse(payload)
      assert(m.isDefined, s"audio $id")
      assert(m.get.sampleRate === rate && m.get.channels === ch && m.get.bitsPerSample === bits, s"audio $id")
      assert(m.get.durationMs === durMs, s"audio $id")
    }
  }
}
