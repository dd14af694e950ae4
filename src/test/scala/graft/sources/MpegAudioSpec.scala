package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class MpegAudioSpec extends AnyFunSuite {

  test("fixture round-trip: every payload variant parses to its ground truth") {
    for ((id, bytes, n, ch, kbpsSum, durMs) <- MpegFixture.rows) {
      val m = MpegAudio.parse(bytes).getOrElse(fail(s"audio $id did not parse"))
      assert(m.nFrames === n.toLong, s"audio $id frames")
      assert(m.channels === ch, s"audio $id channels")
      assert(m.kbpsSum === kbpsSum, s"audio $id kbps")
      assert(m.durationMs === durMs, s"audio $id duration")
      assert(m.version === "MPEG1" && m.layer === 3)
    }
  }

  test("the walk is structural: any frame-length error desynchronizes to None") {
    val ok = MpegAudio.synthesize(6, 0, _ => 5, mono = false, seed = 3)
    assert(MpegAudio.parse(ok).exists(_.nFrames === 6L))
    // truncating mid-frame breaks the exact-consumption contract
    assert(MpegAudio.parse(ok.dropRight(7)) === None)
    // trailing garbage that is not an ID3v1 tag is not a frame header
    assert(MpegAudio.parse(ok ++ Array[Byte](1, 2, 3, 4, 5)) === None)
    // flip one bitrate-index nibble to the reserved value 15
    val bad = ok.clone()
    bad(2) = (bad(2) | 0xf0).toByte
    assert(MpegAudio.parse(bad) === None)
    assert(MpegAudio.parse("garbage".getBytes) === None)
  }

  test("ID3v2 prefix and ID3v1 trailer are skipped exactly") {
    val tagged = MpegAudio.synthesize(4, 1, f => 3 + f, mono = true, id3v2Bytes = 57, id3v1 = true, seed = 9)
    val m = MpegAudio.parse(tagged).get
    assert(m.nFrames === 4L && m.channels === 1 && m.sampleRate === 48000)
    // a corrupted synchsafe size points the walk at a non-sync byte
    val bad = tagged.clone()
    bad(9) = (bad(9) ^ 0x01).toByte
    assert(MpegAudio.parse(bad) === None)
  }

  test("VBR: per-frame bitrates of different indices sum exactly") {
    val vbr = MpegAudio.synthesize(14, 0, f => 1 + f, mono = false, seed = 1)
    val m = MpegAudio.parse(vbr).get
    // MPEG1 L3 table entries 1..14
    assert(m.kbpsSum === Seq(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320).sum.toLong)
    assert(m.durationMs === 14L * 1152 * 1000 / 44100)
  }
}
