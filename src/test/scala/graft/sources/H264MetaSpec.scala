package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class H264MetaSpec extends AnyFunSuite {

  test("fixture round-trip: SPS geometry, profile/level and NAL census match ground truth") {
    for ((id, bytes, w, h, profile, level, nNals, nSlices) <- H264Fixture.rows) {
      val m = H264Meta.parse(bytes).getOrElse(fail(s"video $id did not parse"))
      assert(m.width === w, s"video $id width")
      assert(m.height === h, s"video $id height")
      assert(m.profile === profile && m.level === level, s"video $id profile/level")
      assert(m.nNals === nNals.toInt && m.nSlices === nSlices.toInt, s"video $id census")
      assert(m.nSps === 1 && m.nPps === 1 && m.nIdr === 1)
    }
  }

  test("emulation prevention is load-bearing: some fixture SPS payloads contain escaped runs") {
    // at least one fixture SPS must carry the 00 00 03 escape; dropping the
    // escape byte corrupts the Exp-Golomb stream and must change the result
    val withEscape = H264Fixture.rows.find { case (_, bytes, _, _, _, _, _, _) =>
      // SPS payload = after the first long start code + header, up to next start code
      val spsEnd = (5 until bytes.length - 3).find(i => bytes(i) == 0 && bytes(i + 1) == 0 && bytes(i + 2) == 1).get
      (5 until spsEnd - 2).exists(i => bytes(i) == 0 && bytes(i + 1) == 0 && (bytes(i + 2) & 0xff) == 3)
    }
    assert(withEscape.isDefined, "fixture never exercises emulation prevention")
  }

  test("crop rectangle subtracts from the macroblock grid exactly") {
    val bytes = H264Meta.synthesize(widthMbs = 8, heightUnits = 5, crop = (1, 2, 3, 0), 66, 31, slices = 2, seed = 4)
    val m = H264Meta.parse(bytes).get
    assert(m.width === 8 * 16 - 2 * 3)
    assert(m.height === 5 * 16 - 2 * 3)
  }

  test("rejects out-of-scope and corrupt payloads (quarantine, never a throw)") {
    val ok = H264Meta.synthesize(6, 4, (0, 0, 0, 0), 77, 40, 3, seed = 1)
    assert(H264Meta.parse(ok).isDefined)
    assert(H264Meta.parse("no start code here".getBytes) === None)
    // high profile (chroma block unparsed) quarantines
    val high = H264Meta.synthesize(6, 4, (0, 0, 0, 0), 100, 40, 3, seed = 1)
    assert(H264Meta.parse(high) === None)
    // forbidden_zero_bit set on the SPS header byte
    val forb = ok.clone()
    val spsAt = (0 until forb.length - 4).find(i => forb(i) == 0 && forb(i + 1) == 0 && forb(i + 2) == 1).get + 3
    forb(spsAt) = (forb(spsAt) | 0x80).toByte
    assert(H264Meta.parse(forb) === None)
    // truncated inside the SPS: Exp-Golomb reader runs out of bits
    assert(H264Meta.parse(ok.take(spsAt + 3)) === None)
  }
}
