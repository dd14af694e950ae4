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

  test("x114 GOP index: offsets are real split points, extents tile the stream") {
    val (bytes, truth) =
      H264Meta.synthesizeGops(6, 4, 66, 40, nGops = 4, slicesOf = g => 1 + g % 3, seed = 9)
    val gops = H264Meta.gopIndex(bytes).get
    assert(gops.map(g => (g.offset, g.nSlices, g.nBytes)) === truth)
    // every offset points at a start code whose NAL is an IDR
    for (g <- gops) {
      val o = g.offset.toInt
      assert(bytes(o) == 0 && bytes(o + 1) == 0 && bytes(o + 2) == 1)
      assert((bytes(o + 3) & 0x1f) === 5)
    }
    // extents tile [firstGop, end) with no gaps
    assert(gops.last.offset + gops.last.nBytes === bytes.length.toLong)
    for (Seq(a, b) <- gops.sliding(2))
      assert(a.offset + a.nBytes === b.offset)
    // each GOP slice, prefixed with SPS+PPS, re-parses as a standalone stream
    val headerEnd = gops.head.offset.toInt
    val standalone = bytes.take(headerEnd) ++
      bytes.slice(gops(2).offset.toInt, (gops(2).offset + gops(2).nBytes).toInt)
    val m = H264Meta.parse(standalone).get
    assert(m.nIdr === 1 && m.nSlices === truth(2)._2)
  }

  test("x114 GOP quarantine: keyframe-less and orphan-slice streams reject") {
    // a single-IDR stream indexes as one GOP...
    val one = H264Meta.synthesize(6, 4, (0, 0, 0, 0), 66, 40, slices = 2, seed = 3)
    assert(H264Meta.gopIndex(one).map(_.size) === Some(1))
    // ...while a stream with NO keyframe at all (SPS+PPS only) rejects
    val (noIdr, _) = H264Meta.synthesizeGops(6, 4, 66, 40, nGops = 0, slicesOf = _ => 0, seed = 3)
    assert(H264Meta.parse(noIdr).isDefined) // parse is fine with it — the GOP indexer is not
    assert(H264Meta.gopIndex(noIdr) === None)
    // orphan slices: a non-IDR slice before the first IDR
    val (bytes, _) = H264Meta.synthesizeGops(6, 4, 66, 40, nGops = 2, slicesOf = _ => 2, seed = 5)
    val gops = H264Meta.gopIndex(bytes).get
    val first = gops.head.offset.toInt
    val orphan = bytes.take(first) ++
      Array[Byte](0, 0, 1, 0x41, 0x30, 0x31, 0x32) ++ bytes.drop(first)
    assert(H264Meta.gopIndex(orphan) === None)
  }
}
