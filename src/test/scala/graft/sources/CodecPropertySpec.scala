package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the from-scratch codec family (the PropertySpec
  * fixed-seed sampling pattern — the scalatest bridge isn't offline):
  * arbitrary geometries, coefficient layouts, frame schedules and tag
  * wrappings must round-trip through writer → parser exactly. */
class CodecPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("JPEG: arbitrary dims and DC fields round-trip exactly (gray and 4:4:4 color)") {
    val geom = for {
      w <- Gen.choose(1, 41)
      h <- Gen.choose(1, 33)
      base <- Gen.choose(0, 255)
      stride <- Gen.choose(1, 61)
    } yield (w, h, base, stride)
    val q8 = Array.fill(64)(8)
    samples(geom, 25).foreach { case (w, h, base, stride) =>
      def dc(bx: Int, by: Int): Int = (base + bx * stride + by * 7) % 256
      val gray = JpegPixels.synthesize(w, h, 1, Seq(q8), (_, bx, by) => {
        val z = new Array[Int](64); z(0) = dc(bx, by) - 128; z
      })
      val img = JpegPixels.decode(gray).getOrElse(fail(s"gray ${w}x$h did not decode"))
      assert(img.width === w && img.height === h)
      for (x <- 0 until w; y <- 0 until h)
        assert(img.rgb(x, y)._1 === dc(x / 8, y / 8), s"gray ${w}x$h base $base stride $stride ($x,$y)")
      val color = JpegPixels.synthesize(w, h, 3, Seq(q8, q8), (c, bx, by) => {
        val z = new Array[Int](64); z(0) = ((dc(bx, by) + c * 41) % 256) - 128; z
      })
      val cimg = JpegPixels.decode(color).getOrElse(fail(s"color ${w}x$h did not decode"))
      for (x <- Seq(0, w - 1); y <- Seq(0, h - 1)) {
        val (bx, by) = (x / 8, y / 8)
        val expected = JpegPixels.ycc2rgb(
          dc(bx, by), (dc(bx, by) + 41) % 256, (dc(bx, by) + 82) % 256)
        assert(cimg.rgb(x, y) === expected, s"color ${w}x$h ($x,$y)")
      }
    }
  }

  test("MP3: arbitrary frame schedules, tags and modes round-trip to exact ground truth") {
    val streamGen = for {
      n <- Gen.choose(1, 40)
      srIdx <- Gen.choose(0, 2)
      brBase <- Gen.choose(1, 14)
      brStep <- Gen.choose(0, 13)
      mono <- Gen.oneOf(true, false)
      id3v2 <- Gen.oneOf(0, 0, 33, 120)
      id3v1 <- Gen.oneOf(true, false)
    } yield (n, srIdx, brBase, brStep, mono, id3v2, id3v1)
    samples(streamGen, 40).foreach { case (n, srIdx, brBase, brStep, mono, id3v2, id3v1) =>
      def brIdx(f: Int): Int = 1 + (brBase - 1 + f * brStep) % 14
      val bytes = MpegAudio.synthesize(n, srIdx, brIdx, mono, id3v2, id3v1, seed = n * 31 + srIdx)
      val m = MpegAudio.parse(bytes).getOrElse(fail(s"stream n=$n sr=$srIdx did not parse"))
      assert(m.nFrames === n.toLong)
      assert(m.channels === (if (mono) 1 else 2))
      assert(m.sampleRate === MpegAudio.SrV1(srIdx))
      assert(m.kbpsSum === (0 until n).map(f => MpegAudio.BrV1L3(brIdx(f)).toLong).sum)
      assert(m.durationMs === n.toLong * 1152L * 1000L / MpegAudio.SrV1(srIdx))
    }
  }

  test("H.264: arbitrary SPS geometries, crops and NAL layouts round-trip to exact ground truth") {
    val spsGen = for {
      wMbs <- Gen.choose(1, 120)
      hUnits <- Gen.choose(1, 68)
      cl <- Gen.choose(0, 3); cr <- Gen.choose(0, 3)
      ct <- Gen.choose(0, 3); cb <- Gen.choose(0, 3)
      profile <- Gen.oneOf(66, 77, 88)
      level <- Gen.choose(10, 51)
      slices <- Gen.choose(0, 9)
      zeroWords <- Gen.oneOf(0, 0, 1, 3)
    } yield (wMbs, hUnits, (cl, cr, ct, cb), profile, level, slices, zeroWords)
    samples(spsGen, 40).foreach { case (wMbs, hUnits, crop, profile, level, slices, zw) =>
      val w = wMbs * 16 - 2 * (crop._1 + crop._2)
      val h = hUnits * 16 - 2 * (crop._3 + crop._4)
      if (w > 0 && h > 0) {
        val bytes = H264Meta.synthesize(wMbs, hUnits, crop, profile, level, slices, seed = wMbs * 7 + hUnits, zw)
        val m = H264Meta.parse(bytes).getOrElse(fail(s"sps ${wMbs}x$hUnits crop $crop did not parse"))
        assert(m.width === w && m.height === h, s"geometry ${wMbs}x$hUnits crop $crop")
        assert(m.profile === profile && m.level === level)
        assert(m.nNals === 3 + slices && m.nSlices === slices)
      }
    }
  }
}
