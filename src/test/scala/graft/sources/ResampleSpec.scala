package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** x211 resample laws: identity at 16 kHz, exact every-3rd decimation
  * from 48 kHz, exact midpoints upsampling from 8 kHz, and ramp
  * exactness under interpolation. */
class ResampleSpec extends AnyFunSuite {

  /** minimal mono 16-bit WAV around the given samples */
  private def wav(rate: Int, samples: Seq[Int]): Array[Byte] = {
    val data = samples.flatMap(s => Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)).toArray
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val fmt = le16(1) ++ le16(1) ++ le32(rate.toLong) ++ le32(rate * 2L) ++ le16(2) ++ le16(16)
    "RIFF".getBytes("US-ASCII") ++ le32(4 + 8 + fmt.length + 8 + data.length.toLong) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(fmt.length.toLong) ++ fmt ++
      "data".getBytes("US-ASCII") ++ le32(data.length.toLong) ++ data
  }

  private def features(samples: Seq[Long]): (Long, Long, Long, Long) =
    (samples.length.toLong,
      samples.map(math.abs).sum,
      samples.map(math.abs).max,
      samples.zipWithIndex.map { case (y, j) => (j + 1) * y }.sum)

  test("16 kHz input is the identity") {
    val xs = (0 until 100).map(i => (i * 37) % 1000 - 500)
    val got = AudioMeta.resample16k(wav(16000, xs)).get
    assert(got === features(xs.map(_.toLong)))
  }

  test("48 kHz decimates to exactly every third sample (frac always 0)") {
    val xs = (0 until 99).map(i => i * 13 - 600)
    val got = AudioMeta.resample16k(wav(48000, xs)).get
    val want = features((0 until 33).map(j => xs(3 * j).toLong))
    assert(got === want)
  }

  test("8 kHz upsamples with exact truncated midpoints") {
    val xs = Seq(0, 10, -7, 1001)
    val got = AudioMeta.resample16k(wav(8000, xs)).get
    // outputs at positions 0, .5, 1, 1.5, 2, 2.5, 3
    val want = features(Seq(0L, 5L, 10L, 10L + (-7L - 10L) * 8000L / 16000L, -7L, -7L + (1001L + 7L) / 2L, 1001L))
    assert(got === want)
  }

  test("a linear ramp survives 44.1 kHz → 16 kHz interpolation within truncation") {
    // y(t) = 16000·t on the input grid: x[i] = i·441/160... use x[i] = 3i
    val xs = (0 until 200).map(_ * 3)
    val (n, _, peak, _) = AudioMeta.resample16k(wav(44100, xs)).get
    assert(n === (199L * 16000L) / 44100L + 1L)
    // the resampled ramp's peak is the interpolation at the last grid point
    assert(peak <= 3L * 199L && peak >= 3L * 190L)
  }

  test("8-bit and multi-channel guards: 8-bit drops; stereo takes channel 0") {
    assert(AudioMeta.resample16k(AudioMeta.synthesize(16000, 1, 8, 100, 1)).isEmpty)
    val st = AudioMeta.synthesize(16000, 2, 16, 50, 7)
    val mono = AudioMeta.resample16k(st).get
    assert(mono._1 === 50L, "channel-0 frame count")
  }
}
