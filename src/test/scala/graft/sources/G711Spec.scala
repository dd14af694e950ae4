package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** G.711 laws: conformance of both expansions against the JDK's own
  * μ-law/A-law converters over ALL 256 code bytes (the PNG-ImageIO
  * discipline — an independent implementation, not a round trip), plus
  * the structural-lie quarantines the gate corpus doesn't exercise. */
class G711Spec extends AnyFunSuite {

  /** decode all 256 code bytes through javax.sound's converter */
  private def jdkDecode(enc: javax.sound.sampled.AudioFormat.Encoding): Array[Int] = {
    import javax.sound.sampled._
    val codes = Array.tabulate(256)(_.toByte)
    val src = new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false)
    val dst = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16, 1, 2, 8000f, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(codes), src, 256)
    val pcm = AudioSystem.getAudioInputStream(dst, ais)
    val out = pcm.readAllBytes()
    assert(out.length === 512)
    Array.tabulate(256)(i => (((out(2 * i) & 0xff) | (out(2 * i + 1) << 8)).toShort).toInt)
  }

  test("ulaw expansion matches the JDK converter on all 256 codes") {
    val jdk = jdkDecode(javax.sound.sampled.AudioFormat.Encoding.ULAW)
    for (c <- 0 until 256) assert(G711Audio.ulaw(c) === jdk(c), s"code $c")
  }

  test("alaw expansion matches the JDK converter on all 256 codes") {
    val jdk = jdkDecode(javax.sound.sampled.AudioFormat.Encoding.ALAW)
    for (c <- 0 until 256) assert(G711Audio.alaw(c) === jdk(c), s"code $c")
  }

  test("structural lies quarantine; valid payloads decode") {
    val good = G711Audio.synthesize("ulaw", 8000, 64, t => t * 5)
    val Some((law, n, _, _, _)) = G711Audio.features(good)
    assert(law === "ulaw" && n === 64L)
    assert(G711Audio.features(G711Fixture.payload(1)).get._1 === "alaw")
    // wrong format tag (PCM), stereo, 16-bit, fact mismatch, truncated data
    def patched(b: Array[Byte])(f: Array[Byte] => Unit): Array[Byte] = { val c = b.clone(); f(c); c }
    val fmtOfs = 20 // RIFF(12) + "fmt "+len(8)
    assert(G711Audio.features(patched(good)(c => c(fmtOfs) = 1)).isEmpty, "PCM tag accepted")
    assert(G711Audio.features(patched(good)(c => c(fmtOfs + 2) = 2)).isEmpty, "stereo accepted")
    assert(G711Audio.features(patched(good)(c => c(fmtOfs + 14) = 16)).isEmpty, "16-bit accepted")
    assert(G711Audio.features(patched(good)(c => c(fmtOfs + 16 + 8) = 63)).isEmpty, "fact mismatch accepted")
    assert(G711Audio.features(good.dropRight(1)).isEmpty, "truncated data accepted")
  }

  test("near-2^31 chunk length quarantines instead of wrapping the walk offset (review-found)") {
    // RIFF/WAVE preamble + one chunk declaring len = Int.MaxValue - 16:
    // the old advance i += 8 + len + (len & 1) wrapped negative and threw
    // from new String(b, -…, 4); Riff.walk must return None instead
    val evil = "RIFF".getBytes("US-ASCII") ++ Riff.le32(92) ++ "WAVE".getBytes("US-ASCII") ++
      "junk".getBytes("US-ASCII") ++ Riff.le32(Int.MaxValue.toLong - 16) ++ new Array[Byte](80)
    assert(G711Audio.features(evil).isEmpty)
    assert(AdpcmAudio.features(evil).isEmpty)
    assert(AudioMeta.parse(evil).isEmpty)
  }
}
