package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** x98 IMA ADPCM: container parse + predictor state machine, pinned by an
  * INDEPENDENT in-spec reimplementation of the recurrence (its own step
  * loop over the generator formulas, not a call into the decoder), by
  * closed-form waveforms (all-zero nibbles hold the predictor; all-7
  * nibbles must saturate the s16 clamp), and by the structural-lie ⇒ None
  * discipline the sibling parsers follow. */
class AdpcmSpec extends AnyFunSuite {

  // independent reference: the same public spec implemented as a straight
  // scan over the formula-generated nibbles (shares only the constant
  // tables with the decoder, which ARE the spec)
  private def reference(id: Int): (Long, Long, Long, Long) = {
    var n = 0L; var sumAbs = 0L; var peak = 0L; var chk = 0L
    for (b <- 0 until AdpcmFixture.nBlocks(id)) {
      var pred = AdpcmFixture.pred0(id, b)
      var si = AdpcmFixture.step0(id, b)
      def emit(): Unit = {
        sumAbs += math.abs(pred); peak = math.max(peak, math.abs(pred).toLong)
        chk += (n + 1) * pred; n += 1 // global position: blocks are contiguous
      }
      emit()
      for (t <- 0 until (AdpcmFixture.BlockAlign - 4) * 2) {
        val nib = AdpcmFixture.nib(id, b, t)
        val st = AdpcmAudio.StepTable(si)
        var diff = st >> 3
        if ((nib & 4) != 0) diff += st
        if ((nib & 2) != 0) diff += st >> 1
        if ((nib & 1) != 0) diff += st >> 2
        pred = math.max(-32768, math.min(32767, if ((nib & 8) != 0) pred - diff else pred + diff))
        si = math.max(0, math.min(88, si + AdpcmAudio.IndexTable(nib & 7)))
        emit()
      }
    }
    (n, sumAbs, peak, chk)
  }

  test("decoder matches the independent reference on every fixture payload") {
    for (id <- 0 until AdpcmFixture.N) {
      val got = AdpcmAudio.features(AdpcmFixture.payload(id))
      assert(got === Some(reference(id)), s"audio_id=$id")
    }
  }

  test("closed-form: all-zero nibbles hold the predictor exactly (step 7 >> 3 = 0)") {
    val p = AdpcmAudio.synthesize(8000, 16, Seq((100, 0)), (_, _) => 0)
    val n = (16 - 4) * 2 + 1
    // every sample is 100: diff = 7>>3 = 0 at step index 0 forever
    val chk = (1 to n).map(_ * 100L).sum
    assert(AdpcmAudio.features(p) === Some((n.toLong, n * 100L, 100L, chk)))
  }

  test("closed-form: sustained positive nibbles saturate at the s16 clamp") {
    val p = AdpcmAudio.synthesize(8000, 256, Seq((0, 0)), (_, _) => 7)
    val got = AdpcmAudio.features(p).get
    assert(got._1 === 505L && got._3 === 32767L)
    val pDown = AdpcmAudio.synthesize(8000, 256, Seq((0, 0)), (_, _) => 15)
    assert(AdpcmAudio.features(pDown).get._3 === 32768L) // |-32768|
  }

  test("structural lies quarantine: bad step index, partial block, fact mismatch, wrong format") {
    val good = AdpcmFixture.payload(3)
    assert(AdpcmAudio.features(good).isDefined)
    // step index 89 in the first block header
    val badSi = good.clone
    val dataOfs = {
      var i = 12; var o = -1
      while (o < 0) {
        val id = new String(badSi, i, 4, "US-ASCII")
        val len = (badSi(i + 4) & 0xff) | ((badSi(i + 5) & 0xff) << 8) |
          ((badSi(i + 6) & 0xff) << 16) | ((badSi(i + 7) & 0xff) << 24)
        if (id == "data") o = i + 8 else i += 8 + len + (len & 1)
      }
      o
    }
    badSi(dataOfs + 2) = 89.toByte
    assert(AdpcmAudio.features(badSi).isEmpty)
    // truncated to a partial block (data length no longer divides blockAlign)
    val cut = good.dropRight(7)
    // fix RIFF+data lengths? no — truncation alone must already quarantine
    assert(AdpcmAudio.features(cut).isEmpty)
    // fact chunk disagreeing with the block count
    val badFact = good.clone
    var i = 12; var factOfs = -1
    while (factOfs < 0 && i + 8 <= badFact.length) {
      val id = new String(badFact, i, 4, "US-ASCII")
      val len = (badFact(i + 4) & 0xff) | ((badFact(i + 5) & 0xff) << 8)
      if (id == "fact") factOfs = i + 8 else i += 8 + len + (len & 1)
    }
    badFact(factOfs) = (badFact(factOfs) ^ 1).toByte
    assert(AdpcmAudio.features(badFact).isEmpty)
    // PCM payloads (format tag 1) are not ADPCM
    assert(AdpcmAudio.features(AudioMeta.synthesize(8000, 1, 16, 100, seed = 1)).isEmpty)
  }

  test("fixture payloads are spec-valid WAVs to the container parser too") {
    // AudioMeta.parse walks the same RIFF chunks; ADPCM files still carry
    // fmt/data, so the metadata face must see them (4-bit, mono)
    val m = AudioMeta.parse(AdpcmFixture.payload(0))
    assert(m.exists(x => x.channels == 1 && x.bitsPerSample == 4))
  }
}
