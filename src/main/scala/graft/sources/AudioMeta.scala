package graft.sources

/** Real audio-container metadata extraction (the audio face of
  * [[ImageMeta]]): WAV/RIFF carries sample rate, channel count, bit depth
  * and payload size in its `fmt `/`data` chunks — parsed from the first
  * bytes, no decoder. Duration follows arithmetically. */
object AudioMeta {

  final case class Meta(format: String, sampleRate: Int, channels: Int, bitsPerSample: Int, dataBytes: Long) {
    def durationMs: Long =
      if (sampleRate <= 0 || channels <= 0 || bitsPerSample <= 0) 0L
      else dataBytes * 8000L / (sampleRate.toLong * channels * bitsPerSample)
  }

  // byte readers/writers live in [[Riff]] (review-found: this file carried
  // the fourth verbatim copy); only the early-stopping walks stay local
  private def u16le(b: Array[Byte], o: Int): Int = Riff.u16le(b, o)
  private def u32le(b: Array[Byte], o: Int): Long = Riff.u32le(b, o)
  private def tag(b: Array[Byte], o: Int): String = Riff.tag(b, o)

  /** Walk RIFF chunks for `fmt ` and `data`; None if not a WAV. */
  def parse(b: Array[Byte]): Option[Meta] = {
    if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var i = 12
    var rate, chans, bits = 0
    var dataBytes = -1L
    while (i + 8 <= b.length && (rate == 0 || dataBytes < 0)) {
      val id = tag(b, i)
      val len = u32le(b, i + 4)
      if (id == "fmt " && i + 24 <= b.length) {
        chans = u16le(b, i + 10)
        rate = u32le(b, i + 12).toInt
        bits = u16le(b, i + 22)
      } else if (id == "data") dataBytes = len
      // a chunk longer than the remaining bytes is a structural lie AND
      // the Int-overflow hazard (a near-2^31 length wraps the advance
      // negative on untrusted executor-side bytes) — reject the file.
      // Same guard as Riff.walk; this walk stops early so it keeps its
      // own loop.
      if (len > b.length - (i + 8)) return None
      i += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    if (rate > 0 && dataBytes >= 0) Some(Meta("audio/wav", rate, chans, bits, dataBytes)) else None
  }

  /** REAL sample decode: WAV PCM payload bytes are raw LE samples (8-bit
    * unsigned, 16-bit signed), so amplitude features run without any codec.
    * Returns (total interleaved samples, Σ|sample|, max |sample|) — the
    * loudness/clipping first pass of an audio curation pipeline. The x34
    * oracle recomputes these from the fixture's closed-form sample formula,
    * so a gate match proves the byte-level PCM decode arithmetic itself. */
  /** Offset of the `data` chunk payload, with the same structural-lie /
    * Int-overflow guard as [[Riff.walk]] (one definition — pcmFeatures
    * and resample16k previously carried verbatim copies, review-found). */
  private def dataOffset(b: Array[Byte]): Option[Int] = {
    var i = 12
    while (i + 8 <= b.length) {
      val len = u32le(b, i + 4)
      if (len > b.length - (i + 8)) return None
      if (tag(b, i) == "data") return Some(i + 8)
      i += 8 + len.toInt + (len.toInt & 1)
    }
    None
  }

  def pcmFeatures(b: Array[Byte]): Option[(Long, Long, Long)] = {
    val meta = parse(b).filter(m => m.bitsPerSample == 8 || m.bitsPerSample == 16)
    meta.flatMap { m =>
      // locate the data chunk again (parse only kept its length)
      val dataOfs = dataOffset(b).getOrElse(-1)
      val n = m.dataBytes.toInt / (m.bitsPerSample / 8)
      if (dataOfs < 0 || dataOfs.toLong + m.dataBytes > b.length) None
      else {
        var sumAbs = 0L
        var peak = 0L
        var k = 0
        while (k < n) {
          val s =
            if (m.bitsPerSample == 8) (b(dataOfs + k) & 0xff) - 128 // u8 with 128 bias
            else (u16le(b, dataOfs + 2 * k).toShort).toInt // s16le sign-extended
          val a = math.abs(s).toLong
          sumAbs += a
          if (a > peak) peak = a
          k += 1
        }
        Some((n.toLong, sumAbs, peak))
      }
    }
  }

  /** REAL rate conversion (x211): channel-0 16-bit samples linearly
    * resampled to 16 kHz — the normalization step every audio-training
    * pipeline runs before feature extraction (mixed-rate corpora are the
    * norm; models want one rate). Exact integer arithmetic: output j
    * sits at rational input position j·rate/16000, split by div/mod;
    * y = x[idx] + (x[idx+1] − x[idx])·frac div 16000 with TRUNCATING
    * division (matches DuckDB's `//`, the x205 pin). Upsampling (8 kHz)
    * interpolates, downsampling (22.05/44.1/48 kHz) decimates through
    * the same formula. Returns (n_out, Σ|y|, max|y|, Σ(j+1)·y — the
    * positional checksum that pins sample ORDER). */
  def resample16k(b: Array[Byte]): Option[(Long, Long, Long, Long)] = {
    parse(b).filter(m => m.bitsPerSample == 16 && m.channels >= 1).flatMap { m =>
      val dataOfs = dataOffset(b).getOrElse(-1)
      val frames = (m.dataBytes / (2L * m.channels)).toInt
      if (dataOfs < 0 || dataOfs.toLong + m.dataBytes > b.length || frames < 1) None
      else {
        def x(j: Int): Long = u16le(b, dataOfs + 2 * (j * m.channels)).toShort.toLong
        val r = m.sampleRate.toLong
        val nOut = (frames - 1).toLong * 16000L / r + 1L
        var j = 0L
        var sum = 0L
        var peak = 0L
        var chk = 0L
        while (j < nOut) {
          val num = j * r
          val idx = (num / 16000L).toInt
          val frac = num % 16000L
          val x0 = x(idx)
          val y = if (frac == 0L) x0 else x0 + (x(idx + 1) - x0) * frac / 16000L
          val a = math.abs(y)
          sum += a
          if (a > peak) peak = a
          chk += (j + 1) * y
          j += 1
        }
        Some((nOut, sum, peak, chk))
      }
    }
  }

  private def le32(v: Long): Array[Byte] = Riff.le32(v)
  private def le16(v: Int): Array[Byte] = Riff.le16(v)

  /** Minimal spec-valid WAV with silence-like deterministic samples. */
  def synthesize(rate: Int, channels: Int, bits: Int, nSamples: Int, seed: Int): Array[Byte] = {
    val bytesPerSample = bits / 8
    val data = Array.tabulate(nSamples * channels * bytesPerSample)(k => ((seed * 17 + k * 3) % 121).toByte)
    val byteRate = rate * channels * bytesPerSample
    val fmt = le16(1) ++ le16(channels) ++ le32(rate.toLong) ++ le32(byteRate.toLong) ++
      le16(channels * bytesPerSample) ++ le16(bits)
    "RIFF".getBytes("US-ASCII") ++ le32(4 + 8 + fmt.length + 8 + data.length.toLong) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(fmt.length.toLong) ++ fmt ++
      "data".getBytes("US-ASCII") ++ le32(data.length.toLong) ++ data
  }
}
