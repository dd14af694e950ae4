package graft.sources

/** Shared RIFF/WAVE plumbing for the audio codecs ([[AudioMeta]],
  * [[AdpcmAudio]], [[G711Audio]]): little-endian readers/writers, the
  * strict fmt/data/fact chunk walk, and container assembly — extracted
  * after the third verbatim copy (review-found), which is also how the
  * offset-overflow hazard below had propagated.
  *
  * The walk rejects (None) any chunk whose declared length exceeds the
  * bytes remaining: that is both the structural-lie discipline (a chunk
  * cannot outrun its file) and the Int-overflow guard — a near-2^31
  * declared length would wrap `i + 8 + len + pad` negative and turn the
  * quarantine contract into an executor-side IndexOutOfBounds.
  */
private[sources] object Riff {

  def u16le(b: Array[Byte], o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) | ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  def tag(b: Array[Byte], o: Int): String = new String(b, o, 4, "US-ASCII")

  def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Full strict chunk walk → (fmtOfs, dataOfs, dataLen, factSamples);
    * factSamples is −1 when no fact chunk is present. None on a missing
    * RIFF/WAVE preamble, a missing fmt or data chunk, or any chunk whose
    * declared length exceeds the remaining bytes. */
  def walk(b: Array[Byte]): Option[(Int, Int, Long, Long)] = {
    if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var i = 12
    var fmtOfs = -1; var dataOfs = -1; var dataLen = -1L; var factSamples = -1L
    while (i + 8 <= b.length) {
      val id = tag(b, i)
      val len = u32le(b, i + 4)
      if (len > b.length - (i + 8)) return None // structural lie + overflow guard
      if (id == "fmt ") fmtOfs = i + 8
      else if (id == "data") { dataOfs = i + 8; dataLen = len }
      else if (id == "fact" && len >= 4) factSamples = u32le(b, i + 8)
      i += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    if (fmtOfs < 0 || dataOfs < 0) None else Some((fmtOfs, dataOfs, dataLen, factSamples))
  }

  /** Minimal WAV container: fmt chunk, optional fact chunk, data chunk —
    * byte-identical to the layout the per-codec synthesizers emitted. */
  def container(fmt: Array[Byte], fact: Option[Array[Byte]], payload: Array[Byte]): Array[Byte] = {
    val factPart = fact
      .map(f => "fact".getBytes("US-ASCII") ++ le32(f.length.toLong) ++ f)
      .getOrElse(Array.emptyByteArray)
    "RIFF".getBytes("US-ASCII") ++
      le32(4L + 8 + fmt.length + factPart.length + 8 + payload.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(fmt.length.toLong) ++ fmt ++
      factPart ++
      "data".getBytes("US-ASCII") ++ le32(payload.length.toLong) ++ payload
  }
}
