package graft.sources

/** Real video-container metadata extraction: ISO BMFF / MP4 files carry
  * their track dimensions and duration in the `moov` box tree
  * (`moov/mvhd` → timescale + duration, `moov/trak/tkhd` → 16.16
  * fixed-point width/height) — a pure box walk over the documented
  * structure, no decoder. Completes the image ([[ImageMeta]]) / audio
  * ([[AudioMeta]]) / video metadata triad of the multimodal first pass. */
object VideoMeta {

  final case class Meta(format: String, width: Int, height: Int, durationMs: Long)

  private def u32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) | ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def tag(b: Array[Byte], o: Int): String = new String(b, o, 4, "US-ASCII")

  /** Find a top-level-relative box path; returns payload offset. */
  private def findBox(b: Array[Byte], from: Int, until: Int, name: String): Option[(Int, Int)] = {
    var i = from
    while (i + 8 <= until) {
      val size = u32be(b, i)
      if (size < 8 || i + size > until) return None // malformed/64-bit sizes unsupported
      if (tag(b, i + 4) == name) return Some((i + 8, i + size.toInt))
      i += size.toInt
    }
    None
  }

  def parse(b: Array[Byte]): Option[Meta] = {
    if (b.length < 16 || tag(b, 4) != "ftyp") return None
    for {
      (moovS, moovE) <- findBox(b, 0, b.length, "moov")
      (mvhdS, _) <- findBox(b, moovS, moovE, "mvhd")
      (trakS, trakE) <- findBox(b, moovS, moovE, "trak")
      (tkhdS, tkhdE) <- findBox(b, trakS, trakE, "tkhd")
    } yield {
      // mvhd v0: ver/flags(4) ctime(4) mtime(4) timescale(4) duration(4)
      val timescale = u32be(b, mvhdS + 12)
      val duration = u32be(b, mvhdS + 16)
      val durMs = if (timescale > 0) duration * 1000L / timescale else 0L
      // tkhd v0: ver/flags(4) ctime(4) mtime(4) trackid(4) resv(4)
      // duration(4) resv(8) layer(2) alt(2) vol(2) resv(2) matrix(36)
      // width(4, 16.16) height(4, 16.16)
      val wOfs = tkhdS + 4 + 4 + 4 + 4 + 4 + 4 + 8 + 2 + 2 + 2 + 2 + 36
      val (w, h) =
        if (wOfs + 8 <= tkhdE) ((u32be(b, wOfs) >> 16).toInt, (u32be(b, wOfs + 4) >> 16).toInt)
        else (0, 0)
      Meta("video/mp4", w, h, durMs)
    }
  }

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def box(name: String, payload: Array[Byte]): Array[Byte] =
    be32(8L + payload.length) ++ name.getBytes("US-ASCII") ++ payload

  /** Minimal spec-valid MP4: ftyp + moov(mvhd, trak(tkhd)) + mdat. */
  def synthesize(w: Int, h: Int, durationMs: Long, junk: Int, seed: Int): Array[Byte] = {
    val timescale = 1000L
    val mvhd = box(
      "mvhd",
      be32(0L) ++ be32(0L) ++ be32(0L) ++ be32(timescale) ++ be32(durationMs * timescale / 1000L) ++
        be32(0x00010000L) ++ Array.fill[Byte](70)(0)
    )
    val tkhd = box(
      "tkhd",
      be32(7L) ++ be32(0L) ++ be32(0L) ++ be32(1L) ++ be32(0L) ++ be32(durationMs) ++
        Array.fill[Byte](8)(0) ++ Array.fill[Byte](8)(0) ++ // resv + layer/alt/vol/resv
        (be32(0x00010000L) ++ be32(0L) ++ be32(0L) ++ be32(0L) ++ be32(0x00010000L) ++ be32(0L) ++
          be32(0L) ++ be32(0L) ++ be32(0x40000000L)) ++ // identity matrix
        be32(w.toLong << 16) ++ be32(h.toLong << 16)
    )
    val body = Array.tabulate(junk)(k => ((seed * 13 + k * 11) % 127).toByte)
    box("ftyp", "isom".getBytes("US-ASCII") ++ be32(512L) ++ "isomiso2".getBytes("US-ASCII")) ++
      box("moov", mvhd ++ box("trak", tkhd)) ++
      box("mdat", body)
  }
}
