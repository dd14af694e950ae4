package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal SAS7BDAT writer — the subset [[Sas7bdat]] reads: uncompressed,
  * little-endian, 64-bit (default) or 32-bit layout, numeric (8-byte
  * double) and character columns; metadata on page 1 (optionally a MIX
  * page carrying the first rows), pure DATA pages after.
  *
  * Exists so the engine can (a) generate deterministic fixtures for the S3
  * scan path without the reference's (absent) binary, and (b) act as a SAS
  * interchange sink. Conformance is validated against an INDEPENDENT
  * implementation — scripts/check_sas7bdat.py reads graft-written files
  * with pandas.read_sas and diffs every value — so reader and writer can't
  * simply agree on a shared mistake.
  *
  * Format limitation (inherent to sas7bdat): char cells are blank-padded,
  * so trailing spaces and the empty-vs-missing distinction don't survive.
  */
object Sas7bdatWriter {

  final case class WCol(name: String, isNum: Boolean, width: Int)

  private def buf(n: Int): ByteBuffer = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

  /** SAS RLE (SASYZCRL) encoder — the exact inverse of
    * [[Sas7bdat.rleDecompress]]'s command table. Deliberately uses EVERY
    * command the format defines (long/short literal copies, long/short
    * runs of arbitrary bytes, and the dedicated space/NUL/'@' run forms) so
    * that one fixture exercises the full decoder surface and the pandas
    * cross-check can falsify any length constant. */
  def rleCompress(row: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(row.length)
    def literal(src: Array[Byte], from: Int, until: Int): Unit = {
      var s = from
      while (s < until) {
        val len = math.min(until - s, 4159)
        if (len <= 64) out.write(0x80 + (len - 1)) // 0x80–0xBF short copy
        else { val v = len - 64; out.write(v >> 8); out.write(v & 0xff) } // 0x0 long copy
        out.write(src, s, len); s += len
      }
    }
    def runChunk(x: Byte, t: Int): Unit = (x: @annotation.switch) match {
      case 0x20 =>
        if (t <= 17) out.write(0xe0 | (t - 2))
        else { val v = t - 17; out.write(0x60 | (v >> 8)); out.write(v & 0xff) }
      case 0x00 =>
        if (t <= 17) out.write(0xf0 | (t - 2))
        else { val v = t - 17; out.write(0x70 | (v >> 8)); out.write(v & 0xff) }
      case 0x40 =>
        if (t <= 17) out.write(0xd0 | (t - 2))
        else { val v = t - 18; out.write(0x40 | (v >> 8)); out.write(v & 0xff); out.write(0x40) }
      case _ =>
        if (t <= 18) { out.write(0xc0 | (t - 3)) }
        else { val v = t - 18; out.write(0x40 | (v >> 8)); out.write(v & 0xff) }
        out.write(x & 0xff)
    }
    var i = 0
    var litStart = 0
    val n = row.length
    while (i < n) {
      var j = i + 1
      while (j < n && row(j) == row(i)) j += 1
      val run = j - i
      val x = row(i)
      val special = x == 0x20 || x == 0x00 || x == 0x40
      val minRun = if (special) 2 else 3
      if (run >= minRun) {
        literal(row, litStart, i)
        var r = run
        val maxLong = if (special) { if (x == 0x40) 4113 else 4112 } else 4113
        while (r > 0) {
          var t = math.min(r, maxLong)
          // keep the remainder encodable: never leave < minRun behind
          val rem = r - t
          if (rem > 0 && rem < minRun) t -= (minRun - rem)
          runChunk(x, t); r -= t
        }
        litStart = j
      }
      i = j
    }
    literal(row, litStart, n)
    out.toByteArray
  }

  /** rows: per row one value per column — java.lang.Double / String / null */
  def write(
      path: String,
      cols: Seq[WCol],
      rows: Seq[Seq[Any]],
      pageSize: Int = 8192,
      u64: Boolean = true,
      mixFirstPage: Boolean = false,
      compressRle: Boolean = false
  ): Unit = {
    require(!(compressRle && mixFirstPage), "RLE files carry rows in subheaders, not mix pages")
    val headerSize = 8192
    val n = cols.size
    val intLen = if (u64) 8 else 4
    val bitOffset = if (u64) 32 else 16
    val ptrLen = if (u64) 24 else 12
    val widths = cols.map(c => if (c.isNum) 8 else math.max(1, c.width))
    val offsets = widths.scanLeft(0)(_ + _)
    val rowLength = offsets.last

    // explicit signatures straight from the public signature table
    def sigBytes(kind: String): Array[Byte] = {
      val m32 = Map(
        "rowsize" -> Array(0xf7, 0xf7, 0xf7, 0xf7),
        "colsize" -> Array(0xf6, 0xf6, 0xf6, 0xf6),
        "text" -> Array(0xfd, 0xff, 0xff, 0xff),
        "name" -> Array(0xff, 0xff, 0xff, 0xff),
        "attr" -> Array(0xfc, 0xff, 0xff, 0xff),
        "format" -> Array(0xfe, 0xfb, 0xff, 0xff)
      )
      val m64ext = Map(
        "rowsize" -> Array(0x00, 0x00, 0x00, 0x00),
        "colsize" -> Array(0x00, 0x00, 0x00, 0x00),
        "text" -> Array(0xff, 0xff, 0xff, 0xff),
        "name" -> Array(0xff, 0xff, 0xff, 0xff),
        "attr" -> Array(0xff, 0xff, 0xff, 0xff),
        "format" -> Array(0xff, 0xff, 0xff, 0xff)
      )
      ((if (u64) m32(kind) ++ m64ext(kind) else m32(kind)).map(_.toByte))
    }

    // ---- column text blob: [u16 size][6B pad][compression literal if any]
    // [name bytes...] — readers (pandas, parso, graft) detect compression
    // by finding "SASYZCRL" anywhere in the FIRST text blob
    val literal = if (compressRle) "SASYZCRL".getBytes("US-ASCII") else Array.emptyByteArray
    val nameBytes = cols.map(_.name.getBytes("ISO-8859-1"))
    val nameOffsets = nameBytes.scanLeft(8 + literal.length)(_ + _.length)
    val blobLen = nameOffsets.last
    require(blobLen < 0xffff, "column names too long for one text subheader")
    val textSub = {
      val b = buf(intLen + blobLen)
      b.put(sigBytes("text"))
      b.putShort(intLen, blobLen.toShort)
      b.position(intLen + 8)
      b.put(literal)
      nameBytes.foreach(b.put)
      b.array()
    }

    // exact metadata footprint → how many rows fit on a mix first page.
    // Content is packed from the page END downward (real SAS layout); mix
    // rows sit right after the 8-aligned pointer array.
    val subLengths = Seq(if (u64) 808 else 480, 3 * intLen, intLen + blobLen,
      2 * intLen + 12 + 8 * n, 2 * intLen + 12 + 8 + (intLen + 8) * n) ++ Seq.fill(n)(64)
    val ptrEnd = bitOffset + 8 + ptrLen * subLengths.size
    val mixRowStart = ptrEnd + (8 - ptrEnd % 8) % 8
    require(mixRowStart + subLengths.sum <= pageSize, "metadata exceeds one page")
    val mixRows =
      if (mixFirstPage) math.max(0, (pageSize - subLengths.sum - mixRowStart) / rowLength).min(rows.size) else 0

    val rowSizeSub = {
      val b = buf(if (u64) 808 else 480)
      b.put(sigBytes("rowsize"))
      b.position(0)
      def putInt_(off: Int, v: Long): Unit = if (u64) b.putLong(off, v) else b.putInt(off, v.toInt)
      putInt_(5 * intLen, rowLength.toLong)
      putInt_(6 * intLen, rows.size.toLong)
      putInt_(9 * intLen, n.toLong) // col count p1
      putInt_(10 * intLen, 0L) // col count p2
      putInt_(15 * intLen, mixRows.toLong) // rows on the mix page
      b.array() // lcs/lcp (682/706 u64, 354/378 x86) stay 0
    }

    val colSizeSub = {
      val b = buf(3 * intLen)
      b.put(sigBytes("colsize"))
      if (u64) b.putLong(intLen, n.toLong) else b.putInt(intLen, n)
      b.array()
    }

    val colNameSub = {
      val b = buf(2 * intLen + 12 + 8 * n) // (len - 2*intLen - 12) / 8 == n
      b.put(sigBytes("name"))
      for (j <- 0 until n) {
        val e = intLen + 8 * (j + 1)
        b.putShort(e, 0.toShort) // text subheader index
        b.putShort(e + 2, nameOffsets(j).toShort)
        b.putShort(e + 4, nameBytes(j).length.toShort)
      }
      b.array()
    }

    val colAttrSub = {
      val b = buf(2 * intLen + 12 + 8 + (intLen + 8) * n)
      b.put(sigBytes("attr"))
      for (j <- 0 until n) {
        val e = intLen + 8 + (intLen + 8) * j
        if (u64) b.putLong(e, offsets(j).toLong) else b.putInt(e, offsets(j))
        b.putInt(e + intLen, widths(j))
        b.put(e + intLen + 6, if (cols(j).isNum) 1.toByte else 2.toByte)
      }
      b.array()
    }

    val formatSub = {
      val b = buf(64) // pandas reads u16 refs at 3*intLen + 22..32; zeros → empty format/label
      b.put(sigBytes("format"))
      b.array()
    }

    val subs: Seq[Array[Byte]] = Seq(rowSizeSub, colSizeSub, textSub, colNameSub, colAttrSub) ++
      Seq.fill(n)(formatSub)

    def writeRow(b: ByteBuffer, base: Int, row: Seq[Any]): Unit =
      row.zipWithIndex.foreach { case (v, j) =>
        if (cols(j).isNum)
          b.putDouble(base + offsets(j), v match {
            case null => java.lang.Double.NaN // SAS missing
            case d: java.lang.Double => d.doubleValue()
            case x: Any => x.toString.toDouble
          })
        else {
          val s = v match { case null => ""; case x: Any => x.toString }
          val raw = s.getBytes("ISO-8859-1").take(widths(j))
          val padded = raw ++ Array.fill(widths(j) - raw.length)(' '.toByte)
          b.position(base + offsets(j)); b.put(padded)
        }
      }

    // ---- page 1: meta (or mix) page --------------------------------------
    val metaPage = {
      val b = buf(pageSize)
      b.putShort(bitOffset, (if (mixFirstPage) 0x0200 else 0x0000).toShort)
      b.putShort(bitOffset + 2, (subs.size + mixRows).toShort) // block count
      b.putShort(bitOffset + 4, subs.size.toShort) // subheader count
      // positions: sub i occupies [pageSize - cum(len_0..i), previous start)
      val positions = subs.map(_.length).scanLeft(pageSize)(_ - _).tail
      subs.zipWithIndex.foreach { case (sub, i) =>
        val pos = positions(i)
        val p = bitOffset + 8 + ptrLen * i
        if (u64) { b.putLong(p, pos.toLong); b.putLong(p + 8, sub.length.toLong) }
        else { b.putInt(p, pos); b.putInt(p + 4, sub.length) }
        // compression byte and type byte after the two ints stay 0
        b.position(pos); b.put(sub)
      }
      require(positions.last >= mixRowStart + mixRows * rowLength, "mix rows overlap subheaders")
      rows.take(mixRows).zipWithIndex.foreach { case (row, r) =>
        writeRow(b, mixRowStart + r * rowLength, row)
      }
      b.array()
    }

    // ---- data pages ------------------------------------------------------
    val dataPages: Seq[Array[Byte]] =
      if (!compressRle) {
        val rowsPerPage = (pageSize - (bitOffset + 8)) / rowLength
        require(rowsPerPage > 0, s"row of $rowLength bytes exceeds page size $pageSize")
        rows.drop(mixRows).grouped(rowsPerPage).map { chunk =>
          val b = buf(pageSize)
          b.putShort(bitOffset, 0x0100.toShort) // data page type
          b.putShort(bitOffset + 2, chunk.size.toShort) // block count = row count
          b.putShort(bitOffset + 4, 0.toShort)
          chunk.zipWithIndex.foreach { case (row, r) => writeRow(b, bitOffset + 8 + r * rowLength, row) }
          b.array()
        }.toSeq
      } else {
        // RLE layout: rows ride META pages, one signature-less subheader per
        // row — pointer compression 4 when compressed, 0 when the row didn't
        // shrink and is stored raw (readers decompress iff len < rowLength)
        val blobs: Seq[(Array[Byte], Int)] = rows.map { row =>
          val b = buf(rowLength); writeRow(b, 0, row)
          val raw = b.array()
          val comp = rleCompress(raw)
          if (comp.length < rowLength) (comp, 4) else (raw, 0)
        }
        // greedy pack: pointer array grows from the top, payloads from the end
        val pages = scala.collection.mutable.ArrayBuffer.empty[Seq[(Array[Byte], Int)]]
        var cur = Vector.empty[(Array[Byte], Int)]
        var used = 0
        blobs.foreach { case (blob, comp) =>
          val need = ptrLen + blob.length
          // + intLen slack: readers fetch an intLen signature at every
          // pointer offset, so the topmost payload must not end flush with
          // the page (pandas raises "cached page is too small" otherwise)
          if (cur.nonEmpty && bitOffset + 8 + used + need + intLen > pageSize) {
            pages += cur; cur = Vector.empty; used = 0
          }
          require(bitOffset + 8 + ptrLen + blob.length + intLen <= pageSize, "row exceeds page size even compressed")
          cur :+= ((blob, comp)); used += need
        }
        if (cur.nonEmpty) pages += cur
        pages.toSeq.map { subs =>
          val b = buf(pageSize)
          b.putShort(bitOffset, 0x0000.toShort) // meta page type
          b.putShort(bitOffset + 2, subs.size.toShort)
          b.putShort(bitOffset + 4, subs.size.toShort)
          // top payload sits intLen short of the page end (signature slack)
          val positions = subs.map(_._1.length).scanLeft(pageSize - intLen)(_ - _).tail
          subs.zipWithIndex.foreach { case ((blob, comp), i) =>
            val p = bitOffset + 8 + ptrLen * i
            if (u64) { b.putLong(p, positions(i).toLong); b.putLong(p + 8, blob.length.toLong) }
            else { b.putInt(p, positions(i)); b.putInt(p + 4, blob.length) }
            b.put(p + 2 * intLen, comp.toByte)
            b.put(p + 2 * intLen + 1, 1.toByte) // data subheader type
            b.position(positions(i)); b.put(blob)
          }
          b.array()
        }
      }

    // ---- header ----------------------------------------------------------
    val align1 = if (u64) 4 else 0
    val header = {
      val b = buf(headerSize)
      b.put(Sas7bdat.Magic)
      b.put(32, (if (u64) '3' else '2').toByte)
      b.put(35, (if (u64) '3' else '2').toByte)
      b.put(37, 0x01.toByte) // little-endian
      b.put(39, '1'.toByte) // unix
      b.put(70, 20.toByte) // utf-8
      b.position(84); b.put("SAS FILE".getBytes("US-ASCII"))
      b.position(92); b.put("GRAFT".padTo(64, ' ').getBytes("US-ASCII"))
      b.position(156); b.put("DATA    ".getBytes("US-ASCII"))
      b.putDouble(164 + align1, 2.0e9) // created
      b.putDouble(172 + align1, 2.0e9) // modified
      b.putInt(196 + align1, headerSize)
      b.putInt(200 + align1, pageSize)
      b.putInt(204 + align1, 1 + dataPages.size) // page count (4 bytes)
      b.position(216 + 2 * align1); b.put("9.0401M2".getBytes("US-ASCII"))
      b.position(224 + 2 * align1); b.put("Linux".padTo(16, ' ').getBytes("US-ASCII"))
      b.array()
    }

    val out = new BufferedOutputStream(new FileOutputStream(path))
    try { out.write(header); out.write(metaPage); dataPages.foreach(out.write) }
    finally out.close()
  }
}
