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

  /** rows: per row one value per column — java.lang.Double / String / null */
  def write(
      path: String,
      cols: Seq[WCol],
      rows: Seq[Seq[Any]],
      pageSize: Int = 8192,
      u64: Boolean = true,
      mixFirstPage: Boolean = false
  ): Unit = {
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

    // ---- column text blob: [u16 size][6B pad][name bytes...] -------------
    val nameBytes = cols.map(_.name.getBytes("ISO-8859-1"))
    val nameOffsets = nameBytes.scanLeft(8)(_ + _.length)
    val blobLen = nameOffsets.last
    require(blobLen < 0xffff, "column names too long for one text subheader")
    val textSub = {
      val b = buf(intLen + blobLen)
      b.put(sigBytes("text"))
      b.putShort(intLen, blobLen.toShort)
      b.position(intLen + 8)
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
    val rowsPerPage = (pageSize - (bitOffset + 8)) / rowLength
    require(rowsPerPage > 0, s"row of $rowLength bytes exceeds page size $pageSize")
    val dataPages = rows.drop(mixRows).grouped(rowsPerPage).map { chunk =>
      val b = buf(pageSize)
      b.putShort(bitOffset, 0x0100.toShort) // data page type
      b.putShort(bitOffset + 2, chunk.size.toShort) // block count = row count
      b.putShort(bitOffset + 4, 0.toShort)
      chunk.zipWithIndex.foreach { case (row, r) => writeRow(b, bitOffset + 8 + r * rowLength, row) }
      b.array()
    }.toSeq

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
