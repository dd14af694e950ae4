package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal SAS7BDAT writer — the subset [[Sas7bdat]] reads: uncompressed,
  * 64-bit little-endian, numeric (8-byte double) and character columns,
  * one metadata page followed by pure data pages.
  *
  * Exists so the engine can (a) generate a deterministic fixture for the S3
  * scan path without the reference's (absent) binary, and (b) act as a SAS
  * interchange sink. Conformance is validated against an INDEPENDENT
  * implementation — scripts/check_sas7bdat.py reads graft-written files
  * with pandas.read_sas and diffs every value — so reader and writer can't
  * simply agree on a shared mistake.
  */
object Sas7bdatWriter {

  final case class WCol(name: String, isNum: Boolean, width: Int)

  private def buf(n: Int): ByteBuffer = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)

  /** rows: per row one value per column — java.lang.Double / String / null */
  def write(path: String, cols: Seq[WCol], rows: Seq[Seq[Any]], pageSize: Int = 8192): Unit = {
    val headerSize = 8192
    val n = cols.size
    val widths = cols.map(c => if (c.isNum) 8 else math.max(1, c.width))
    val offsets = widths.scanLeft(0)(_ + _)
    val rowLength = offsets.last
    val bitOffset = 32
    val ptrLen = 24

    // ---- column text blob: [u16 size][6B pad][name bytes...] -------------
    val nameBytes = cols.map(_.name.getBytes("ISO-8859-1"))
    val nameOffsets = nameBytes.scanLeft(8)(_ + _.length)
    val blobLen = nameOffsets.last
    require(blobLen < 0xffff, "column names too long for one text subheader")
    val textSub = {
      val b = buf(8 + blobLen)
      b.put(Array(0xfd, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff).map(_.toByte)) // signature
      b.putShort(blobLen.toShort)
      b.position(8 + 8)
      nameBytes.foreach(b.put)
      b.array()
    }

    val rowSizeSub = {
      val b = buf(808)
      b.put(Array(0xf7, 0xf7, 0xf7, 0xf7, 0, 0, 0, 0).map(_.toByte))
      b.putLong(40, rowLength.toLong)
      b.putLong(48, rows.size.toLong)
      b.putLong(72, n.toLong) // col count p1
      b.putLong(80, 0L) // col count p2
      b.putLong(120, 0L) // rows on mix page (none: we write pure data pages)
      b.array() // lcs@682 / lcp@706 stay 0
    }

    val colSizeSub = {
      val b = buf(24)
      b.put(Array(0xf6, 0xf6, 0xf6, 0xf6, 0, 0, 0, 0).map(_.toByte))
      b.putLong(8, n.toLong)
      b.array()
    }

    val colNameSub = {
      val b = buf(28 + 8 * n) // (len - 2*8 - 12) / 8 == n
      b.put(Array.fill(8)(0xff.toByte))
      for (j <- 0 until n) {
        val e = 16 + 8 * j
        b.putShort(e, 0.toShort) // text subheader index
        b.putShort(e + 2, nameOffsets(j).toShort)
        b.putShort(e + 4, nameBytes(j).length.toShort)
      }
      b.array()
    }

    val colAttrSub = {
      val b = buf(28 + 16 * n) // (len - 2*8 - 12) / (8+8) == n
      b.put(Array(0xfc, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff).map(_.toByte))
      for (j <- 0 until n) {
        val e = 16 + 16 * j
        b.putLong(e, offsets(j).toLong)
        b.putInt(e + 8, widths(j))
        b.put(e + 14, if (cols(j).isNum) 1.toByte else 2.toByte)
      }
      b.array()
    }

    val formatSub = {
      val b = buf(64)
      b.put(Array(0xfe, 0xfb, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff).map(_.toByte))
      b.array() // all refs zero → empty format/label
    }

    val subs: Seq[Array[Byte]] = Seq(rowSizeSub, colSizeSub, textSub, colNameSub, colAttrSub) ++
      Seq.fill(n)(formatSub)

    // ---- meta page -------------------------------------------------------
    val metaPage = {
      val b = buf(pageSize)
      b.putShort(bitOffset, 0x0000.toShort) // meta page type
      b.putShort(bitOffset + 2, subs.size.toShort) // block count
      b.putShort(bitOffset + 4, subs.size.toShort) // subheader count
      var content = bitOffset + 8 + ptrLen * subs.size
      content += (8 - content % 8) % 8
      subs.zipWithIndex.foreach { case (s, i) =>
        require(content + s.length <= pageSize, "metadata exceeds one page")
        val p = bitOffset + 8 + ptrLen * i
        b.putLong(p, content.toLong)
        b.putLong(p + 8, s.length.toLong)
        // compression byte (p+16) and type byte (p+17) stay 0
        b.position(content); b.put(s)
        content += s.length
      }
      b.array()
    }

    // ---- data pages ------------------------------------------------------
    val rowsPerPage = (pageSize - (bitOffset + 8)) / rowLength
    require(rowsPerPage > 0, s"row of $rowLength bytes exceeds page size $pageSize")
    val dataPages = rows.grouped(rowsPerPage).map { chunk =>
      val b = buf(pageSize)
      b.putShort(bitOffset, 0x0100.toShort) // data page type
      b.putShort(bitOffset + 2, chunk.size.toShort) // block count = row count
      b.putShort(bitOffset + 4, 0.toShort)
      chunk.zipWithIndex.foreach { case (row, r) =>
        val base = bitOffset + 8 + r * rowLength
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
      }
      b.array()
    }.toSeq

    // ---- header ----------------------------------------------------------
    val header = {
      val b = buf(headerSize)
      b.put(Sas7bdat.Magic)
      b.put(32, '3'.toByte) // u64
      b.put(35, '3'.toByte) // align1 = 4
      b.put(37, 0x01.toByte) // little-endian
      b.put(39, '1'.toByte) // unix
      b.put(70, 20.toByte) // utf-8
      b.position(84); b.put("SAS FILE".getBytes("US-ASCII"))
      b.position(92); b.put("GRAFT".padTo(64, ' ').getBytes("US-ASCII"))
      b.position(156); b.put("DATA    ".getBytes("US-ASCII"))
      b.putDouble(168, 2.0e9) // created (+align1)
      b.putDouble(176, 2.0e9) // modified
      b.putInt(200, headerSize) // header size (+align1)
      b.putInt(204, pageSize) // page size (+align1)
      b.putLong(208, (1 + dataPages.size).toLong) // page count (+align1)
      b.position(224); b.put("9.0401M2".getBytes("US-ASCII")) // release (+8)
      b.position(232); b.put("Linux".padTo(16, ' ').getBytes("US-ASCII"))
      b.array()
    }

    val out = new BufferedOutputStream(new FileOutputStream(path))
    try { out.write(header); out.write(metaPage); dataPages.foreach(out.write) }
    finally out.close()
  }
}
