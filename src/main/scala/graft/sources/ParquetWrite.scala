package graft.sources

import scala.collection.mutable.ArrayBuffer

/** x286 — parquet WRITE from first principles, closing the data-plane loop
  * x282 opened: the engine emits its own storage format with zero
  * `org.apache.parquet` imports, and the pages ride the repo's own
  * from-scratch encoders — gzip via x268's DEFLATE, zstd via x279 — so a
  * graft pipeline can produce the files every warehouse reads without a
  * borrowed codec or metadata library anywhere on the write path.
  * Conformance is maximal: DuckDB's native reader adjudicates in the gate
  * (the oracle census runs over OUR bytes and must match the
  * source-derived census computed before writing), Spark's parquet-mr
  * reader and graft's own x282 scratch reader adjudicate in the spec.
  *
  * Reference behavior studied from dangkhoipham/data_engineering_capstone
  * (its outputs are parquet on S3; `dags/libs/lib.py:171-218`) — the
  * format is the public parquet-format spec.
  *
  * Shape (a valid, simple subset every conforming reader accepts):
  *   - Thrift compact-protocol WRITER (the exact inverse of x282's
  *     reader): delta-coded field headers, zigzag varints, list headers,
  *     nested structs.
  *   - Flat required/optional columns of BOOLEAN/INT32/INT64/FLOAT/
  *     DOUBLE/BYTE_ARRAY, PLAIN-encoded, v1 data pages split every
  *     [[ParquetWrite.PageValues]] values.
  *   - Definition levels (optional columns): RLE/bit-packed hybrid writer
  *     — one RLE run when the page is null-free or all-null, bit-packed
  *     groups otherwise.
  *   - Codecs: UNCOMPRESSED / GZIP (x268 from scratch) / ZSTD (x279 from
  *     scratch); per-page strictly-smaller fallback to uncompressed is
  *     not required by the spec for parquet pages (codec is declared at
  *     chunk grain), so pages compress unconditionally.
  *
  * Scale shape: one column chunk is buffered at a time (page-split, so
  * memory is bounded by PageValues·width, not rows); at cluster scale the
  * writer is the per-task leaf of a partitioned write exactly like any
  * sink — file parallelism comes from partitioning above it.
  */
object ParquetWrite {

  val PageValues = 20000

  val CodecUncompressed = 0
  val CodecGzip = 2
  val CodecZstd = 6

  // physical types (parquet-format Types)
  val TBool = 0
  val TInt32 = 1
  val TInt64 = 2
  val TFloat = 4
  val TDouble = 5
  val TBytes = 6

  /** `utf8`: annotate a BYTE_ARRAY leaf with ConvertedType UTF8 so readers
    * surface it as a string rather than raw binary. */
  final case class ColSpec(name: String, ptype: Int, optional: Boolean, utf8: Boolean = false)

  // ------------------------------------------------ thrift compact writer

  private final class TW {
    val out = new java.io.ByteArrayOutputStream(256)
    def byte(b: Int): Unit = out.write(b & 0xff)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { byte(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      byte(v.toInt)
    }
    def zig(v: Long): Unit = varint((v << 1) ^ (v >> 63))
    /** field header; returns the new lastFid */
    def field(last: Int, fid: Int, tpe: Int): Int = {
      val delta = fid - last
      if (delta >= 1 && delta <= 15) byte((delta << 4) | tpe)
      else { byte(tpe); zig(fid.toLong) }
      fid
    }
    def stop(): Unit = byte(0)
    def i32Field(last: Int, fid: Int, v: Long): Int = { val l = field(last, fid, 5); zig(v); l }
    def i64Field(last: Int, fid: Int, v: Long): Int = { val l = field(last, fid, 6); zig(v); l }
    def strField(last: Int, fid: Int, s: String): Int = {
      val l = field(last, fid, 8)
      val b = s.getBytes("UTF-8")
      varint(b.length.toLong)
      out.write(b, 0, b.length)
      l
    }
    def listHeader(size: Int, elemType: Int): Unit =
      if (size < 15) byte((size << 4) | elemType)
      else { byte((15 << 4) | elemType); varint(size.toLong) }
    def bytes: Array[Byte] = out.toByteArray
  }

  // ------------------------------------------------- level/value encoders

  /** RLE/bit-packed hybrid for definition levels (bit width 1). */
  private def hybridLevels(defs: Array[Int], from: Int, n: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(n / 8 + 8)
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { bos.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      bos.write(v.toInt)
    }
    var uniform = true
    var i = 1
    while (uniform && i < n) { uniform = defs(from + i) == defs(from); i += 1 }
    if (uniform && n > 0) {
      varint((n.toLong << 1)) // RLE run
      bos.write(defs(from)) // 1 byte for bit width 1
    } else {
      val groups = (n + 7) / 8
      varint((groups.toLong << 1) | 1) // bit-packed
      var g = 0
      while (g < groups) {
        var b = 0
        var k = 0
        while (k < 8) {
          val idx = g * 8 + k
          if (idx < n && defs(from + idx) == 1) b |= 1 << k
          k += 1
        }
        bos.write(b)
        g += 1
      }
    }
    bos.toByteArray
  }

  /** PLAIN-encode `n` non-null cells (already null-stripped). */
  private def plainValues(vals: ArrayBuffer[Any], ptype: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(vals.length * 8 + 16)
    def i32(v: Int): Unit = { bos.write(v); bos.write(v >> 8); bos.write(v >> 16); bos.write(v >> 24) }
    def i64(v: Long): Unit = { var k = 0; while (k < 8) { bos.write((v >>> (8 * k)).toInt); k += 1 } }
    ptype match {
      case TBool =>
        var acc = 0
        var nb = 0
        vals.foreach { v =>
          if (v.asInstanceOf[Boolean]) acc |= 1 << nb
          nb += 1
          if (nb == 8) { bos.write(acc); acc = 0; nb = 0 }
        }
        if (nb > 0) bos.write(acc)
      case TInt32  => vals.foreach(v => i32(v.asInstanceOf[Long].toInt))
      case TInt64  => vals.foreach(v => i64(v.asInstanceOf[Long]))
      case TFloat  => vals.foreach(v => i32(java.lang.Float.floatToIntBits(v.asInstanceOf[Float])))
      case TDouble => vals.foreach(v => i64(java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])))
      case TBytes =>
        vals.foreach { v =>
          val b = v match {
            case s: String      => s.getBytes("UTF-8")
            case a: Array[Byte] => a
          }
          i32(b.length)
          bos.write(b, 0, b.length)
        }
      case other => throw new IllegalArgumentException(s"unsupported type $other")
    }
    bos.toByteArray
  }

  private def compress(codec: Int, raw: Array[Byte]): Array[Byte] = codec match {
    case CodecUncompressed => raw
    case CodecGzip         => Deflate.gzipCompress(raw)
    case CodecZstd         => ZstdEncode.compress(raw)
    case other             => throw new IllegalArgumentException(s"unsupported codec $other")
  }

  // ------------------------------------------------------------- the file

  /** Write one parquet file (single row group) of flat columns. Cells:
    * Long (int32/int64), Double, Float, Boolean, String/Array[Byte]; null
    * only in optional columns.
    */
  def write(schema: Seq[ColSpec], rows: Seq[Array[Any]], codec: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1 << 16)
    out.write('P'); out.write('A'); out.write('R'); out.write('1')
    val nRows = rows.length

    final case class ChunkInfo(dataPageOffset: Long, totalComp: Long, totalUncomp: Long, numValues: Long)
    val chunks = schema.zipWithIndex.map { case (cs, ci) =>
      val dataPageOffset = out.size().toLong
      var totalComp = 0L
      var totalUncomp = 0L
      var done = 0
      while (done < nRows || (nRows == 0 && done == 0)) {
        val n = math.min(PageValues, nRows - done)
        val defs = new Array[Int](n)
        val vals = ArrayBuffer.empty[Any]
        var i = 0
        while (i < n) {
          val cell = rows(done + i)(ci)
          if (cell == null) {
            require(cs.optional, s"null in required column ${cs.name}")
            defs(i) = 0
          } else { defs(i) = 1; vals += cell }
          i += 1
        }
        val body = new java.io.ByteArrayOutputStream(n * 8)
        if (cs.optional) {
          val lv = hybridLevels(defs, 0, n)
          body.write(lv.length); body.write(lv.length >> 8); body.write(lv.length >> 16); body.write(lv.length >> 24)
          body.write(lv, 0, lv.length)
        }
        val pv = plainValues(vals, cs.ptype)
        body.write(pv, 0, pv.length)
        val raw = body.toByteArray
        val comp = compress(codec, raw)
        // PageHeader
        val tw = new TW
        var l = tw.i32Field(0, 1, 0L) // type = DATA_PAGE
        l = tw.i32Field(l, 2, raw.length.toLong)
        l = tw.i32Field(l, 3, comp.length.toLong)
        l = tw.field(l, 5, 12) // data_page_header
        var dl = tw.i32Field(0, 1, n.toLong)
        dl = tw.i32Field(dl, 2, 0L) // encoding PLAIN
        dl = tw.i32Field(dl, 3, 3L) // def level encoding RLE
        dl = tw.i32Field(dl, 4, 3L) // rep level encoding RLE
        tw.stop() // data_page_header
        tw.stop() // page header
        val hdr = tw.bytes
        out.write(hdr, 0, hdr.length)
        out.write(comp, 0, comp.length)
        totalComp += hdr.length + comp.length
        totalUncomp += hdr.length + raw.length
        done += n
        if (nRows == 0) done = 1 // single empty page for empty tables
      }
      ChunkInfo(dataPageOffset, totalComp, totalUncomp, nRows.toLong)
    }

    // footer
    val fw = new TW
    var l = fw.i32Field(0, 1, 1L) // version
    l = fw.field(l, 2, 9) // schema
    fw.listHeader(schema.length + 1, 12)
    locally { // root element
      var rl = fw.strField(0, 4, "schema")
      rl = fw.i32Field(rl, 5, schema.length.toLong)
      fw.stop()
    }
    schema.foreach { cs =>
      var el = fw.i32Field(0, 1, cs.ptype.toLong)
      el = fw.i32Field(el, 3, if (cs.optional) 1L else 0L)
      el = fw.strField(el, 4, cs.name)
      if (cs.ptype == TBytes && cs.utf8) el = fw.i32Field(el, 6, 0L) // ConvertedType UTF8
      fw.stop()
    }
    l = fw.i64Field(l, 3, nRows.toLong) // num_rows
    l = fw.field(l, 4, 9) // row_groups
    fw.listHeader(1, 12)
    locally {
      var rl = fw.field(0, 1, 9) // columns
      fw.listHeader(schema.length, 12)
      schema.zip(chunks).foreach { case (cs, ch) =>
        var cl = fw.i64Field(0, 2, ch.dataPageOffset) // file_offset
        cl = fw.field(cl, 3, 12) // meta_data
        var ml = fw.i32Field(0, 1, cs.ptype.toLong)
        ml = fw.field(ml, 2, 9) // encodings
        fw.listHeader(2, 5)
        fw.zig(0L) // PLAIN
        fw.zig(3L) // RLE (levels)
        ml = fw.field(ml, 3, 9) // path_in_schema
        fw.listHeader(1, 8)
        locally {
          val b = cs.name.getBytes("UTF-8")
          fw.varint(b.length.toLong)
          fw.out.write(b, 0, b.length)
        }
        ml = fw.i32Field(ml, 4, codec.toLong)
        ml = fw.i64Field(ml, 5, ch.numValues)
        ml = fw.i64Field(ml, 6, ch.totalUncomp)
        ml = fw.i64Field(ml, 7, ch.totalComp)
        ml = fw.i64Field(ml, 9, ch.dataPageOffset)
        fw.stop() // meta_data
        fw.stop() // column chunk
      }
      rl = fw.i64Field(rl, 2, chunks.map(_.totalComp).sum) // total_byte_size
      rl = fw.i64Field(rl, 3, nRows.toLong) // num_rows
      fw.stop()
    }
    l = fw.strField(l, 6, "graft x286 (from-scratch writer)")
    fw.stop()

    val footer = fw.bytes
    out.write(footer, 0, footer.length)
    val fl = footer.length
    out.write(fl); out.write(fl >> 8); out.write(fl >> 16); out.write(fl >> 24)
    out.write('P'); out.write('A'); out.write('R'); out.write('1')
    out.toByteArray
  }
}

/** x286 fixture: one deterministic 20k-row table written THREE times by the
  * from-scratch writer — uncompressed, gzip-paged (x268), zstd-paged
  * (x279). Every cell is closed-form in the row index, so the gate census
  * is computed from the FORMULAS on the engine side and from DuckDB's read
  * of OUR BYTES on the oracle side: a value corruption anywhere in the
  * writer (or its codecs) diverges the hash. Content is sf-independent;
  * the marker guards a content-version key.
  */
object ParquetWriteFixture {
  val dir = "/root/repo/spark-warehouse/graft_pq"
  val N = 20000

  import ParquetWrite._

  val schema = Seq(
    ColSpec("k", TInt64, optional = false),
    ColSpec("status", TBytes, optional = false, utf8 = true),
    ColSpec("cents", TInt64, optional = true),
    ColSpec("day", TInt64, optional = false),
    ColSpec("price", TDouble, optional = false),
    ColSpec("lineno", TInt32, optional = false),
    ColSpec("flag", TBool, optional = false),
    ColSpec("ratio", TFloat, optional = false)
  )

  def row(i: Long): Array[Any] = Array[Any](
    i,
    Seq("A", "B", "C")((i % 3).toInt),
    if (i % 7 == 0) null else i * 37 % 100000,
    8000L + i % 365,
    (i % 1000) * 0.25,
    i % 5,
    i % 3 == 0,
    (i % 128).toFloat * 0.0078125f
  )

  def ensure(): Unit = synchronized {
    val marker = new java.io.File(s"$dir/_OK_V1")
    if (!marker.exists()) {
      new java.io.File(dir).mkdirs()
      val rows = (0L until N.toLong).map(row)
      for ((codec, tag) <- Seq(CodecUncompressed -> "c0", CodecGzip -> "c2", CodecZstd -> "c6")) {
        val bytes = write(schema, rows, codec)
        java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/orders_$tag.parquet"), bytes)
      }
      marker.createNewFile()
    }
  }
}
