package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Read-only SAS7BDAT source (SURVEY.md §2.1 S3 — the reference's actual
  * ingest format, `spark.read.format('com.github.saurfang.sas.spark')` in
  * notebook cell 5).
  *
  * Format knowledge comes from the public descriptions of the sas7bdat
  * binary layout (the community-reverse-engineered spec implemented by
  * pandas `io/sas/sas7bdat.py` and epam/parso). Supported subset:
  * uncompressed pages, little-endian, both 32- and 64-bit layouts, numeric
  * (possibly truncated 3–8 byte doubles) and character columns — enough
  * for SAS exports like the reference's I94 extract. Compressed files
  * (SASYZCRL/SASYZCR2 literals) are rejected with a clear error.
  *
  * Scale design: sas7bdat is page-structured with a fixed page size, so the
  * file IS block-splittable once the metadata subheaders (page 1..k) are
  * parsed. The driver reads just the header + meta/mix pages to assemble
  * the column layout, then executors each seek to their own page range and
  * decode rows — no whole-file driver read, parallelism = page count.
  * Validated against an independent implementation: scripts/
  * check_sas7bdat.py round-trips graft-written fixtures through
  * pandas.read_sas and diffs values.
  */
object Sas7bdat {

  val Magic: Array[Byte] = Array(
    0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0xc2, 0xea, 0x81, 0x60, 0xb3, 0x14, 0x11,
    0xcf, 0xbd, 0x92, 0x08, 0x00, 0x09, 0xc7, 0x31, 0x8c, 0x18, 0x1f, 0x10, 0x11
  ).map(_.toByte)

  final case class SasCol(name: String, isNum: Boolean, offset: Int, length: Int)

  final case class SasMeta(
      u64: Boolean,
      headerSize: Int,
      pageSize: Int,
      pageCount: Long,
      rowLength: Int,
      rowCount: Long,
      mixPageRowCount: Long,
      cols: Vector[SasCol],
      rle: Boolean = false
  ) {
    def intLen: Int = if (u64) 8 else 4
    def bitOffset: Int = if (u64) 32 else 16
    def ptrLen: Int = if (u64) 24 else 12
  }

  // little-endian readers over a byte array
  private def u16(b: Array[Byte], o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) | ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def u64v(b: Array[Byte], o: Int): Long =
    (0 until 8).map(i => (b(o + i) & 0xffL) << (8 * i)).reduce(_ | _)
  private def uint(b: Array[Byte], o: Int, len: Int): Long =
    if (len == 8) u64v(b, o) else if (len == 4) u32(b, o) else if (len == 2) u16(b, o) else b(o) & 0xffL

  /** numeric cell: SAS may truncate doubles to 3–8 bytes keeping the MOST
    * significant end; little-endian → left-pad zero bytes. NaN = missing. */
  private def numCell(b: Array[Byte], o: Int, len: Int): java.lang.Double = {
    var bits = 0L
    val pad = 8 - len
    var i = 0
    while (i < len) { bits |= (b(o + i) & 0xffL) << (8 * (pad + i)); i += 1 }
    val d = java.lang.Double.longBitsToDouble(bits)
    if (java.lang.Double.isNaN(d)) null else java.lang.Double.valueOf(d)
  }

  /** SAS RLE ("SASYZCRL" / COMPRESS=CHAR) decompression. Control byte =
    * [4-bit command | 4-bit length nibble]; semantics follow the
    * community-reverse-engineered table implemented by pandas
    * `sas.pyx::rle_decompress` and parso's CharDecompressor (both public).
    * Commands: 0x0 long literal copy (+64), 0x4 long single-byte run (+18),
    * 0x6/0x7 long space/NUL runs (+17), 0x8–0xB short literal copies
    * (+1/+17/+33/+49), 0xC short byte run (+3), 0xD/0xE/0xF short
    * '@'/space/NUL runs (+2). Conformance is pinned empirically: the writer
    * emits fixtures exercising EVERY command and scripts/check_sas7bdat.py
    * diffs pandas.read_sas output value-by-value, so an off-by-one in any
    * length constant fails loudly rather than round-tripping. */
  def rleDecompress(src: Array[Byte], srcOff: Int, srcLen: Int, outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var ip = srcOff
    val end = srcOff + srcLen
    var rp = 0
    def copy(n: Int): Unit = { System.arraycopy(src, ip, out, rp, n); ip += n; rp += n }
    def fill(x: Byte, n: Int): Unit = { java.util.Arrays.fill(out, rp, rp + n, x); rp += n }
    while (ip < end) {
      val ctrl = src(ip) & 0xf0
      val nib = src(ip) & 0x0f
      ip += 1
      ctrl match {
        case 0x00 => val n = (nib << 8) + (src(ip) & 0xff) + 64; ip += 1; copy(n)
        case 0x40 =>
          val n = (nib << 8) + (src(ip) & 0xff) + 18; ip += 1
          val x = src(ip); ip += 1; fill(x, n)
        case 0x60 => val n = (nib << 8) + (src(ip) & 0xff) + 17; ip += 1; fill(0x20, n)
        case 0x70 => val n = (nib << 8) + (src(ip) & 0xff) + 17; ip += 1; fill(0x00, n)
        case 0x80 | 0x90 | 0xa0 | 0xb0 => copy(nib + 1 + (ctrl - 0x80))
        case 0xc0 => val x = src(ip); ip += 1; fill(x, nib + 3)
        case 0xd0 => fill(0x40, nib + 2)
        case 0xe0 => fill(0x20, nib + 2)
        case 0xf0 => fill(0x00, nib + 2)
        case c => throw new IllegalArgumentException(f"sas7bdat RLE: unknown control byte 0x$c%02x")
      }
    }
    require(rp == outLen, s"sas7bdat RLE: decompressed $rp bytes, expected $outLen")
    out
  }

  private def strCell(b: Array[Byte], o: Int, len: Int): String = {
    var end = o + len
    while (end > o && (b(end - 1) == ' '.toByte || b(end - 1) == 0)) end -= 1
    if (end == o) null else new String(b, o, end - o, "ISO-8859-1")
  }

  // subheader signature → kind (little-endian byte sequences, both widths)
  private val RowSizeSig = Set("f7f7f7f7", "f7f7f7f700000000")
  private val ColSizeSig = Set("f6f6f6f6", "f6f6f6f600000000")
  private val ColTextSig = Set("fdffffff", "fdffffffffffffff")
  private val ColNameSig = Set("ffffffff", "ffffffffffffffff")
  private val ColAttrSig = Set("fcffffff", "fcffffffffffffff")
  // remaining public metadata signatures (subheader counts, format/label,
  // column list) — needed to tell metadata apart from compressed row
  // subheaders, which carry NO signature (pandas: unknown signature +
  // pointer type 1 ⇒ data row)
  private val OtherMetaSig = Set(
    "00fcffff", "00fcffffffffffff", // subheader counts
    "fefbffff", "fefbffffffffffff", // column format/label
    "feffffff", "feffffffffffffff" // column list
  )
  private val MetaSigs: Set[String] =
    RowSizeSig ++ ColSizeSig ++ ColTextSig ++ ColNameSig ++ ColAttrSig ++ OtherMetaSig
  private def hex(b: Array[Byte], o: Int, len: Int): String =
    (o until o + len).map(i => f"${b(i) & 0xff}%02x").mkString

  /** Parse header + metadata pages. `readAt(pos, len)` is any positioned
    * reader (driver-side: Hadoop FSDataInputStream). */
  def parseMeta(readAt: (Long, Int) => Array[Byte]): SasMeta = {
    val head = readAt(0L, 288)
    require(head.take(32).sameElements(Magic), "not a sas7bdat file (magic mismatch)")
    val u64 = head(32) == '3'.toByte
    val align1 = if (head(35) == '3'.toByte) 4 else 0
    require(head(37) == 0x01.toByte, "big-endian sas7bdat not supported")
    val intLen = if (u64) 8 else 4
    val headerSize = u32(head, 196 + align1).toInt
    val pageSize = u32(head, 200 + align1).toInt
    val pageCount = u32(head, 204 + align1) // 4 bytes even in u64 files (pandas convention)

    var rowLength, mixRows = 0L
    var rowCount = -1L
    var colCount = -1
    var rle = false
    var textBlobs = Vector.empty[Array[Byte]]
    var names = Vector.empty[String]
    var attrs = Vector.empty[(Int, Int, Boolean)] // offset, length, isNum
    val bitOffset = if (u64) 32 else 16
    val ptrLen = if (u64) 24 else 12

    var page = 0L
    while (page < pageCount && (rowCount < 0 || colCount < 0 || names.size < colCount || attrs.size < colCount)) {
      val pg = readAt(headerSize + page * pageSize, pageSize)
      // page type masked like pandas (mask2 = 0xFF00); metadata subheaders
      // live on meta (0x0000/0x4000), mix (0x0200) and amd (0x0400) pages
      val ptype = u16(pg, bitOffset) & 0xff00
      if (ptype == 0x0000 || ptype == 0x4000 || ptype == 0x0200 || ptype == 0x0400) {
        val nSub = u16(pg, bitOffset + 4)
        for (i <- 0 until nSub) {
          val p = bitOffset + 8 + ptrLen * i
          val off = uint(pg, p, intLen).toInt
          val len = uint(pg, p + intLen, intLen).toInt
          val compression = pg(p + 2 * intLen) & 0xff
          // skip truncated (1) pointers and compressed row-data subheaders
          // (4) — rows carry no signature and could false-match one
          if (len > 0 && compression != 1 && compression != 4) {
            val sig = hex(pg, off, intLen)
            if (RowSizeSig(sig)) {
              rowLength = uint(pg, off + 5 * intLen, intLen)
              rowCount = uint(pg, off + 6 * intLen, intLen)
              mixRows = uint(pg, off + 15 * intLen, intLen)
            } else if (ColSizeSig(sig)) {
              colCount = uint(pg, off + intLen, intLen).toInt
            } else if (ColTextSig(sig)) {
              val blobLen = u16(pg, off + intLen)
              val blob = java.util.Arrays.copyOfRange(pg, off + intLen, off + intLen + blobLen)
              if (textBlobs.isEmpty) {
                // compression literal lives in the FIRST text blob (pandas
                // scans it as a substring): SASYZCRL = RLE (supported),
                // SASYZCR2 = RDC (not)
                val raw = new String(blob, "ISO-8859-1")
                require(!raw.contains("SASYZCR2"), "RDC-compressed sas7bdat (SASYZCR2) not supported")
                rle = raw.contains("SASYZCRL")
              }
              textBlobs :+= blob
            } else if (ColNameSig(sig)) {
              val n = (len - 2 * intLen - 12) / 8
              for (j <- 0 until n) {
                val e = off + intLen + 8 * (j + 1)
                val blob = textBlobs(u16(pg, e))
                val no = u16(pg, e + 2); val nl = u16(pg, e + 4)
                names :+= new String(blob, no, nl, "ISO-8859-1").trim
              }
            } else if (ColAttrSig(sig)) {
              // entry stride intLen+8: [intLen data_offset][4B data_len]
              // [2B pad][1B type][1B pad]; first entry at off+intLen+8
              val n = (len - 2 * intLen - 12) / (intLen + 8)
              for (j <- 0 until n) {
                val e = off + intLen + 8 + (intLen + 8) * j
                val dOff = uint(pg, e, intLen).toInt
                val dLen = u32(pg, e + intLen).toInt
                val tpe = pg(e + intLen + 6) & 0xff
                attrs :+= ((dOff, dLen, tpe == 1))
              }
            } // formats/labels/counts: not needed for data decoding
          }
        }
      }
      page += 1
    }
    require(rowCount >= 0 && colCount > 0, s"sas7bdat metadata incomplete (rows=$rowCount cols=$colCount)")
    require(names.size == colCount && attrs.size == colCount, "column name/attribute subheaders incomplete")
    val cols = names.zip(attrs).map { case (n, (o, l, num)) => SasCol(n, num, o, l) }.toVector
    SasMeta(u64, headerSize, pageSize, pageCount, rowLength.toInt, rowCount, mixRows, cols, rle)
  }

  /** Decode the data rows of one page (DATA pages fully; MIX pages per the
    * block-count convention; on RLE files, meta pages carry one row per
    * signature-less subheader). Returns decoded rows as value arrays. */
  /** Rows of one page. `wanted` (optional) selects column ORDINALS to
    * decode, cells returned in that order — SAS is row-major so pruning
    * cannot skip disk bytes, but it skips the per-cell float/string
    * conversion, which is the CPU cost on wide tables (the DSv2 scan's
    * pruning contract). */
  def pageRows(meta: SasMeta, pg: Array[Byte], wanted: Array[Int] = null): Iterator[Array[Any]] = {
    val pageType = u16(pg, meta.bitOffset) & 0xff00
    val blockCount = u16(pg, meta.bitOffset + 2)
    val nSub = u16(pg, meta.bitOffset + 4)
    val sel: Array[SasCol] =
      if (wanted == null) meta.cols.toArray else wanted.map(meta.cols(_))
    def decode(b: Array[Byte], base: Int): Array[Any] =
      sel.map { c =>
        if (c.isNum) numCell(b, base + c.offset, c.length): Any
        else strCell(b, base + c.offset, c.length): Any
      }.toArray[Any]
    val (start, n) =
      if (pageType == 0x0100) (meta.bitOffset + 8, blockCount)
      else if (pageType == 0x0200) {
        val base = meta.bitOffset + 8 + nSub * meta.ptrLen
        val aligned = base + (base % 8 match { case 0 => 0; case r => 8 - r })
        (aligned, math.min(meta.mixPageRowCount, (blockCount - nSub).toLong).toInt)
      } else (0, 0)
    val rawRows = (0 until n).iterator.map(r => decode(pg, start + r * meta.rowLength))
    // compressed files: meta pages hold one row per subheader whose pointer
    // has type 1, compression 0 (stored raw, length == rowLength) or 4
    // (RLE). A row with length == rowLength is raw even under flag 4 —
    // pandas decompresses only when length < rowLength.
    val subRows =
      if (meta.rle && (pageType == 0x0000 || pageType == 0x4000))
        (0 until nSub).iterator.flatMap { i =>
          val p = meta.bitOffset + 8 + meta.ptrLen * i
          val off = uint(pg, p, meta.intLen).toInt
          val len = uint(pg, p + meta.intLen, meta.intLen).toInt
          val comp = pg(p + 2 * meta.intLen) & 0xff
          val typ = pg(p + 2 * meta.intLen + 1) & 0xff
          if (len > 0 && typ == 1 && (comp == 0 || comp == 4) && !MetaSigs(hex(pg, off, meta.intLen))) {
            val row =
              if (len == meta.rowLength) java.util.Arrays.copyOfRange(pg, off, off + len)
              else rleDecompress(pg, off, len, meta.rowLength)
            Some(decode(row, 0))
          } else None
        }
      else Iterator.empty
    rawRows ++ subRows
  }

  def sparkSchema(meta: SasMeta): StructType =
    StructType(meta.cols.map(c => StructField(c.name, if (c.isNum) DoubleType else StringType, nullable = true)))

  private[sources] def hadoopReadAt(path: Path, conf: Configuration): (Long, Int) => Array[Byte] = {
    val fs = path.getFileSystem(conf)
    (pos: Long, len: Int) => {
      val in = fs.open(path)
      try { val b = new Array[Byte](len); in.readFully(pos, b); b }
      finally in.close()
    }
  }

  /** Hadoop `Configuration` is not `java.io.Serializable`; this wrapper
    * round-trips it through its own `Writable` form so executor-side page
    * reads resolve the filesystem with the DRIVER's configuration (S3A
    * credentials, defaultFS, client tuning) instead of whatever the
    * executor classpath defaults happen to be. */
  private final class SerializableConf(@transient var value: Configuration) extends Serializable {
    private def writeObject(out: java.io.ObjectOutputStream): Unit = { out.defaultWriteObject(); value.write(out) }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject(); value = new Configuration(false); value.readFields(in)
    }
  }

  /** Distributed scan: driver parses metadata, executors decode disjoint
    * page ranges (seek + readFully per page — splittable like any
    * fixed-block format). */
  def read(spark: SparkSession, pathStr: String): DataFrame = {
    val p = new Path(pathStr)
    val meta = parseMeta(hadoopReadAt(p, spark.sparkContext.hadoopConfiguration))
    val schema = sparkSchema(meta)
    val parallelism = math.max(1, math.min(meta.pageCount, spark.sparkContext.defaultParallelism.toLong)).toInt
    val serConf = new SerializableConf(spark.sparkContext.hadoopConfiguration)
    val rdd = spark.sparkContext
      .range(0, meta.pageCount, 1, parallelism)
      .mapPartitions { pages =>
        // one open stream per partition; seek + readFully per page
        val p = new Path(pathStr)
        val in = p.getFileSystem(serConf.value).open(p)
        val buf = new Array[Byte](meta.pageSize)
        val it = pages.flatMap { i =>
          in.readFully(meta.headerSize + i * meta.pageSize, buf)
          pageRows(meta, buf).map(vals => Row.fromSeq(vals.toIndexedSeq)).toVector
        }
        new Iterator[Row] {
          def hasNext: Boolean = { val h = it.hasNext; if (!h) in.close(); h }
          def next(): Row = it.next()
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
