package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Conformance for the from-scratch parquet WRITER (x286): files it emits
  * must be read back identically by Spark's parquet-mr reader AND graft's
  * own from-scratch x282 reader, across types, nulls, codecs (including
  * pages compressed by the repo's own gzip/zstd encoders) and page splits.
  * DuckDB adjudicates the same bytes in the gate row.
  */
class ParquetWriteSpec extends AnyFunSuite {

  private lazy val s = TestSpark.spark

  import ParquetWrite._

  private val schema = Seq(
    ColSpec("k", TInt64, optional = false),
    ColSpec("small", TInt32, optional = false),
    ColSpec("nm", TBytes, optional = true, utf8 = true),
    ColSpec("d", TDouble, optional = true),
    ColSpec("fl", TFloat, optional = false),
    ColSpec("b", TBool, optional = false)
  )

  private def mkRows(n: Int): Seq[Array[Any]] =
    (0 until n).map { i =>
      Array[Any](
        i.toLong,
        (i % 1000).toLong,
        if (i % 5 == 0) null else s"name_${i % 40}",
        if (i % 7 == 0) null else i * 3.5 - 1000,
        i * 0.25f - 10f,
        i % 2 == 0
      )
    }

  private def writeTmp(bytes: Array[Byte]): String = {
    val f = java.io.File.createTempFile("graft_pw", ".parquet")
    java.nio.file.Files.write(f.toPath, bytes)
    f.getAbsolutePath
  }

  private def roundtrip(n: Int, codec: Int): Unit = {
    val rows = mkRows(n)
    val bytes = write(schema, rows, codec)
    val path = writeTmp(bytes)

    // Spark (parquet-mr) reads it
    val sp = s.read.parquet(path).orderBy("k").collect()
    assert(sp.length == n, s"spark rows (codec=$codec)")
    rows.indices.foreach { i =>
      val r = sp(i)
      assert(r.getLong(0) == i.toLong)
      assert(r.getInt(1) == i % 1000)
      assert(Option(r.getAs[String]("nm")) == Option(rows(i)(2)).map(_.asInstanceOf[String]), s"nm row $i")
      assert(Option(if (r.isNullAt(3)) null else r.getDouble(3)) == Option(rows(i)(3)), s"d row $i")
      assert(r.getFloat(4) == rows(i)(4).asInstanceOf[Float])
      assert(r.getBoolean(5) == rows(i)(5).asInstanceOf[Boolean])
    }

    // graft's own x282 reader reads it
    val (_, got) = ParquetScan.readFile(bytes, schema.map(_.name))
    assert(got.length == n)
    rows.indices.foreach { i =>
      val g = got(i)
      assert(g(0) == rows(i)(0))
      assert(g(1) == rows(i)(1))
      assert(Option(g(2)).map(b => new String(b.asInstanceOf[Array[Byte]], "UTF-8")) ==
        Option(rows(i)(2)).map(_.asInstanceOf[String]))
      assert(g(3) == rows(i)(3))
      assert(g(4) == rows(i)(4))
      assert(g(5) == rows(i)(5))
    }
  }

  test("roundtrip via Spark and the scratch reader — uncompressed") { roundtrip(3000, CodecUncompressed) }
  test("roundtrip with pages compressed by the from-scratch gzip (x268)") { roundtrip(3000, CodecGzip) }
  test("roundtrip with pages compressed by the from-scratch zstd (x279)") { roundtrip(3000, CodecZstd) }

  test("page split: 50001 rows crosses three pages per chunk") {
    roundtrip(50001, CodecZstd)
  }

  test("all-null optional column and empty strings") {
    val sch = Seq(ColSpec("k", TInt64, optional = false), ColSpec("x", TBytes, optional = true, utf8 = true))
    val rows = (0 until 100).map(i => Array[Any](i.toLong, if (i == 50) "" else null))
    val bytes = write(sch, rows, CodecGzip)
    val sp = s.read.parquet(writeTmp(bytes)).orderBy("k").collect()
    assert(sp.count(_.isNullAt(1)) == 99)
    assert(sp(50).getAs[String]("x") == "")
    val (_, got) = ParquetScan.readFile(bytes, Seq("k", "x"))
    assert(got.count(_(1) == null) == 99)
  }

  test("dictionary encoding (x288): roundtrip via Spark and the scratch reader, footer carries the dict offset") {
    val rows = mkRows(3000)
    val bytes = write(schema, rows, CodecZstd, dictionary = true)
    val sp = s.read.parquet(writeTmp(bytes)).orderBy("k").collect()
    assert(sp.length == 3000)
    assert(sp(7).getAs[String]("nm") == "name_7")
    assert(sp(7).getFloat(4) == 7 * 0.25f - 10f)
    val (_, got) = ParquetScan.readFile(bytes, Seq("k", "small", "nm"))
    assert(got.length == 3000)
    assert(new String(got(13)(2).asInstanceOf[Array[Byte]], "UTF-8") == "name_13")
    // the scratch reader's own footer parse sees the dictionary offsets
    val fm = ParquetScan.footer(bytes)
    val byPath = fm.rowGroups.head.leaves.map(l => l.path -> l).toMap
    assert(byPath("nm").dictPageOffset >= 0, "nm (40 distinct) must be dictionary-encoded")
    assert(byPath("small").dictPageOffset >= 0)
    assert(byPath("k").dictPageOffset < 0, "a unique column must stay PLAIN (reuse guard)")
    // dictionary shrinks NON-PERIODIC categorical data (periodic synthetic
    // columns let zstd crush PLAIN via LZ77 period matches, so the win
    // must be asserted on hash-shuffled category order)
    val md = java.security.MessageDigest.getInstance("MD5")
    def cat(i: Int): String = {
      md.reset()
      val h = md.digest(s"cat$i".getBytes("UTF-8"))
      s"category_name_${(h(0) & 0x7f) % 40}"
    }
    val catSchema = Seq(ColSpec("k", TInt64, optional = false), ColSpec("c", TBytes, optional = false, utf8 = true))
    val catRows = (0 until 3000).map(i => Array[Any](i.toLong, cat(i)))
    val dictF = write(catSchema, catRows, CodecZstd, dictionary = true)
    val plainF = write(catSchema, catRows, CodecZstd)
    assert(dictF.length < plainF.length, s"${dictF.length} !< ${plainF.length}")
  }

  test("statistics (x289): the official parquet library reads back our min/max/null_count") {
    val rows = mkRows(3000)
    val bytes = write(schema, rows, CodecGzip, dictionary = true, statistics = true)
    val path = writeTmp(bytes)
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new org.apache.hadoop.fs.Path(path), new org.apache.hadoop.conf.Configuration())
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val cols = r.getFooter.getBlocks.get(0).getColumns
      val byName = (0 until cols.size()).map(cols.get).map(c => c.getPath.toDotString -> c).toMap
      val kSt = byName("k").getStatistics
      assert(kSt.genericGetMin.asInstanceOf[java.lang.Long] == 0L)
      assert(kSt.genericGetMax.asInstanceOf[java.lang.Long] == 2999L)
      assert(kSt.getNumNulls == 0L)
      val dSt = byName("d").getStatistics
      assert(dSt.getNumNulls == mkRows(3000).count(_(3) == null))
      assert(dSt.genericGetMin.asInstanceOf[java.lang.Double] == -996.5d) // i=1: 3.5-1000
      assert(dSt.genericGetMax.asInstanceOf[java.lang.Double] == 2999 * 3.5 - 1000)
    } finally r.close()
  }

  test("multi-row-group write (x292) + stats-pruned scratch read (x293)") {
    val rows = mkRows(10000)
    val bytes = write(schema, rows, CodecZstd, dictionary = true, statistics = true, rowGroupRows = 2000)
    // Spark reads all 5 row groups
    assert(s.read.parquet(writeTmp(bytes)).count() == 10000)
    // scratch reader sees 5 groups and reads them all unpruned
    val fm = ParquetScan.footer(bytes)
    assert(fm.rowGroups.length == 5)
    assert(fm.rowGroups.forall(_.numRows == 2000))
    val (_, all) = ParquetScan.readFile(bytes, Seq("k"))
    assert(all.length == 10000)
    // pruned range read: k in [3000, 4500] lives entirely in group 1 and 2
    val (_, got, rgTotal, rgDecoded) = ParquetScan.readFileRange(bytes, Seq("k", "small"), "k", 3000L, 4500L)
    assert(rgTotal == 5 && rgDecoded == 2, s"expected 2/5 groups, got $rgDecoded/$rgTotal")
    assert(got.length == 1501)
    assert(got.map(_(0).asInstanceOf[Long]).min == 3000L)
    assert(got.map(_(0).asInstanceOf[Long]).max == 4500L)
    // an empty range decodes zero groups
    val (_, none, _, rgd0) = ParquetScan.readFileRange(bytes, Seq("k"), "k", 50000L, 60000L)
    assert(none.isEmpty && rgd0 == 0)
    // a file WITHOUT statistics decodes conservatively (no wrong pruning)
    val noStats = write(schema, rows, CodecZstd, rowGroupRows = 2000)
    val (_, cons, _, rgdAll) = ParquetScan.readFileRange(noStats, Seq("k"), "k", 3000L, 4500L)
    assert(rgdAll == 5 && cons.length == 1501)
  }

  test("empty table") {
    val bytes = write(schema, Seq.empty, CodecUncompressed)
    assert(s.read.parquet(writeTmp(bytes)).count() == 0)
    val (_, got) = ParquetScan.readFile(bytes, schema.map(_.name))
    assert(got.isEmpty)
  }

  test("fuzz: random schemas × codecs × dictionary × row groups round-trip through the scratch reader") {
    val rnd = new scala.util.Random(0xbeef)
    for (it <- 0 until 25) {
      val nCols = 1 + rnd.nextInt(5)
      val sch = (0 until nCols).map { c =>
        val t = Seq(TInt64, TInt32, TDouble, TFloat, TBool, TBytes)(rnd.nextInt(6))
        ColSpec(s"c$c", t, optional = rnd.nextBoolean(), utf8 = t == TBytes && rnd.nextBoolean())
      }
      val n = rnd.nextInt(4) match {
        case 0 => 0
        case 1 => 1 + rnd.nextInt(50)
        case _ => rnd.nextInt(30000)
      }
      val rows = (0 until n).map { i =>
        sch.map { cs =>
          if (cs.optional && rnd.nextInt(5) == 0) null
          else
            cs.ptype match {
              case TInt64  => rnd.nextLong() % 1000000: Any
              case TInt32  => (rnd.nextInt(100000) - 50000).toLong: Any
              case TDouble => rnd.nextDouble() * 1000 - 500: Any
              case TFloat  => rnd.nextFloat() * 100 - 50: Any
              case TBool   => rnd.nextBoolean(): Any
              case _       => (if (rnd.nextBoolean()) s"s${rnd.nextInt(20)}" else s"u$i-${rnd.nextInt()}"): Any
            }
        }.toArray
      }
      val codec = Seq(CodecUncompressed, CodecGzip, CodecZstd)(rnd.nextInt(3))
      val bytes = write(
        sch,
        rows,
        codec,
        dictionary = rnd.nextBoolean(),
        statistics = rnd.nextBoolean(),
        rowGroupRows = if (rnd.nextBoolean()) Int.MaxValue else 1 + rnd.nextInt(5000)
      )
      val (_, got) = ParquetScan.readFile(bytes, sch.map(_.name))
      assert(got.length == n, s"it=$it rows")
      var i = 0
      while (i < n) {
        var c = 0
        while (c < nCols) {
          val (a, b) = (got(i)(c), rows(i)(c))
          val same = (a, b) match {
            case (null, null)                       => true
            case (x: Array[Byte], y: String)        => new String(x, "UTF-8") == y
            case (x, y)                             => x == y
          }
          assert(same, s"it=$it row $i col $c: $a vs $b")
          c += 1
        }
        i += 1
      }
    }
  }

  test("null in a required column is refused") {
    val sch = Seq(ColSpec("k", TInt64, optional = false))
    intercept[IllegalArgumentException](write(sch, Seq(Array[Any](null)), CodecUncompressed))
  }
}
