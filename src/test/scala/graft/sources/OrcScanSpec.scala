package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Conformance for the from-scratch ORC reader (x299): every fixture is
  * written by the OFFICIAL writer (Spark's ORC sink) and must decode
  * cell-identically — RLEv2 all four sub-encodings, both string
  * encodings, present streams, zlib + uncompressed.
  */
class OrcScanSpec extends AnyFunSuite {

  private lazy val s = TestSpark.spark

  private def fileBytes(dir: String): Array[Byte] = {
    val f = new java.io.File(dir)
      .listFiles()
      .filter(x => x.getName.endsWith(".orc") && !x.getName.startsWith("_"))
      .sorted
      .head
    java.nio.file.Files.readAllBytes(f.toPath)
  }

  private def check(df: org.apache.spark.sql.DataFrame, compression: String): Unit = {
    val dir = TestSpark.tempDir() + "/orc"
    df.coalesce(1).write.option("compression", compression).mode("overwrite").orc(dir)
    val got = OrcScan.decode(fileBytes(dir))
    assert(got.isDefined, s"decode failed ($compression)")
    val data = got.get
    val exp = s.read.orc(dir).collect()
    assert(data.rows.length == exp.length, s"${data.rows.length} rows vs ${exp.length}")
    val names = data.cols.map(_.name)
    val expSorted = exp
      .map(r => names.indices.map(i => if (r.isNullAt(r.fieldIndex(names(i)))) "null" else r.get(r.fieldIndex(names(i)))).mkString("|"))
      .sorted
    val gotSorted = data.rows
      .map(_.map(v => if (v == null) "null" else v).mkString("|"))
      .sorted
    var i = 0
    while (i < gotSorted.length) {
      assert(gotSorted(i) == expSorted(i), s"row $i:\n  got  ${gotSorted(i)}\n  want ${expSorted(i)}")
      i += 1
    }
  }

  test("longs: sequential (DELTA), runs (SHORT_REPEAT), skewed (PATCHED_BASE), noise (DIRECT)") {
    import s.implicits._
    val rnd = new scala.util.Random(61)
    val df = (0 until 6000)
      .map { i =>
        val skew = if (i % 100 == 7) 1000000000L + i else (i % 50).toLong // outliers → PATCHED_BASE
        (i.toLong, 42L, skew, rnd.nextLong() % 100000, -i.toLong * 7)
      }
      .toDF("seq", "const", "skewed", "noise", "negdelta")
    check(df, "zlib")
    check(df, "none")
  }

  test("strings: low cardinality (DICTIONARY_V2) and unique (DIRECT_V2)") {
    import s.implicits._
    val df = (0 until 4000)
      .map(i => (i.toLong, s"cat_${i % 7}", s"unique_value_$i"))
      .toDF("k", "cat", "uniq")
    check(df, "zlib")
  }

  test("nulls: present streams weave back exactly; booleans ride bit RLE") {
    import s.implicits._
    val df = (0 until 3000)
      .map(i =>
        (i.toLong, if (i % 3 == 0) None else Some(i.toLong * 5), if (i % 7 == 0) None else Some(s"v$i"), i % 2 == 0)
      )
      .toDF("k", "optl", "opts", "b")
    check(df, "zlib")
  }

  test("doubles and int32, multiple stripes") {
    import s.implicits._
    val df = (0 until 120000)
      .map(i => (i, i * 0.25 - 1000, (i % 997).toLong))
      .toDF("i32", "d", "l")
    check(df, "zlib")
  }

  test("lineitem projection (the x106 fixture shape) decodes cell-identically") {
    val li = graft.Graft
      .table(s, "/root/testdata/sf0.001", "lineitem")
      .select(
        col("l_orderkey"),
        col("l_linenumber").cast("long").as("ln"),
        col("l_extendedprice"),
        col("l_returnflag"),
        concat(col("l_returnflag"), lit("#"), col("l_orderkey")).as("hi_card")
      )
    check(li, "zlib")
  }

  test("all four supported chunk codecs ride the repo's own decoders (zstd default, snappy, lz4)") {
    import s.implicits._
    val df = (0 until 3000).map(i => (i.toLong, s"c${i % 9}")).toDF("k", "c")
    check(df, "zstd") // Spark 4's ORC default — chunks through x227
    check(df, "snappy") // x198
    check(df, "lz4") // x199
  }

  test("stripe pruning (x301): range reads decode only intersecting stripes, rows exact") {
    import s.implicits._
    val dir = TestSpark.tempDir() + "/orc"
    (0 until 200000)
      .map(i => (i.toLong, s"v${i % 13}", i * 0.5))
      .toDF("k", "c", "d")
      .coalesce(1)
      .sortWithinPartitions("k")
      .write
      .option("compression", "zlib")
      .option("orc.stripe.size", "65536")
      .mode("overwrite")
      .orc(dir)
    val bytes = fileBytes(dir)
    val all = OrcScan.decode(bytes, Some(Seq("k"))).get
    assert(all.rows.length == 200000)
    val full = OrcScan.decodeRange(bytes, Seq("k", "c"), "k", 0L, 199999L).get
    assert(full.stripesTotal > 1, s"need a multi-stripe file, got ${full.stripesTotal}")
    // a narrow probe decodes a strict subset of stripes
    val narrow = OrcScan.decodeRange(bytes, Seq("k", "c"), "k", 100000L, 100999L).get
    assert(narrow.rows.length == 1000)
    assert(narrow.rows.map(_(0).asInstanceOf[Long]).min == 100000L)
    assert(narrow.stripesDecoded < narrow.stripesTotal, s"${narrow.stripesDecoded}/${narrow.stripesTotal} not pruned")
    // empty range decodes zero stripes
    val none = OrcScan.decodeRange(bytes, Seq("k"), "k", 900000L, 999999L).get
    assert(none.rows.isEmpty && none.stripesDecoded == 0)
  }

  test("structural lies quarantine") {
    import s.implicits._
    val dir = TestSpark.tempDir() + "/orc"
    (0 until 100).map(i => Tuple1(i.toLong)).toDF("k").coalesce(1).write.mode("overwrite").orc(dir)
    val good = fileBytes(dir)
    assert(OrcScan.decode(good).isDefined)
    val badMagic = good.clone(); badMagic(good.length - 2) = 'X' // inside "ORC"
    assert(OrcScan.decode(badMagic).isEmpty)
    assert(OrcScan.decode(java.util.Arrays.copyOf(good, 10)).isEmpty)
  }
}
