package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Conformance for the from-scratch parquet reader (x282): every testdata
  * table (written by parquet-cpp-arrow) and a matrix of Spark-written
  * (parquet-mr) fixtures must decode cell-identically to Spark's own scan —
  * two INDEPENDENT official writers adjudicating one scratch reader across
  * codecs, encodings, page shapes, nulls, lists and multi-row-group files.
  */
class ParquetScanSpec extends AnyFunSuite {

  private lazy val s = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def fileBytes(path: String): Array[Byte] = {
    val f = new java.io.File(path)
    val one =
      if (f.isDirectory)
        f.listFiles().filter(x => x.getName.endsWith(".parquet") && !x.getName.startsWith("_")).sorted.head
      else f
    java.nio.file.Files.readAllBytes(one.toPath)
  }

  /** Normalize one scratch cell for comparison. */
  private def norm(v: Any): Any = v match {
    case b: Array[Byte] => new String(b, "UTF-8")
    case v: Vector[_]   => v.map(norm)
    case x              => x
  }

  /** Compare scratch read against a Spark projection that casts every
    * column to the scratch reader's physical view (longs, doubles,
    * strings, float seqs).
    */
  private def check(path: String, cols: Seq[String], expected: org.apache.spark.sql.DataFrame): Unit = {
    val (_, rows) = ParquetScan.readFile(fileBytes(path), cols)
    val exp = expected.collect()
    assert(rows.length == exp.length, s"$path: ${rows.length} rows vs ${exp.length}")
    // order-insensitive: sort both sides by the stringified row
    val got = rows.map(_.map(norm).mkString("|")).sorted
    val want = exp
      .map(r => (0 until r.length).map(i => if (r.isNullAt(i)) "null" else r.get(i)).mkString("|"))
      .sorted
    var i = 0
    while (i < got.length) {
      assert(got(i) == want(i), s"$path row $i:\n  got  ${got(i)}\n  want ${want(i)}")
      i += 1
    }
  }

  test("every sf0.001 table decodes cell-identically to Spark's scan") {
    def strCell(c: String) = coalesce(col(c).cast("string"), lit("null"))
    // flat tables: compare every column via a cast-to-physical projection
    val flat = Seq(
      "region" -> Seq("r_regionkey", "r_name"),
      "nation" -> Seq("n_nationkey", "n_name", "n_regionkey"),
      "customer" -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal"),
      "supplier" -> Seq("s_suppkey", "s_name", "s_nationkey"),
      "part" -> Seq("p_partkey", "p_name", "p_brand", "p_retailprice"),
      "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"),
      "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
      "events" -> Seq("event_id", "ts", "user_id", "event_type", "value", "props")
    )
    flat.foreach { case (t, cols) =>
      val df = s.read.parquet(s"$sf/$t.parquet")
      val proj = cols.map { c =>
        df.schema(c).dataType.typeName match {
          case "integer"   => col(c).cast("long").cast("string")
          case t if t.startsWith("timestamp") => unix_micros(col(c).cast("timestamp")).cast("string")
          case "double"    => col(c).cast("string")
          case _           => col(c).cast("string")
        }
      }
      check(
        s"$sf/$t.parquet",
        cols,
        df.select(proj.zip(cols).map { case (e, c) => coalesce(e, lit("null")).as(c) }: _*)
      )
    }
  }

  test("lineitem: all 16 columns, the widest chunk walk") {
    val df = s.read.parquet(s"$sf/lineitem.parquet")
    val cols = df.columns.toSeq
    val proj = cols.map { c =>
      df.schema(c).dataType.typeName match {
        case "integer"                        => col(c).cast("long").cast("string")
        case t if t.startsWith("timestamp")   => unix_micros(col(c).cast("timestamp")).cast("string")
        case _                                => col(c).cast("string")
      }
    }
    check(
      s"$sf/lineitem.parquet",
      cols,
      df.select(proj.zip(cols).map { case (e, c) => coalesce(e, lit("null")).as(c) }: _*)
    )
  }

  test("embeddings: single-level list<float> assembly (def/rep levels)") {
    val (_, rows) = ParquetScan.readFile(fileBytes(s"$sf/embeddings.parquet"), Seq("vec_id", "embedding.list.element", "label"))
    val exp = s.read
      .parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "embedding", "cast(label as long) label")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getLong(2)))
      .sortBy(_._1)
    val got = rows
      .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Vector[Any]].map(_.asInstanceOf[Float]), r(2).asInstanceOf[Long]))
      .sortBy(_._1)
    assert(got.length == exp.length)
    got.zip(exp).foreach { case ((gi, gv, gl), (ei, ev, el)) =>
      assert(gi == ei && gl == el, s"ids/labels differ at $gi")
      assert(gv.length == ev.length, s"vec length at $gi")
      gv.indices.foreach(k => assert(gv(k) == ev(k), s"float bit-mismatch at $gi[$k]"))
    }
  }

  test("Spark-written fixtures: codecs × dictionary × multi-row-group × nulls") {
    import s.implicits._
    val dir = TestSpark.tempDir()
    val df = s
      .range(3000)
      .select(
        col("id"),
        (col("id") % 7).cast("int").as("small"),
        when(col("id") % 5 === 0, lit(null)).otherwise(concat(lit("name_"), col("id") % 40)).as("nm"),
        (col("id") * 3.5 - 1000).as("d"),
        (col("id") % 2 === 0).as("flag")
      )
    for (codec <- Seq("snappy", "gzip", "zstd", "none"); dict <- Seq("true", "false")) {
      val p = s"$dir/mix_${codec}_$dict"
      df.coalesce(1)
        .write
        .option("compression", codec)
        .option("parquet.enable.dictionary", dict)
        .option("parquet.block.size", 64 * 1024)
        .mode("overwrite")
        .parquet(p)
      val expected = df.select(
        coalesce(col("id").cast("string"), lit("null")).as("id"),
        coalesce(col("small").cast("long").cast("string"), lit("null")).as("small"),
        coalesce(col("nm"), lit("null")).as("nm"),
        coalesce(col("d").cast("string"), lit("null")).as("d"),
        coalesce(col("flag").cast("string"), lit("null")).as("flag")
      )
      check(p, Seq("id", "small", "nm", "d", "flag"), expected)
    }
  }

  test("Spark-written lists: null list, empty list, null elements") {
    import s.implicits._
    val dir = TestSpark.tempDir()
    val data = Seq(
      (1L, Seq[java.lang.Float](1.5f, -2.25f, 3f)),
      (2L, Seq.empty[java.lang.Float]),
      (3L, null),
      (4L, Seq[java.lang.Float](null, 7.75f)),
      (5L, Seq[java.lang.Float](0f))
    )
    val df = s.createDataFrame(data).toDF("k", "xs")
    val p = s"$dir/lists"
    df.coalesce(1).write.mode("overwrite").parquet(p)
    val (_, rows) = ParquetScan.readFile(fileBytes(p), Seq("k", "xs.list.element"))
    val got = rows.map(r => (r(0).asInstanceOf[Long], Option(r(1)).map(_.asInstanceOf[Vector[Any]]))).sortBy(_._1)
    assert(got(0) == ((1L, Some(Vector(1.5f, -2.25f, 3f)))))
    assert(got(1) == ((2L, Some(Vector()))))
    assert(got(2) == ((3L, None)))
    assert(got(3) == ((4L, Some(Vector(null, 7.75f)))))
    assert(got(4) == ((5L, Some(Vector(0f)))))
  }

  test("column pruning never touches unselected chunks (physical: sliced bytes decode)") {
    // zero out every other column's chunk byte range; the projection of the
    // surviving column must still decode — proof the pruned ranges are
    // never read
    val bytes = fileBytes(s"$sf/nation.parquet")
    val fm = ParquetScan.footer(bytes)
    val keep = "n_nationkey"
    val mangled = bytes.clone()
    fm.rowGroups.foreach { rg =>
      rg.leaves.filterNot(_.path == keep).foreach { lm =>
        val start = (if (lm.dictPageOffset >= 0) lm.dictPageOffset else lm.dataPageOffset).toInt
        java.util.Arrays.fill(mangled, start, start + lm.totalCompressed.toInt, 0x55.toByte)
      }
    }
    val (_, rows) = ParquetScan.readFile(mangled, Seq(keep))
    assert(rows.map(_(0).asInstanceOf[Long]).sorted == (0L until 25L))
  }

  test("structural lies quarantine: bad magic, truncation, wrong column") {
    val bytes = fileBytes(s"$sf/region.parquet")
    val noMagic = bytes.clone(); noMagic(bytes.length - 1) = 'X'
    intercept[Exception](ParquetScan.footer(noMagic))
    intercept[Exception](ParquetScan.footer(java.util.Arrays.copyOf(bytes, 7)))
    intercept[Exception](ParquetScan.readFile(bytes, Seq("nope")))
  }
}
