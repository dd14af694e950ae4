package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 operators: x41 line-level boilerplate dedup (expected output
  * recomputed from the LineFixture formulas, independent of the operator)
  * and q47 higher-order array functions (expected values recomputed in
  * plain Scala from the parquet floats).
  */
class LineDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("x41 line dedup: boilerplate lines removed, unique content kept in order") {
    // independent reference: line document-frequencies from the fixture formulas
    val allLines = (0 until 400).map(i => i -> LineFixture.docLines(i))
    val df = allLines
      .flatMap { case (i, ls) => ls.map(l => (l.toLowerCase.trim, i)) }
      .groupBy(_._1)
      .view
      .mapValues(_.map(_._2).distinct.size)
      .toMap
    // the planted separation must actually hold: pool lines far above the
    // threshold, unique lines at df = 1
    val (boiler, unique) = df.partition(_._2 >= LineFixture.dfThreshold)
    assert(boiler.size === 10, "every pool line crosses the threshold")
    assert(boiler.values.forall(_ >= 30))
    assert(unique.values.forall(_ === 1))

    val rows = Curation
      .queries("x41_line_dedup")(spark, "unused")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(rows.size === 400)
    for (i <- Seq(0, 1, 7, 123, 399)) {
      val ls = LineFixture.docLines(i)
      val kept = ls.filter(l => df(l.toLowerCase.trim) < LineFixture.dfThreshold)
      assert(rows(i.toLong)._1 === ls.length.toLong, s"doc $i n_lines")
      assert(rows(i.toLong)._2 === kept.length.toLong, s"doc $i n_kept")
      assert(rows(i.toLong)._3 === md5hex(kept.mkString("\n")), s"doc $i kept_md5")
    }
    // every document loses at least its j=1 pool line but keeps content
    assert(rows.values.forall { case (n, k, _) => k < n && k >= 3 })
  }

  test("x44 random projection: basis vectors read off the sign matrix exactly") {
    import spark.implicits._
    val d = TestSpark.tempDir()
    // e_i basis embeddings: projection of e_i must be column i of the sign
    // matrix (×1e6), which pins every sign and the quantization arithmetic
    val basis = (0 until 64).map { i =>
      (i.toLong, Array.tabulate(64)(k => if (k == i) 1.0f else 0.0f), 0)
    }
    // plus a short vector that must be filtered out, and a mixed vector
    val rows = basis :+ ((100L, Array(1.0f, 2.0f), 0)) :+
      ((101L, Array.tabulate(64)(k => (k % 3 - 1).toFloat), 0))
    TestSpark.writeTable(d, "embeddings", rows.toDF("vec_id", "embedding", "label"))
    val got = Similarity
      .queries("x44_random_projection")(spark, d)
      .collect()
      .map(r => r.getLong(0) -> (0 until 8).map(j => r.getLong(1 + j)))
      .toMap
    assert(!got.contains(100L), "non-64-dim vector must be excluded")
    for (i <- 0 until 64; j <- 0 until 8)
      assert(got(i.toLong)(j) === Similarity.projSign(j, i) * 1000000L, s"e_$i plane $j")
    // linearity: proj(mixed) = Σ_i mixed_i · proj(e_i)
    val mixed = Array.tabulate(64)(k => (k % 3 - 1).toLong)
    for (j <- 0 until 8)
      assert(got(101L)(j) === (0 until 64).map(i => mixed(i) * Similarity.projSign(j, i) * 1000000L).sum)
  }

  test("x45 compaction plan: ceil laws hold and the planned file count is writable") {
    val sf = "/root/testdata/sf0.01"
    val rows = Sampling
      .queries("x45_compaction_plan")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    for ((lang, nDocs, nBytes, nFiles, rowsPerFile) <- rows) {
      assert(nFiles === (nBytes + 65535L) / 65536L, s"$lang n_files")
      assert(rowsPerFile * nFiles >= nDocs && (rowsPerFile - 1) * nFiles < nDocs, s"$lang rows_per_file")
    }
    // the plan is actionable: writing one stratum with repartition(n_files)
    // yields exactly n_files parquet parts
    val (lang, _, _, nFiles, _) = rows.head
    val out = TestSpark.tempDir() + "/compact"
    graft.Graft
      .table(spark, sf, "documents")
      .where(org.apache.spark.sql.functions.col("lang") === lang)
      .repartition(nFiles.toInt)
      .write
      .parquet(out)
    val parts = new java.io.File(out).listFiles().count(f => f.getName.endsWith(".parquet"))
    assert(parts === nFiles.toInt)
  }

  test("q48 sliding windows: every event lands in exactly two 10-minute windows") {
    val sf = "/root/testdata/sf0.001"
    val slid = Advanced.queries.getOrElse("q48_sliding_window", Relational.queries("q48_sliding_window"))(spark, sf).collect()
    val tumb = Relational.queries("q20_events_window")(spark, sf).collect()
    assert(slid.map(_.getAs[Long]("n")).sum === 2L * tumb.map(_.getAs[Long]("n")).sum)
    // window starts align to the 5-minute slide grid
    val starts = slid.map(_.getAs[String]("ws")).distinct
    assert(starts.forall(s => s.endsWith(":00") && (s.substring(14, 16).toInt % 5 === 0)), starts.take(3).mkString(","))
  }

  test("q49 incremental agg: snapshot+delta merge equals direct full aggregation") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.01"
    val merged = Advanced
      .queries("q49_incremental_agg")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val direct = graft.Graft
      .table(spark, sf, "orders")
      .withColumn("cents", expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), sum("cents").as("c"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(2) / r.getLong(1))))
      .toMap
    assert(merged === direct)
    // the merge must actually merge: both sides of the cut are non-empty
    val orders = graft.Graft.table(spark, sf, "orders")
    assert(orders.where(col("o_orderdate") < "1997-01-01").limit(1).count() === 1)
    assert(orders.where(col("o_orderdate") >= "1997-01-01").limit(1).count() === 1)
  }

  test("x47 z-order: every bucket provably spans <= 1/8 of BOTH dims") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.01"
    val rows = Sampling
      .queries("x47_zorder_layout")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty && rows.map(_._2).sum === graft.Graft.table(spark, sf, "orders").count())
    val b = graft.Graft
      .table(spark, sf, "orders")
      .agg(
        min("o_custkey"),
        max("o_custkey"),
        min(datediff(col("o_orderdate"), lit("1992-01-01"))),
        max(datediff(col("o_orderdate"), lit("1992-01-01")))
      )
      .head()
    val (cR, dR) = (b.getLong(1) - b.getLong(0), (b.getInt(3) - b.getInt(2)).toLong)
    // a bucket fixes the top 3 interleaved bits of each scaled dim, so its
    // span is at most range/8 plus the min-max scaling quantum
    for ((bucket, _, cLo, cHi, dLo, dHi) <- rows) {
      assert(cHi - cLo <= cR / 8 + cR / 65535 + 2, s"bucket $bucket custkey span")
      assert(dHi - dLo <= dR / 8 + dR / 65535 + 2, s"bucket $bucket date span")
    }
    // and the layout is genuinely 2-dimensional: no single-column sort can
    // bound BOTH dims at once — a date-sorted 64-bucket layout leaves the
    // custkey span at essentially the full range
    val dateSorted = graft.Graft
      .table(spark, sf, "orders")
      .withColumn("days", datediff(col("o_orderdate"), lit("1992-01-01")).cast("long"))
      .withColumn("bkt", ntile(64).over(org.apache.spark.sql.expressions.Window.orderBy("days")))
      .groupBy("bkt")
      .agg((max("o_custkey") - min("o_custkey")).as("span"))
      .agg(avg("span"))
      .head()
      .getDouble(0)
    val zAvg = rows.map(r => r._4 - r._3).sum.toDouble / rows.length
    assert(zAvg < dateSorted * 0.5, s"z-order custkey locality ($zAvg) should beat date-sort ($dateSorted)")
  }

  test("q50 range frame: 30-day value window matches a brute-force recompute") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.01"
    val got = Relational
      .queries("q50_range_frame")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    val orders = graft.Graft
      .table(spark, sf, "orders")
      .where(col("o_custkey") < 100)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        datediff(col("o_orderdate"), lit("1992-01-01")).cast("long"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)")
      )
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.size === orders.length)
    val byCust = orders.groupBy(_._1)
    for ((ck, ok, d, _) <- orders) {
      val inFrame = byCust(ck).filter(o => o._3 >= d - 30 && o._3 <= d)
      assert(got((ck, ok)) === ((inFrame.length.toLong, inFrame.map(_._4).sum)), s"cust $ck order $ok")
    }
  }

  test("q47 higher-order functions: lambda arithmetic matches plain Scala") {
    val sf = "/root/testdata/sf0.001"
    val got = Advanced
      .queries("q47_higher_order")(spark, sf)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val raw = spark.read
      .parquet(s"$sf/embeddings.parquet")
      .where("vec_id < 50")
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
      .toMap
    assert(got.keySet === raw.keySet)
    def e6(x: Double): Long =
      BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    for ((id, xs) <- raw) {
      val nPos = xs.count(_ > 0).toLong
      val l1 = xs.map(v => e6(math.abs(v) * 1e6)).sum
      val revDot = xs.zip(xs.reverse).map { case (a, b) => e6(a * b * 1e6) }.sum
      val argmax = (xs.indexOf(xs.max) + 1).toLong
      assert(got(id) === ((nPos, l1, revDot, argmax)), s"vec $id")
    }
  }
}
