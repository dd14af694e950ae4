package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tests for the 100 TB design disciplines themselves: partition pruning on
  * partitioned layouts, shuffle-free bucketed joins, salted-join semantics,
  * and the typed Dataset API boundary. */
class ScaleDisciplineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("partitionBy layout yields partition pruning (PartitionFilters, not data filter)") {
    val dir = TestSpark.tempDir()
    val orders = Graft.table(spark, sf, "orders").withColumn("yr", year(col("o_orderdate")))
    graft.etl.Ingest.writeParquet(orders, s"$dir/orders_part", partitionBy = Seq("yr"))
    val pruned = spark.read.parquet(s"$dir/orders_part").where(col("yr") === 1997)
    pruned.count()
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(yr"), s"no partition filter in:\n$scan")
    // the year predicate must NOT appear as a post-scan data filter
    assert(!scan.contains("PushedFilters: [IsNotNull(yr)"), "partition column read as data column")
    val expected = Graft.table(spark, sf, "orders").where(year(col("o_orderdate")) === 1997).count()
    assert(pruned.count() === expected)
  }

  test("z-order manifest prunes files: selective rectangle reads ≤ 1/8 of the layout") {
    val dir = TestSpark.tempDir() + "/zorder"
    val bounds = graft.sources.DataSkipping.ensureLayout(spark, sf, dir)
    // second ensure must be a marker hit (no rebuild): same bounds, and the
    // data files' mtimes are untouched
    val mtimes = new java.io.File(s"$dir/data").listFiles().map(f => f.getName -> f.lastModified).toMap
    assert(graft.sources.DataSkipping.ensureLayout(spark, sf, dir) === bounds)
    assert(new java.io.File(s"$dir/data").listFiles().map(f => f.getName -> f.lastModified).toMap === mtimes)
    val r = graft.sources.DataSkipping.gateRect(bounds)
    val (selected, total) = graft.sources.DataSkipping.selectFiles(spark, dir, r)
    // an eighth-cell rectangle on both dims covers ~1/64 of the z-key
    // space; range-partitioned files give it a handful of files plus
    // boundary straddlers — the 1/8 bound is the x47 clustering guarantee
    assert(total >= 32, s"layout produced only $total files")
    assert(selected.nonEmpty)
    assert(selected.length * 8 <= total, s"${selected.length} of $total files — manifest pruning is not selective")
    // correctness of the pruned scan against the full-table filter
    val pruned = graft.sources.DataSkipping.prunedScan(spark, dir, r)
    val full = graft.sources.DataSkipping
      .dims(spark, sf)
      .where(col("o_custkey").between(r.cLo, r.cHi) && col("days").between(r.dLo, r.dHi))
    assert(pruned.count() === full.count())
    assert(pruned.agg(sum("o_custkey"), sum("days")).collect()(0) === full.agg(sum("o_custkey"), sum("days")).collect()(0))
    // the residual predicate reaches the parquet scan of the pruned files
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("GreaterThanOrEqual(o_custkey"), s"residual not pushed:\n$plan")
    // a rectangle outside the data yields an empty frame, not a crash
    val nowhere = graft.sources.DataSkipping.Rect(-100L, -50L, -100L, -50L)
    assert(graft.sources.DataSkipping.selectFiles(spark, dir, nowhere)._1.isEmpty)
    assert(graft.sources.DataSkipping.prunedScan(spark, dir, nowhere).count() === 0L)
  }

  test("manifest stat enrichment: KMV dictionary beats min/max on equality; null counts skip IS NOT NULL") {
    val dir = TestSpark.tempDir() + "/zorder"
    graft.sources.DataSkipping.ensureLayout(spark, sf, dir)
    val full = graft.sources.DataSkipping
    // equality probes across scattered tag values: the dictionary must
    // never lose a row (soundness) and must open strictly fewer files
    // than min/max for at least one probe (the low-ndv win — tag values
    // scatter globally, so [t_lo, t_hi] spans cells the file never holds)
    val data = spark.read.parquet(s"$dir/data")
    val present = data.groupBy("tag").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    var strictWins = 0
    for (v <- present.keySet.toSeq.sorted.filter(_ % 3 == 0).take(8)) {
      val (range, dict, total) = full.selectFilesEq(spark, dir, v)
      assert(dict.toSet.subsetOf(range.toSet))
      assert(range.size <= total)
      if (dict.size < range.size) strictWins += 1
      assert(full.prunedScanEq(spark, dir, v).count() === present(v), s"tag=$v")
    }
    assert(strictWins >= 1, "dictionary pruning never beat the min/max range bound")
    // a value in range gaps (absent cell inside [t_lo, t_hi] somewhere):
    // absent values still return zero rows through the pruned scan
    val absent = (0L until 256L).find(v => !present.contains(v))
    for (v <- absent) assert(full.prunedScanEq(spark, dir, v).count() === 0L)
    // IS NOT NULL: all-null files (outside the promo dy band) skip; the
    // pruned scan reproduces the full filter exactly
    val (nn, total) = full.selectFilesNotNull(spark, dir)
    assert(nn.nonEmpty && nn.size < total, s"${nn.size} of $total files — null-count skipping not selective")
    assert(full.prunedScanNotNull(spark, dir).count() === data.where(col("promo").isNotNull).count())
  }

  test("x113 per-file Bloom: point lookup opens a handful of files, never loses a row") {
    val dir = TestSpark.tempDir() + "/zorder"
    graft.sources.DataSkipping.ensureLayout(spark, sf, dir)
    val ds = graft.sources.DataSkipping
    val data = spark.read.parquet(s"$dir/data")
    val truth = data.groupBy("o_orderkey").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probes = truth.keySet.toSeq.sorted.filter(_ % 7 == 0).take(6)
    for (k <- probes) {
      val (files, total) = ds.selectFilesPoint(spark, dir, k)
      assert(files.nonEmpty && total >= 32)
      // the whole point: an unclustered high-NDV key opens ~1 file, with
      // only Bloom false positives on top — bound at a quarter of the
      // layout (fixture fp rate ≈0.4% ⇒ expected extra files ≈ 0.25)
      assert(files.size * 4 <= total, s"key $k opened ${files.size} of $total files")
      assert(ds.prunedScanPoint(spark, dir, k).count() === truth(k), s"key $k")
    }
    // absent key: zero rows through the pruned scan (fp files are fine,
    // the residual equality removes them)
    val absent = truth.keySet.max + 999983L
    assert(ds.prunedScanPoint(spark, dir, absent).count() === 0L)
  }

  test("q41 lateral top-k decorrelates into a partial window group limit") {
    val plan = SparkEntry.queries("q41_lateral_topk")(spark, sf).queryExecution.executedPlan.toString
    // the correlated ORDER BY/LIMIT must become a per-key group limit with a
    // map-side partial pass — never a per-outer-row subquery execution or a
    // cartesian expansion
    assert(plan.contains("WindowGroupLimit"), s"no group limit in:\n$plan")
    assert(!plan.contains("CartesianProduct"), "lateral subquery expanded to a cartesian product")
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = TestSpark.tempDir()
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    s2.conf.set("spark.sql.adaptive.enabled", "false")
    val o = Graft.table(s2, sf, "orders")
    val l = Graft.table(s2, sf, "lineitem")
    o.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_orders").mode("overwrite").saveAsTable("b_orders")
    l.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/b_lineitem").mode("overwrite").saveAsTable("b_lineitem")
    val joined = s2.table("b_orders").join(s2.table("b_lineitem"), col("o_orderkey") === col("l_orderkey"))
    val n = joined.count()
    assert(n === Graft.table(s2, sf, "lineitem").count()) // every lineitem has its order
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), s"bucketed join still shuffled:\n$plan")
  }

  test("salted join is semantically identical to the plain join") {
    val o = Graft.table(spark, sf, "orders")
    val c = Graft.table(spark, sf, "customer")
    val plain = o.join(c, o("o_custkey") === c("c_custkey")).count()
    val salted = Skew.saltedJoin(o, c.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", 8).count()
    assert(salted === plain)
  }

  test("csv and json-lines sinks round-trip with explicit schemas") {
    val dir = TestSpark.tempDir()
    val orig = Graft.table(spark, sf, "nation")
    graft.etl.Ingest.writeCsv(orig, s"$dir/nation_csv", sep = ";")
    val csvBack = graft.etl.Ingest.csv(spark, s"$dir/nation_csv", orig.schema, sep = ";")
    assert(csvBack.orderBy("n_nationkey").collect().toSeq === orig.orderBy("n_nationkey").collect().toSeq)
    graft.etl.Ingest.writeJsonLines(orig, s"$dir/nation_json")
    val jsonBack = graft.etl.Ingest.jsonLines(spark, s"$dir/nation_json", orig.schema)
    assert(jsonBack.orderBy("n_nationkey").collect().toSeq === orig.orderBy("n_nationkey").collect().toSeq)
  }

  test("typed Dataset boundary: case-class encoder round trip") {
    import ScaleDisciplineSpec.Item
    val ds = Graft
      .table(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag")
      .as[Item]
    val heavy = ds.filter(_.l_quantity >= 49.0).map(i => i.l_returnflag).groupByKey(identity).count().collect().toMap
    val oracle = Graft
      .table(spark, sf, "lineitem")
      .where(col("l_quantity") >= 49)
      .groupBy("l_returnflag")
      .agg(count(lit(1)))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(heavy === oracle)
  }

  test("AQE splits a skewed shuffle-join partition (OptimizeSkewedJoin fires)") {
    // one planted hot key carries ~100x the median key's rows; with the
    // skew thresholds lowered to fixture scale, AQE must mark the join
    // skewed and split the hot partition instead of letting one task
    // carry it — the runtime complement of the x38 manual salting path
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1" // force a shuffle join
    )
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // payloads are md5 strings so the hot partition's bytes are
      // incompressible — AQE's skew detector sees COMPRESSED shuffle
      // sizes, and 100k copies of one long would RLE away below the
      // threshold (observed: only a coalesce fired)
      val left = spark
        .range(200000)
        .select(
          when(col("id") % 2 === 0, 7L).otherwise(col("id")).as("k"),
          md5(col("id").cast("string").cast("binary")).as("payload")
        )
      val right = spark.range(5000).select(col("id").as("k"), (col("id") * 3).as("v"))
      // collect() directly on the join: the same QueryExecution carries
      // the final adaptive plan (a write wraps its own), and with no
      // downstream exchange the split needs no veto override
      val joined = left.join(right, Seq("k"))
      assert(joined.collect().length > 100000) // hot key actually joined
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew split in:\n${plan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("x187 encoding advisor: closed-form bit models and tie precedence on a hand-built column") {
    val dir = TestSpark.tempDir()
    // 16 rows: suppkey constant (ndv 1 -> rle wins), orderkey 0..15
    // (delta 4 bits/value), qty all distinct 100-spaced (delta vs dict)
    val rows = (0 until 16).map(i =>
      (5L, i.toLong, java.sql.Date.valueOf("1995-01-01"), 1.0, (i * 100 + 1).toDouble))
    graft.etl.Ingest.writeParquet(
      rows.toDF("l_suppkey", "l_orderkey", "l_shipdate", "l_extendedprice", "l_quantity"),
      s"$dir/lineitem.parquet")
    val got = graft.operators.Advanced
      .queries("x187_encoding_advisor")(spark, dir)
      .collect()
      .map(r => r.getAs[String]("column") -> r)
      .toMap
    val sk = got("suppkey")
    assert(sk.getAs[Long]("ndv") === 1L)
    assert(sk.getAs[Long]("bits_delta") === 0L) // constant: width 0 (x192 alignment)
    assert(sk.getAs[Long]("bits_rle_sorted") === 96L) // 1 run
    assert(sk.getAs[String]("best") === "delta") // 0 < 96: delta wins even vs RLE
    val ok = got("orderkey")
    assert(ok.getAs[Long]("bits_delta") === 16L * 4L) // range 15 -> 4 bits
    assert(ok.getAs[Long]("bits_dict") === 16L * 4L + 16L * 64L)
    assert(ok.getAs[String]("best") === "delta")
    val q = got("qty")
    assert(q.getAs[Long]("ndv") === 16L)
    assert(q.getAs[Long]("vmax") - q.getAs[Long]("vmin") === 1500L) // 11 bits
    assert(q.getAs[Long]("bits_delta") === 16L * 11L)
    assert(q.getAs[String]("best") === "delta")
  }

  test("x182 skew profiler: degenerate single-key and exactly-uniform streams pin the formulas") {
    val dir = TestSpark.tempDir()
    // lineitem stand-in: 64 rows on ONE key (total skew), plus a second
    // table written after with 8 keys x 8 rows (exact uniformity)
    graft.etl.Ingest.writeParquet(
      (0 until 64).map(i => (7L, i)).toDF("l_suppkey", "i"), s"$dir/lineitem.parquet")
    val one = graft.operators.Advanced.queries("x182_skew_profile")(spark, dir).collect()
    val p0 = one.find(_.getAs[Long]("profile") == 0L).get
    assert(p0.getAs[Long]("n_keys") === 1L)
    assert(p0.getAs[Long]("max_share_ppm") === 1000000L)
    assert(p0.getAs[Long]("skew_ratio_e6") === 1000000L) // max*keys/N = 1: NOT flagged
    assert(p0.getAs[Long]("qent_millibits") === 0L) // log2(1) = 0: zero entropy
    assert(!p0.getAs[Boolean]("salt_advised"), "a single-key stream cannot be salted usefully")

    val dir2 = TestSpark.tempDir()
    graft.etl.Ingest.writeParquet(
      (0 until 64).map(i => ((i % 8).toLong, i)).toDF("l_suppkey", "i"), s"$dir2/lineitem.parquet")
    val two = graft.operators.Advanced.queries("x182_skew_profile")(spark, dir2).collect()
    val q0 = two.find(_.getAs[Long]("profile") == 0L).get
    assert(q0.getAs[Long]("n_keys") === 8L)
    assert(q0.getAs[Long]("p50_cnt") === 8L && q0.getAs[Long]("p99_cnt") === 8L)
    assert(q0.getAs[Long]("skew_ratio_e6") === 1000000L) // exactly uniform
    assert(q0.getAs[Long]("qent_millibits") === 3000L) // log2(8) = 3 bits exactly
    assert(!q0.getAs[Boolean]("salt_advised"))
  }
}

object ScaleDisciplineSpec {
  final case class Item(l_orderkey: Long, l_quantity: Double, l_returnflag: String)

}
