package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x81/x82 copy-on-write MERGE: the rewrite must touch EXACTLY the buckets
  * the change keys live in, carried manifest entries must reference the old
  * snapshot's files verbatim (zero bytes copied), merged content must equal
  * a from-scratch recompute, and the old snapshot must stay readable and
  * identical after the merge (time travel / immutability). */
class CowTableSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def baseRows(): Map[Long, Long] = {
    import org.apache.spark.sql.functions._
    graft.Graft
      .table(spark, sf, "orders")
      .select(col("o_orderkey"), expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
  }

  test("merged snapshot equals a from-scratch recompute of update ∪ insert semantics") {
    CowTable.ensure(spark, sf)
    val got = CowTable.read(spark, 2).collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("cents")).toMap
    val base = baseRows()
    val expected = base.map { case (k, c) =>
      val touchedBucket = (k / CowTable.BucketWidth) % 5 == 0
      k -> (if (k % 97 == 0 && touchedBucket) c + CowTable.UpdateBump else c)
    } ++ (0 until CowTable.InsertCount).map(i => (CowTable.InsertBase + i) -> (100000L + i * 7L))
    assert(got.size === expected.size)
    assert(got === expected)
  }

  test("manifest prune is exact: rewritten buckets = change buckets, carried entries reference v1 files") {
    CowTable.ensure(spark, sf)
    val v1 = CowTable.manifest(spark, 1).collect().map(r => r.getAs[Long]("bucket") -> r.getAs[String]("path")).toMap
    val v2 = CowTable.manifest(spark, 2).collect()
    val base = baseRows()
    val expectedTouched =
      base.keySet.filter(k => k % 97 == 0 && (k / CowTable.BucketWidth) % 5 == 0).map(_ / CowTable.BucketWidth) ++
        (0 until CowTable.InsertCount).map(i => (CowTable.InsertBase + i) / CowTable.BucketWidth)
    val (fresh, carried) = v2.partition(_.getAs[String]("path").contains("/v2/"))
    assert(fresh.map(_.getAs[Long]("bucket")).toSet === expectedTouched)
    // carried rows point at the OLD snapshot's directories verbatim — the
    // by-reference half of copy-on-write — and keep their stats
    for (r <- carried) {
      assert(r.getAs[String]("path") === v1(r.getAs[Long]("bucket")))
    }
    assert(carried.map(_.getAs[Long]("bucket")).toSet === v1.keySet -- expectedTouched)
    // manifest stats are trustworthy planning inputs: n_rows sums to table size
    assert(v2.map(_.getAs[Long]("n_rows")).sum === base.size + CowTable.InsertCount)
  }

  test("time travel: snapshot v1 read after the merge reproduces the original table") {
    CowTable.ensure(spark, sf)
    val got = CowTable.read(spark, 1).collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("cents")).toMap
    assert(got === baseRows())
  }

  test("min/max manifest stats bound their bucket's keys exactly") {
    CowTable.ensure(spark, sf)
    for (r <- CowTable.manifest(spark, 2).collect()) {
      val b = r.getAs[Long]("bucket")
      assert(r.getAs[Long]("min_key") / CowTable.BucketWidth === b)
      assert(r.getAs[Long]("max_key") / CowTable.BucketWidth === b)
      assert(r.getAs[Long]("min_key") <= r.getAs[Long]("max_key"))
    }
  }

  test("inserts landing INSIDE an existing bucket's key range survive the merge") {
    // regression (review-found): a left join from the current side dropped
    // change keys that had no current row but keyed into an occupied
    // bucket. Merge v2 -> v99 with one such insert plus one update.
    import spark.implicits._
    CowTable.ensure(spark, sf)
    val base = baseRows()
    // any occupied bucket with a key-range gap (dense generators can fill
    // whole buckets, so search rather than assume)
    val (bucket, bucketKeys) = base.keySet
      .groupBy(_ / CowTable.BucketWidth)
      .find { case (_, ks) => ks.size < CowTable.BucketWidth }
      .get
    val existingKey = bucketKeys.head
    val freshKey = (bucket * CowTable.BucketWidth until (bucket + 1) * CowTable.BucketWidth)
      .find(k => !bucketKeys.contains(k))
      .get
    try {
      CowTable.merge(
        spark,
        fromVersion = 2,
        toVersion = 99,
        changes = Seq((existingKey, 77L), (freshKey, 88L)).toDF("k", "cents")
      )
      val got = CowTable.read(spark, 99).collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("cents")).toMap
      assert(got(existingKey) === 77L) // matched -> updated
      assert(got(freshKey) === 88L) // unmatched in an occupied bucket -> inserted
      val v2 = CowTable.read(spark, 2).collect().length
      assert(got.size === v2 + 1)
    } finally {
      // scratch snapshot: keep the fixed artifact at its steady v1/v2 state
      for (n <- Seq("v99", "manifest_v99")) {
        val f = new java.io.File(s"${CowTable.dir}/$n")
        if (f.exists()) org.apache.commons.io.FileUtils.deleteDirectory(f)
      }
    }
  }

  test("steady-state ensure is a marker read: no manifest rewrite on the second call") {
    CowTable.ensure(spark, sf)
    val before = new java.io.File(CowTable.dir + "/manifest_v2").lastModified()
    CowTable.ensure(spark, sf)
    assert(new java.io.File(CowTable.dir + "/manifest_v2").lastModified() === before)
  }
}
