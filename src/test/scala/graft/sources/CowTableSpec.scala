package graft.sources

import graft.TestSpark
import graft.operators.Warehouse
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
      // and the CDC diff classifies exactly these two rows as U and I
      val diff = CowTable
        .snapshotDiff(spark, 2, 99)
        .collect()
        .map(r => (r.getAs[Long]("k"), r.getAs[String]("change_type"), r.getAs[Long]("old_cents"), r.getAs[Long]("new_cents")))
        .toSet
      assert(diff === Set((existingKey, "U", v2Rows()(existingKey), 77L), (freshKey, "I", -1L, 88L)))
    } finally {
      // scratch snapshot: keep the fixed artifact at its steady v1/v2 state
      for (n <- Seq("v99", "manifest_v99")) {
        val f = new java.io.File(s"${CowTable.dir}/$n")
        if (f.exists()) org.apache.commons.io.FileUtils.deleteDirectory(f)
      }
    }
  }

  private def v2Rows(): Map[Long, Long] = {
    val base = baseRows()
    base.map { case (k, c) =>
      k -> (if (k % 97 == 0 && (k / CowTable.BucketWidth) % 5 == 0) c + CowTable.UpdateBump else c)
    } ++ (0 until CowTable.InsertCount).map(i => (CowTable.InsertBase + i) -> (100000L + i * 7L))
  }

  test("three-clause merge: upserts replace, delete stripe drops, v3 matches the recompute") {
    CowTable.ensure(spark, sf)
    val v2 = v2Rows()
    val expected = v2.collect {
      case (k, c) if !(k % 101 == 0 && (k / CowTable.BucketWidth) % 7 == 1) =>
        k -> (if (k % 103 == 0 && (k / CowTable.BucketWidth) % 7 == 3) 50000L + k % 1000 else c)
    }
    val got = CowTable.read(spark, 3).collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("cents")).toMap
    assert(got === expected)
  }

  test("snapshot diff reads only rewritten buckets and classifies U/D rows exactly") {
    CowTable.ensure(spark, sf)
    val v2 = v2Rows()
    val got = CowTable
      .snapshotDiff(spark, 2, 3)
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("change_type"), r.getAs[Long]("old_cents"), r.getAs[Long]("new_cents")))
      .toSet
    val expected = v2.collect {
      case (k, c) if k % 101 == 0 && (k / CowTable.BucketWidth) % 7 == 1 =>
        (k, "D", c, -1L)
      case (k, c) if k % 103 == 0 && (k / CowTable.BucketWidth) % 7 == 3 && c != 50000L + k % 1000 =>
        (k, "U", c, 50000L + k % 1000)
    }.toSet
    assert(got === expected)
    // sf0.001's key span stops in bucket 1, so the upsert stripe (bucket
    // % 7 == 3) can be empty here — U/I classification is pinned by the
    // scratch-merge test below; the delete stripe must fire at every SF
    assert(got.exists(_._2 == "D"))
  }

  test("whole-bucket delete drops the bucket from the manifest; absent-key deletes rewrite nothing") {
    import spark.implicits._
    CowTable.ensure(spark, sf)
    val v3man = CowTable.manifest(spark, 3).collect().map(r => r.getAs[Long]("bucket") -> r.getAs[String]("path")).toMap
    val noChanges = Seq.empty[(Long, Long)].toDF("k", "cents")
    try {
      // delete EVERY key of one bucket → the bucket must vanish from v98
      val victim = v3man.keySet.min
      val victimKeys = CowTable
        .read(spark, 3)
        .where(org.apache.spark.sql.functions.expr(s"k div ${CowTable.BucketWidth}L = $victim"))
        .select("k")
      CowTable.merge(spark, 3, 98, noChanges, deletes = victimKeys)
      val v98 = CowTable.manifest(spark, 98).collect().map(r => r.getAs[Long]("bucket") -> r.getAs[String]("path")).toMap
      assert(!v98.contains(victim))
      assert(v98 === v3man - victim) // every other bucket carried by reference
      // deletes of keys no snapshot holds: nothing rewrites, all carried
      CowTable.merge(spark, 3, 97, noChanges, deletes = Seq(20000000L, 20000001L).toDF("k"))
      val v97 = CowTable.manifest(spark, 97).collect().map(r => r.getAs[Long]("bucket") -> r.getAs[String]("path")).toMap
      assert(v97 === v3man)
      // absent KEY in a PRESENT bucket: the key probe must carry the
      // bucket untouched (advice-found: bucket presence alone used to
      // force a byte-identical rewrite under a fresh manifest path)
      val v3keys = CowTable.read(spark, 3).select("k").collect().map(_.getLong(0)).toSet
      val (pb, pbKeys) = v3keys.groupBy(_ / CowTable.BucketWidth).find(_._2.size < CowTable.BucketWidth).get
      val absentKey = (pb * CowTable.BucketWidth until (pb + 1) * CowTable.BucketWidth)
        .find(k => !pbKeys.contains(k))
        .get
      CowTable.merge(spark, 3, 95, noChanges, deletes = Seq(absentKey).toDF("k"))
      val v95 = CowTable.manifest(spark, 95).collect().map(r => r.getAs[Long]("bucket") -> r.getAs[String]("path")).toMap
      assert(v95 === v3man)
      // delete-wins in a NEW bucket too (review-found): a key inserted and
      // deleted in the same merge must not survive just because its bucket
      // had no prior file — and a surviving sibling insert still lands
      CowTable.merge(
        spark, 3, 96,
        changes = Seq((30000000L, 5L), (30000001L, 6L)).toDF("k", "cents"),
        deletes = Seq(30000000L).toDF("k")
      )
      val v96 = CowTable.read(spark, 96).collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("cents")).toMap
      assert(!v96.contains(30000000L))
      assert(v96(30000001L) === 6L)
    } finally {
      for (n <- Seq("v98", "manifest_v98", "v97", "manifest_v97", "v96", "manifest_v96", "v95", "manifest_v95")) {
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

  test("incrementally-maintained MV equals the direct v3 aggregate") {
    import org.apache.spark.sql.functions._
    CowTable.ensure(spark, sf)
    val got = Warehouse
      .queries("x85_incremental_mv")(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n_rows"), r.getAs[Long]("total_cents")))
      .toSet
    val direct = CowTable
      .read(spark, 3)
      .withColumn("bucket", expr(s"k div ${CowTable.BucketWidth}L"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("cents").as("t"))
      .collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n"), r.getAs[Long]("t")))
      .toSet
    assert(got === direct)
  }

  // LAST on purpose: executes the vacuum (destroys expired v1 files),
  // verifies retained snapshots survive and expired time travel dies,
  // then rebuilds the fixture from scratch for whoever runs next.
  test("executed vacuum deletes only unreachable dirs; retained snapshots survive, expired ones die") {
    CowTable.ensure(spark, sf)
    val (orphans, all) = CowTable.vacuumPlan(spark, Seq(2, 3))
    assert(orphans.nonEmpty && orphans.size < all.size)
    val v3Before = CowTable.read(spark, 3).collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("cents")).toMap
    try {
      orphans.foreach(p => org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
      // retained snapshots: fully readable, identical content
      val v3After = CowTable.read(spark, 3).collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("cents")).toMap
      assert(v3After === v3Before)
      assert(CowTable.read(spark, 2).count() > 0)
      // expired snapshot: its rewritten-away files are gone → read fails
      intercept[Exception] { CowTable.read(spark, 1).count() }
    } finally {
      // rebuild the artifact so later suites/gates see the steady state
      new java.io.File(s"${CowTable.dir}/src_key").delete()
      CowTable.ensure(spark, sf)
    }
  }
}
