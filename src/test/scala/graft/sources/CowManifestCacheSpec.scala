package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The manifest cache (r10): list rows and group-file entries memoized
  * per path behind an FS freshness signature. The load-bearing laws:
  *
  *   - COMMITS ARE VISIBLE: a read AFTER a merge sees v+1 even though v's
  *     manifests were cache-warm (new versions claim new paths; the cache
  *     can't serve v+1 from v).
  *   - SAME-PATH REWRITES ARE VISIBLE: rewriting a manifest at an
  *     existing path (fixture rebuilds, re-staged branches) changes the
  *     directory signature, so the stale cached payload is refused — the
  *     failure mode a pure path-keyed memo would have.
  *   - TIME TRAVEL UNAFFECTED: the old snapshot re-reads bit-identically
  *     through the cache after later commits.
  */
class CowManifestCacheSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def buildBase(root: String, n: Long, mult: Long): Unit = {
    val base = spark
      .range(n)
      .select(col("id").as("k"), (col("id") * mult).as("cents"))
      .withColumn("bucket", expr(s"k div ${CowTable.BucketWidth}L"))
    base.write.mode("overwrite").partitionBy("bucket").parquet(s"$root/v1")
    CowTable.writeManifestRows(spark, 1, CowTable.statsOf(spark, s"$root/v1", schemaId = 1), root)
  }

  test("read-after-merge sees v+1 with v cache-warm; time travel intact") {
    val root = TestSpark.tempDir() + "/cowcache_commit"
    buildBase(root, 4096, 3L)
    // warm every cache layer on v1
    assert(CowTable.read(spark, 1, root).count() === 4096)
    assert(CowTable.entries(spark, 1, root).nonEmpty)
    CowTable.merge(spark, 1, 2, Seq((5L, 999L), (9999999L, 1L)).toDF("k", "cents"), root = root)
    val v2 = CowTable.read(spark, 2, root)
    assert(v2.where(col("k") === 5L).select("cents").collect().head.getLong(0) === 999L)
    assert(v2.count() === 4097)
    // the untouched snapshot re-reads identically through the warm cache
    assert(
      CowTable.read(spark, 1, root).where(col("k") === 5L).select("cents").collect().head.getLong(0) === 15L)
    assert(CowTable.read(spark, 1, root).count() === 4096)
  }

  test("same-path manifest rewrite is seen fresh (signature refuses the stale hit)") {
    val root = TestSpark.tempDir() + "/cowcache_rewrite"
    buildBase(root, 2048, 3L)
    val before = CowTable.entries(spark, 1, root)
    assert(before.map(_.nRows).sum === 2048)
    // rebuild the SAME version at the SAME list path with different data —
    // the fixture-rebuild shape (ensure() deletes and recreates roots)
    buildBase(root, 1024, 7L)
    val after = CowTable.entries(spark, 1, root)
    assert(after.map(_.nRows).sum === 1024)
    assert(
      CowTable.read(spark, 1, root).agg(sum("cents")).collect().head.getLong(0)
        === (0L until 1024L).map(_ * 7L).sum)
    // pruned planning also refuses the stale list
    val pruned = CowTable.pruneEntriesRange(spark, CowTable.manifestDir(1, root), 0L, 5000L)
    assert(pruned === after)
  }
}
