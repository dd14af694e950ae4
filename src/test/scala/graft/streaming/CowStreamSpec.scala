package graft.streaming

import graft.TestSpark
import graft.sources.CowTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Streaming MERGE INTO the COW table: every microbatch commits one
  * snapshot version (manifest publication = the commit point), upserts
  * and tombstone deletes apply with in-batch keep-latest, history stays
  * queryable per batch, and untouched buckets move between versions by
  * reference. */
class CowStreamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def readMap(root: String, v: Int): Map[Long, Long] =
    CowTable
      .read(spark, v, root)
      .collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Long]("cents"))
      .toMap

  test("microbatches commit snapshot versions: upserts, tombstones, per-batch time travel") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val work = java.nio.file.Files.createTempDirectory("cow_stream").toString
    CowStream.init(spark, s"$work/table")
    val input = MemoryStream[(Long, java.lang.Long, Long)] // (k, cents|null=delete, seq)
    val q = CowStream.mergeSink(
      input.toDF().toDF("k", "cents", "seq"),
      checkpoint = s"$work/ckpt",
      root = s"$work/table",
      startVersion = 0
    )
    try {
      // batch 0: inserts into two far-apart buckets, with an in-batch
      // overwrite of k=10 (seq 2 beats seq 1)
      input.addData((10L, java.lang.Long.valueOf(100L), 1L), (10L, java.lang.Long.valueOf(150L), 2L), (5000L, java.lang.Long.valueOf(700L), 1L))
      q.processAllAvailable()
      assert(readMap(s"$work/table", 1) === Map(10L -> 150L, 5000L -> 700L))

      // batch 1: update one key, insert another bucket
      input.addData((10L, java.lang.Long.valueOf(160L), 3L), (99999L, java.lang.Long.valueOf(900L), 1L))
      q.processAllAvailable()
      assert(readMap(s"$work/table", 2) === Map(10L -> 160L, 5000L -> 700L, 99999L -> 900L))

      // batch 2: tombstone k=5000 (cents NULL), upsert k=99999
      input.addData((5000L, null, 1L), (99999L, java.lang.Long.valueOf(950L), 2L))
      q.processAllAvailable()
      assert(readMap(s"$work/table", 3) === Map(10L -> 160L, 99999L -> 950L))

      // per-batch time travel: version 1 still reads as committed then
      assert(readMap(s"$work/table", 1) === Map(10L -> 150L, 5000L -> 700L))

      // carry-by-reference across commits: bucket of k=10 was untouched by
      // batch 2, so v3's manifest must reference v2's directory verbatim
      val m2 = CowTable.manifest(spark, 2, s"$work/table").collect()
        .map(r => r.getAs[Long]("bucket") -> r.getAs[String]("path")).toMap
      val m3 = CowTable.manifest(spark, 3, s"$work/table").collect()
        .map(r => r.getAs[Long]("bucket") -> r.getAs[String]("path")).toMap
      val b10 = 10L / CowTable.BucketWidth
      assert(m3(b10) === m2(b10))
      // and the tombstoned bucket is GONE from v3's manifest
      assert(!m3.contains(5000L / CowTable.BucketWidth))
    } finally q.stop()
  }

  test("version = f(batch id): one commit per batch, idempotent re-merge of the same batch") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val work = java.nio.file.Files.createTempDirectory("cow_stream_rs").toString
    CowStream.init(spark, s"$work/table")
    val input = MemoryStream[(Long, java.lang.Long, Long)]
    val q = CowStream.mergeSink(
      input.toDF().toDF("k", "cents", "seq"),
      s"$work/ckpt",
      s"$work/table",
      startVersion = 0
    )
    try {
      input.addData((1L, java.lang.Long.valueOf(11L), 1L)); q.processAllAvailable()
      input.addData((2L, java.lang.Long.valueOf(22L), 1L)); q.processAllAvailable()
    } finally q.stop()
    assert(readMap(s"$work/table", 2) === Map(1L -> 11L, 2L -> 22L))
    assert(!new java.io.File(s"$work/table/manifest_v3").exists())
    // crash-replay equivalence: re-running a batch's merge against the
    // same predecessor (what a foreachBatch replay does, since the target
    // version is derived from the batch id) rewrites version 2 to the
    // identical state instead of committing a spurious version
    CowTable.merge(
      spark, fromVersion = 1, toVersion = 2,
      changes = Seq((2L, 22L)).toDF("k", "cents"), root = s"$work/table"
    )
    assert(readMap(s"$work/table", 2) === Map(1L -> 11L, 2L -> 22L))
    assert(!new java.io.File(s"$work/table/manifest_v3").exists())
  }
}
