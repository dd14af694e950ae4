package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Full-era GC (x229). The load-bearing test EXECUTES the vacuum: a
  * superseded DV sidecar whose data files a registered clone still
  * references is refused (still on disk, clone reads hash-equal after
  * the vacuum), and deregistering the clone releases the hold — the
  * registration is proven load-bearing, not decorative.
  */
class CowGcSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** keys 0..4999 → buckets 0..4; stripe deletes every 11th key of
    * buckets ≡ 0 (mod 2); clone pinned at the DV'd v2; v3 folds the DVs.
    */
  private def fixture(): (String, String) = {
    val root = TestSpark.tempDir() + "/gc"
    val cl = TestSpark.tempDir() + "/gc_clone"
    val base = spark
      .range(5000)
      .select(col("id").as("k"), (col("id") * 3L).as("cents"))
      .withColumn("bucket", expr(s"k div ${CowTable.BucketWidth}L"))
      .localCheckpoint()
    base.write.mode("overwrite").partitionBy("bucket").parquet(s"$root/v1")
    CowTable.writeManifestRows(spark, 1, CowTable.statsOf(spark, s"$root/v1", schemaId = 1), root)
    CowTable.morDelete(spark, 1, 2, base.where("k % 11 = 0 AND bucket % 2 = 0").select("k"), root)
    CowTable.cloneTable(spark, 2, cl, root)
    CowTable.foldDv(spark, 2, 3, root)
    (root, cl)
  }

  private def digest(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.groupBy().agg(count(lit(1)).as("n"), sum("cents").as("c")).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("vacuum refuses clone-held paths; deregistration releases them") {
    val (root, cl) = fixture()
    val cloneBefore = digest(CowTable.read(spark, 1, cl))
    val v3Before = digest(CowTable.read(spark, 3, root))
    val dv2 = new java.io.File(s"$root/dv_v2")
    assert(dv2.exists())

    // retain only v3 (no DV refs) — but the clone pins v2's world
    val (orphans, cands, cloneOnly) = CowTable.vacuumPlanFull(spark, Seq(3), root)
    assert(orphans.isEmpty, s"clone-held paths leaked into orphans: $orphans")
    assert(cloneOnly.exists(_.endsWith("/dv_v2")), "dv_v2 must be clone-held")
    assert(cloneOnly.nonEmpty && cands.nonEmpty)
    val deleted = CowTable.vacuumExecute(spark, Seq(3), root)
    assert(deleted.isEmpty)
    assert(dv2.exists(), "superseded DV deleted while a clone references its lineage")
    assert(digest(CowTable.read(spark, 1, cl)) === cloneBefore)
    assert(digest(CowTable.read(spark, 3, root)) === v3Before)

    // deregister → the hold releases: dv_v2 and the rewritten buckets'
    // v1 dirs become orphans and are actually collected
    CowTable.deregisterClone(root, cl)
    val (orphans2, _, cloneOnly2) = CowTable.vacuumPlanFull(spark, Seq(3), root)
    assert(cloneOnly2.isEmpty)
    assert(orphans2.exists(_.endsWith("/dv_v2")))
    val deleted2 = CowTable.vacuumExecute(spark, Seq(3), root)
    assert(deleted2.exists(_.endsWith("/dv_v2")))
    assert(!dv2.exists())
    // the retained snapshot is untouched; the abandoned clone is broken
    // by design (its hold was released)
    assert(digest(CowTable.read(spark, 3, root)) === v3Before)
    intercept[Throwable] { CowTable.read(spark, 1, cl).collect() }
  }

  test("accounting identities: orphans + referenced = candidates; clone-only ⊆ referenced") {
    val (root, _) = fixture()
    val (orphans, cands, cloneOnly) = CowTable.vacuumPlanFull(spark, Seq(2, 3), root)
    assert(orphans.toSet.subsetOf(cands.toSet))
    assert(cloneOnly.toSet.subsetOf(cands.toSet))
    assert((orphans.toSet intersect cloneOnly.toSet).isEmpty)
    // retaining v2 directly references the DV — nothing is clone-ONLY
    // except what v2 itself doesn't cover (nothing here)
    assert(cloneOnly.isEmpty)
    assert(orphans.isEmpty)
  }
}
