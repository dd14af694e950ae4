package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Manifest-list scan planning (x226). The load-bearing assertion is the
  * CORRUPTION ISOLATION test: every manifest file and data directory
  * OUTSIDE the queried key range is overwritten with garbage bytes on
  * disk, and planning + reading still succeed with identical results —
  * physical proof that the pruned metadata is never opened and the full
  * entry set never materializes (the r7 "manifest as a dataset" item;
  * `CowTable.entries`-style whole-manifest driver reads would die here).
  */
class ManifestTreeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  /** keys 0..8191 with holes (k % 7 != 0 dropped), width-64 buckets →
    * 128 buckets in 16 groups of 8
    */
  private def buildFixture(): String = {
    val root = TestSpark.tempDir() + "/mtree"
    val base = spark
      .range(8192)
      .where(col("id") % 7 =!= 0)
      .select(col("id").as("k"), (col("id") * 3L).as("cents"))
      .withColumn("bucket", expr("k div 64L"))
    ManifestTree.build(spark, base, root)
    root
  }

  test("planned read equals naive full-manifest read on every range shape") {
    val root = buildFixture()
    for ((lo, hi) <- Seq((1000L, 2000L), (0L, 8191L), (63L, 64L), (8000L, 9000L))) {
      val p = ManifestTree.planRange(spark, lo, hi, root)
      val planned = ManifestTree.readTasks(spark, p, lo, hi).orderBy("k").collect()
      val naive = ManifestTree.readRangeNaive(spark, lo, hi, root).orderBy("k").collect()
      assert(planned.toSeq === naive.toSeq, s"range [$lo,$hi]")
    }
  }

  test("tree accounting: two-level pruning visible and exact") {
    val root = buildFixture()
    // [1000, 2000] spans buckets 15..31 → groups 1..3 of 16
    val p = ManifestTree.planRange(spark, 1000L, 2000L, root)
    assert(p.nManifestsTotal === 16L)
    assert(p.nManifestsRead === 3L)
    assert(p.nFilesRead === 17L)
    // planned rows = all rows of the 17 files (7-divisible keys dropped)
    assert(p.nRowsPlanned === (15L * 64L to 31L * 64L + 63L).count(_ % 7 != 0).toLong)
    assert(p.taskPaths.length === 17)
  }

  test("empty range: zero manifests opened, empty task list") {
    val root = buildFixture()
    val p = ManifestTree.planRange(spark, 100000L, 200000L, root)
    assert(p.nManifestsTotal === 16L)
    assert(p.nManifestsRead === 0L)
    assert(p.taskPaths.isEmpty)
  }

  test("corruption isolation: pruned metadata and data are never opened") {
    val root = buildFixture()
    val (lo, hi) = (1000L, 2000L)
    val before = ManifestTree.readTasks(spark, ManifestTree.planRange(spark, lo, hi, root), lo, hi)
      .agg(count(lit(1)), sum("cents")).collect().head
    // trash every manifest file for groups outside 1..3 and every data
    // dir for buckets outside 15..31
    def trash(f: java.io.File): Unit =
      java.nio.file.Files.write(f.toPath, Array.fill[Byte](32)(0x5a))
    val mdirs = new java.io.File(s"$root/manifests").listFiles().filter(_.getName.startsWith("g="))
    val trashedManifests = mdirs.filter { d =>
      val g = d.getName.stripPrefix("g=").toLong
      g < 1 || g > 3
    }
    trashedManifests.foreach(_.listFiles().filter(_.getName.endsWith(".parquet")).foreach(trash))
    assert(trashedManifests.length === 13) // corruption is real and broad
    val ddirs = new java.io.File(s"$root/data").listFiles().filter(_.getName.startsWith("bucket="))
    ddirs
      .filter { d =>
        val b = d.getName.stripPrefix("bucket=").toLong
        b < 15 || b > 31
      }
      .foreach(_.listFiles().filter(_.getName.endsWith(".parquet")).foreach(trash))
    // planning + reading through the wreckage: identical result
    val p = ManifestTree.planRange(spark, lo, hi, root)
    assert(p.nManifestsRead === 3L)
    val after = ManifestTree.readTasks(spark, p, lo, hi)
      .agg(count(lit(1)), sum("cents")).collect().head
    assert(after === before)
    // and the naive whole-manifest path DOES die on the same tree —
    // the corruption is load-bearing, not cosmetic
    intercept[Throwable] {
      ManifestTree.readRangeNaive(spark, lo, hi, root).collect()
    }
  }
}
