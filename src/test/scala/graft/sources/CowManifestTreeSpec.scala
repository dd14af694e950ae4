package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The two-level manifest tree on the WRITE-path tables (x263) — the x226
  * ManifestTree pattern eaten by [[CowTable]], the r8 verdict's top task.
  * The load-bearing assertions:
  *
  *   - CORRUPTION ISOLATION: every group-manifest file and data directory
  *     outside the targeted buckets is overwritten with garbage on disk,
  *     and BOTH a pruned range read AND a localized MERGE still succeed —
  *     physical proof that prune happens BEFORE collect and the full
  *     entry set never materializes anywhere in the planning path (the
  *     old `entries()`-based merge would die here).
  *   - CARRY BY REFERENCE: a localized merge's new manifest shares every
  *     untouched group's file by PATH IDENTITY (zero metadata rewritten),
  *     and metadata-only commits (rollback) are pure list copies.
  */
class CowManifestTreeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  /** keys 0..32767 with holes (k % 11 == 0 dropped), width-1024 buckets →
    * 32 buckets in 4 groups of 8; cents = 3k */
  private def buildFixture(): String = {
    val root = TestSpark.tempDir() + "/cowmtree"
    val base = spark
      .range(32768)
      .where(col("id") % 11 =!= 0)
      .select(col("id").as("k"), (col("id") * 3L).as("cents"))
      .withColumn("bucket", expr(s"k div ${CowTable.BucketWidth}L"))
    base.write.partitionBy("bucket").parquet(s"$root/v1")
    CowTable.writeManifestRows(spark, 1, CowTable.statsOf(spark, s"$root/v1", schemaId = 1), root)
    root
  }

  private def listRows(root: String, v: Int): Map[Long, String] =
    spark.read
      .parquet(s"$root/manifest_v$v")
      .select("g", "mpath")
      .collect()
      .map(r => r.getAs[Long]("g") -> r.getAs[String]("mpath"))
      .toMap

  test("pruned planning equals the definitional filter on every shape") {
    val root = buildFixture()
    val man = CowTable.manifestDir(1, root)
    val all = CowTable.entriesAt(spark, man)
    assert(all.size === 32)
    for ((lo, hi) <- Seq((2048L, 4095L), (0L, 40000L), (1023L, 1024L), (50000L, 60000L))) {
      val pruned = CowTable.pruneEntriesRange(spark, man, lo, hi)
      assert(pruned === all.filter(e => e.maxKey >= lo && e.minKey <= hi), s"range [$lo,$hi]")
    }
    for (bs <- Seq(Set(2L, 3L), Set(0L, 31L), Set(99L), Set.empty[Long]))
      assert(CowTable.pruneEntries(spark, man, bs) === all.filter(e => bs(e.bucket)), s"buckets $bs")
  }

  test("localized merge carries untouched groups by path identity") {
    val root = buildFixture()
    val changes = spark
      .range(32768)
      .where(col("id") % 11 =!= 0 && col("id") % 5 === 0)
      .where(expr(s"id div ${CowTable.BucketWidth}L").isin(2L, 3L))
      .select(col("id").as("k"), (col("id") * 7L).as("cents"))
    CowTable.merge(spark, 1, 2, changes, root = root)
    val l1 = listRows(root, 1)
    val l2 = listRows(root, 2)
    assert(l1.keySet === l2.keySet)
    assert(l2(0L) !== l1(0L), "touched group 0 must rewrite")
    for (g <- Seq(1L, 2L, 3L))
      assert(l2(g) === l1(g), s"untouched group $g must carry by reference")
    // rollback is a pure list copy: every group file path-identical
    CowTable.rollback(spark, 1, 5, root)
    assert(listRows(root, 5) === l1)
  }

  test("corruption isolation: pruned plans and localized merges never open other groups") {
    val root = buildFixture()
    val man = CowTable.manifestDir(1, root)
    val (lo, hi) = (2048L, 4095L) // buckets 2..3, group 0
    val before = CowTable
      .readEntries(spark, CowTable.pruneEntriesRange(spark, man, lo, hi))
      .where(col("k").between(lo, hi))
      .agg(count(lit(1)), sum("cents"))
      .collect()
      .head
    // trash every group-manifest file outside group 0 and every data
    // bucket dir outside 2..3
    def trash(f: java.io.File): Unit =
      java.nio.file.Files.write(f.toPath, Array.fill[Byte](32)(0x5a))
    def parquets(d: java.io.File): Seq[java.io.File] =
      Option(d.listFiles()).map(_.toSeq).getOrElse(Seq.empty).filter(_.getName.endsWith(".parquet"))
    val gdirs = new java.io.File(s"$root/mfiles/v1").listFiles().filter(_.getName.startsWith("gp="))
    val trashedGroups = gdirs.filter(_.getName.stripPrefix("gp=").toLong != 0L)
    trashedGroups.foreach(d => parquets(d).foreach(trash))
    assert(trashedGroups.length === 3) // corruption is real and broad
    new java.io.File(s"$root/v1")
      .listFiles()
      .filter(d => d.getName.startsWith("bucket=") && {
        val b = d.getName.stripPrefix("bucket=").toLong
        b != 2L && b != 3L
      })
      .foreach(d => parquets(d).foreach(trash))
    // pruned plan + read through the wreckage: identical result
    val planned = CowTable.pruneEntriesRange(spark, man, lo, hi)
    assert(planned.map(_.bucket).toSet === Set(2L, 3L))
    val after = CowTable
      .readEntries(spark, planned)
      .where(col("k").between(lo, hi))
      .agg(count(lit(1)), sum("cents"))
      .collect()
      .head
    assert(after === before)
    // a localized MERGE plans, rewrites and commits through the wreckage
    val changes = spark
      .range(2048, 4096)
      .where(col("id") % 11 =!= 0 && col("id") % 5 === 0)
      .select(col("id").as("k"), (col("id") * 7L).as("cents"))
    CowTable.merge(spark, 1, 2, changes, root = root)
    val merged = CowTable
      .readEntries(spark, CowTable.pruneEntries(spark, CowTable.manifestDir(2, root), Set(2L, 3L)))
      .where(col("k") % 5 === 0)
      .agg(sum("cents"))
      .collect()
      .head
    val expected = (2048L until 4096L).filter(k => k % 11 != 0 && k % 5 == 0).map(_ * 7L).sum
    assert(merged.getLong(0) === expected)
    // and the FULL entry listing DOES die on the same tree — the
    // corruption is load-bearing, not cosmetic
    intercept[Throwable] {
      CowTable.entriesAt(spark, man)
    }
  }

  test("empty manifest round-trips (stream bootstrap) and merges cleanly") {
    val root = TestSpark.tempDir() + "/cowmtree_empty"
    CowTable.writeManifestRows(spark, 0, Seq.empty, root)
    assert(CowTable.entries(spark, 0, root) === Seq.empty)
    assert(CowTable.pruneEntries(spark, CowTable.manifestDir(0, root), Set(1L)) === Seq.empty)
    import spark.implicits._
    CowTable.merge(spark, 0, 1, Seq((5L, 100L), (2000L, 200L)).toDF("k", "cents"), root = root)
    val e1 = CowTable.entries(spark, 1, root)
    assert(e1.map(_.bucket).toSet === Set(0L, 1L))
    assert(CowTable.read(spark, 1, root).agg(sum("cents")).collect().head.getLong(0) === 300L)
  }
}
