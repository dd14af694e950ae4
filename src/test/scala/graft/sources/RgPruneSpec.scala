package graft.sources

import graft.{Graft, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** x124's pruning facts, which the gate can't pin (row-group geometry is
  * writer-dependent): the fixture really is multi-row-group; a covering
  * range and an empty range scan ZERO files; a narrow range scans a
  * strict subset; and the pruned count equals the naive count for a sweep
  * of ranges including row-group-boundary-straddling ones. */
class RgPruneSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val path = FooterStats.ensureSorted(spark, sf)
  private lazy val stats = FooterStats.rgStats(spark, path, "k")

  test("fixture is genuinely multi-row-group (the grain below file level)") {
    val files = stats.map(_.file).distinct
    assert(files.size == 4)
    assert(stats.size > files.size, s"only ${stats.size} row groups across ${files.size} files")
  }

  test("covering and empty ranges are pure metadata: zero files scanned") {
    val (nAll, t1, i1, _, b1, scanAll, _) = FooterStats.rangeCount(spark, path, "k", 0L, Long.MaxValue)
    assert(scanAll == 0L && b1 == 0L && i1 == t1)
    assert(nAll == Graft.table(spark, sf, "lineitem").count())
    val (nNone, _, i2, o2, _, scanNone, _) =
      FooterStats.rangeCount(spark, path, "k", Long.MaxValue - 10, Long.MaxValue)
    assert(nNone == 0L && scanNone == 0L && i2 == 0L && o2 == stats.size)
  }

  test("narrow range scans a strict subset of files; count is exact") {
    val keys = stats.map(_.minK).sorted
    val (lo, hi) = (keys(keys.size / 3), keys(keys.size / 2)) // straddles group bounds
    val (n, t, i, o, b, scanned, total) = FooterStats.rangeCount(spark, path, "k", lo, hi)
    assert(t == i + o + b)
    assert(scanned < total, s"narrow range scanned all $total files")
    val naive = Graft
      .table(spark, sf, "lineitem")
      .where(col("l_orderkey").between(lo, hi))
      .count()
    assert(n == naive)
  }

  test("pruned count equals naive count across a deterministic range sweep") {
    val maxK = stats.map(_.maxK).max
    val probes = Seq((1L, maxK / 7), (maxK / 5, maxK / 3), (maxK / 2, maxK), (17L, 17L))
    probes.foreach { case (lo, hi) =>
      val (n, _, _, _, _, _, _) = FooterStats.rangeCount(spark, path, "k", lo, hi)
      val naive = Graft
        .table(spark, sf, "lineitem")
        .where(col("l_orderkey").between(lo, hi))
        .count()
      assert(n == naive, s"range [$lo,$hi]")
    }
  }
}
