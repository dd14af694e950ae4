package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x222: the layout verdicts — hash assignment interleaves every file
  * (depth ≈ all of them), z-order keeps both dims shallow; depths are
  * bounded by the file count and the output is deterministic. */
class OverlapDepthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val rows =
    Sampling.queries("x222_overlap_depth")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap

  test("hash layout interleaves nearly every file; z-order stays shallow on both dims") {
    val (nFiles, hashDepth) = rows(("hash", "cust"))
    assert(hashDepth >= nFiles - 8, s"hash depth $hashDepth should approach $nFiles")
    val zc = rows(("zorder", "cust"))._2
    val zd = rows(("zorder", "days"))._2
    assert(zc <= hashDepth / 2, s"z-order cust depth $zc vs hash $hashDepth")
    assert(zd <= hashDepth / 2, s"z-order days depth $zd vs hash $hashDepth")
    assert(zc >= 1 && zd >= 1, "depth is at least 1 wherever files exist")
  }

  test("depths never exceed the file count and the profile is deterministic") {
    rows.foreach { case ((l, dim), (n, depth)) =>
      assert(depth <= n, s"$l/$dim depth $depth > $n files")
    }
    val again = Sampling.queries("x222_overlap_depth")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(again === rows)
  }
}
