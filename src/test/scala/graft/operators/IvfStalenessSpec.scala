package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Index-staleness instrument (x275): census-law checks — the overlap is
  * a per-query [0,5] count over exactly the 10 query rows, and the corpus
  * mean is the exact integer fold of the per-query column (no hidden
  * float averaging). Component pipelines are spec'd in IncIvfSpec /
  * SimilaritySpec; this pins the instrument arithmetic itself.
  */
class IvfStalenessSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  test("overlap bounds, row universe, and the exact integer mean") {
    val rows = Similarity.queries("x275_ivf_staleness")(spark, d).collect()
    assert(rows.length === 10, "one row per query")
    val overlaps = rows.map(_.getAs[Long]("overlap5"))
    assert(overlaps.forall(h => h >= 0 && h <= 5))
    val mean = rows.head.getAs[Long]("mean_overlap_e6")
    assert(rows.forall(_.getAs[Long]("mean_overlap_e6") === mean), "corpus mean is a constant column")
    assert(mean === overlaps.sum * 1000000L / (overlaps.length * 5L), "mean is the exact integer fold")
    // the frozen index is stale, not broken: it must keep a clear majority
    // of the retrained index's top-5 at this SF
    assert(mean >= 500000, s"frozen-index overlap collapsed: $mean ppm")
  }
}
