package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x216/x217: pseudonymization invariants hold on real tables, and the
  * Hamilton allocation matches a reference and its quota law. */
class PseudonymizeApportionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("x216: per-nation counts and cardinalities survive tokenization everywhere") {
    val rows = Sampling.queries("x216_pseudonymize")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("counts_survive"), s"nation ${r.get(0)}: counts drifted")
      assert(r.getAs[Boolean]("no_collisions"), s"nation ${r.get(0)}: token collision")
    }
  }

  test("x217: quotas sum to exactly K and never stray beyond the floor/ceil band") {
    val rows = Sampling.queries("x217_apportion")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    val totalQuota = rows.map(_._4).sum
    assert(totalQuota === 1000L, "Hamilton must hit K exactly")
    val totalMass = rows.map(_._2).sum
    rows.foreach { case (src, m, base, quota) =>
      assert(quota === base || quota === base + 1, s"$src quota outside floor/ceil")
      val exactScaled = 1000.0 * m / totalMass
      assert(quota >= exactScaled.floor.toLong && quota <= exactScaled.ceil.toLong, s"$src off-proportion")
    }
    // reference replay: leftover seats go to the largest remainders
    val withRem = rows.map { case (src, m, base, quota) => (src, (1000L * m) % totalMass, quota - base) }
    val leftover = withRem.map(_._3).sum
    val expectExtra = withRem.sortBy(t => (-t._2, t._1)).take(leftover.toInt).map(_._1).toSet
    withRem.foreach { case (src, _, extra) =>
      assert((extra == 1L) === expectExtra.contains(src), s"$src seat assignment")
    }
  }
}
