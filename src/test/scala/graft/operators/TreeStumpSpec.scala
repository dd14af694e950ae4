package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x221: the greedy exact search must RECOVER the planted concept
  * (disc ≥ 6 ∧ qty ≥ 25, 5% label noise) — root on one conjunct, the
  * relevant child on the other — and leaf majorities must beat the
  * noise floor. */
class TreeStumpSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val rows =
    Analytic.queries("x221_tree_stump")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))

  test("the root split recovers the discount conjunct exactly") {
    val root = rows.find(_._1 == "0root").get
    assert(root._2 === "disc")
    assert(root._3 === 5L, "split at disc <= 5, i.e. the planted disc >= 6 boundary")
  }

  test("the positive-side child recovers the quantity conjunct") {
    // the right child (disc >= 6 side) must split on qty at the 25 boundary
    val r = rows.find(_._1 == "1R").get
    assert(r._2 === "qty")
    assert(r._3 === 24L)
  }

  test("leaves are pure up to the 5% noise; the concept leaf is majority-positive") {
    val leaves = rows.filter(_._1.startsWith("2"))
    assert(leaves.length === 4)
    leaves.foreach { case (node, _, _, n, _, acc) =>
      assert(n > 0, node)
      assert(acc >= 900000L, s"$node accuracy $acc below the noise floor")
    }
    val rr = rows.find(_._1 == "2RR").get
    assert(rr._5 * 2 > rr._4, "the (disc>=6, qty>=25) leaf is majority-positive")
  }

  test("training is deterministic") {
    val again = Analytic.queries("x221_tree_stump")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(again.toSeq === rows.toSeq)
  }
}
