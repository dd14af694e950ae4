package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** x169 PAV laws against the brute-force minimax definition
  * fitted(i) = max_{j≤i} min_{k≥i} mean(groups j..k) — the same
  * characterization the DuckDB oracle replays, here over adversarial
  * hand sequences the fixture distribution can't be forced to produce.
  */
class IsotonicSpec extends AnyFunSuite {

  /** brute-force minimax in floor-ppm (floor commutes with min/max) */
  private def minimax(groups: Seq[(Long, Long)]): Seq[Long] =
    groups.indices.map { i =>
      (0 to i).map { j =>
        (i until groups.length).map { k =>
          val s = (j to k).map(groups(_)._1).sum
          val n = (j to k).map(groups(_)._2).sum
          s * 1000000L / n
        }.min
      }.max
    }

  private val cases: Seq[Seq[(Long, Long)]] = Seq(
    // strict violation run: all pooled into one block
    Seq((9L, 10L), (5L, 10L), (1L, 10L)),
    // already isotonic: PAV is the identity
    Seq((1L, 10L), (5L, 10L), (9L, 10L)),
    // single violation pair inside an otherwise isotonic run
    Seq((1L, 10L), (8L, 10L), (2L, 10L), (9L, 10L)),
    // unequal weights: the heavy group dominates its pooled block
    Seq((0L, 1L), (90L, 100L), (0L, 1L), (5L, 5L)),
    // cascading pools: each new group re-triggers earlier merges
    Seq((5L, 10L), (4L, 10L), (3L, 10L), (2L, 10L), (1L, 10L), (6L, 10L)),
    // equal means pool too (the >= in the compare)
    Seq((1L, 2L), (2L, 4L), (3L, 6L)),
    Seq((7L, 7L)),
    // zeros and full-rate groups at the ends
    Seq((0L, 5L), (0L, 3L), (4L, 4L), (2L, 2L))
  )

  test("PAV equals the minimax characterization on adversarial sequences") {
    for (c <- cases) assert(Sampling.pav(c) === minimax(c), s"case $c")
  }

  test("the fit is monotone nondecreasing and mass-bracketing") {
    for (c <- cases) {
      val f = Sampling.pav(c)
      assert(f.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)), s"non-monotone for $c")
      // every fitted value stays inside the observed rate range
      val ppm = c.map { case (s, n) => s * 1000000L / n }
      assert(f.forall(v => v >= ppm.min && v <= ppm.max), s"out of range for $c")
    }
  }
}
