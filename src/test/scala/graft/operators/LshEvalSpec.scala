package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x224: the harness's accounting identities, agreement with the exact
  * truth leg it wraps, and sane operating-point verdicts for 8×2 bands
  * at τ = 0.6. */
class LshEvalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val row = Dedup.queries("x224_lsh_eval")(spark, sf).collect().head
  private lazy val (nTruth, nPred, tp, fp, fn) =
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))

  test("accounting identities hold and truth matches the exact join's output") {
    assert(nTruth === tp + fn)
    assert(nPred === tp + fp)
    val exactPairs = Dedup.queries("x207_prefix_join")(spark, sf).count()
    assert(nTruth === exactPairs, "the truth leg IS x207's pair set")
  }

  test("the 8x2 banding at tau=0.6 operates in a sane region") {
    val (p, r) = (row.getLong(5), row.getLong(6))
    assert(r >= 700000L, s"recall ${r}e-6 collapsed — banding broken")
    assert(p >= 500000L, s"precision ${p}e-6 collapsed — estimate filter broken")
    val f1 = row.getLong(7)
    assert(f1 <= math.max(p, r) && f1 >= math.min(p, r), "F1 sits between P and R")
  }
}
