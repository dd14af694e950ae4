package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x208 AMS sketch: the single-key closed form (every estimator is exact),
  * the two-key support law, and the concentration band on real data. */
class AmsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def run(dir: String): (Long, Long, Long) = {
    val r = Advanced.queries("x208_ams_f2")(spark, dir).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  private def fixture(keys: Seq[Long]): String = {
    import spark.implicits._
    val dir = TestSpark.tempDir()
    TestSpark.writeTable(dir, "lineitem", keys.toDF("l_suppkey"))
    dir
  }

  test("single key: Z_j = ±f for every j, so the median is exactly f² (err 0)") {
    val (exact, est, err) = run(fixture(Seq.fill(37)(5L)))
    assert(exact === 37L * 37L)
    assert(est === exact, "every tug-of-war estimator must be exact on one key")
    assert(err === 0L)
  }

  test("two equal keys: every estimator lands on {0, 4f²}; exact F2 = 2f²") {
    val f = 20L
    val (exact, est, _) = run(fixture(Seq.fill(f.toInt)(1L) ++ Seq.fill(f.toInt)(2L)))
    assert(exact === 2 * f * f)
    assert(est === 0L || est === 4 * f * f, s"estimator $est outside the support")
  }

  test("real stream: the 31-estimator median lands within 2× of exact F2") {
    val (exact, est, err) = run("/root/testdata/sf0.001")
    assert(exact > 0L)
    assert(est > 0L, "median estimator must not be degenerate on real data")
    assert(err < 1000000L, s"relative error ${err}e-6 exceeds 100%")
  }
}
