package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x203 Heaps fit: the planted β=1/2 stream recovers its exponent, the
  * saturated corpus face reads 0, and the planted V(n)=√n construction is
  * exact at the power-of-four checkpoints. */
class HeapsFitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val rows =
    TextAnalysis.queries("x203_heaps_fit")(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))

  test("planted face: V(n) tracks isqrt(n) at the 16 checkpoints") {
    val planted = rows.filter(_._1 == 1L).sortBy(_._2)
    assert(planted.length === 16)
    planted.foreach { case (_, _, nDocs, nTok, vocab, _) =>
      assert(nDocs === nTok, "positions are tokens on the planted face")
      // value v becomes REACHABLE at p = v², so V(n) ≤ isqrt(n)+1 exactly;
      // the lower slack covers top values whose hash hasn't drawn them yet
      val isq = math.sqrt(nTok.toDouble).toLong
      assert(vocab <= isq + 1, s"V($nTok) = $vocab above the reachability bound ${isq + 1}")
      assert(vocab >= isq - 8, s"V($nTok) = $vocab far below isqrt $isq")
    }
    assert(planted.last._5 === 256L)
  }

  test("planted slope recovers beta ~ 1/2; saturated corpus slope is 0") {
    val pSlope = rows.filter(_._1 == 1L).map(_._6).distinct
    assert(pSlope.length === 1)
    assert(pSlope.head >= 350000L && pSlope.head <= 550000L, s"planted slope ${pSlope.head}")
    val cSlope = rows.filter(_._1 == 0L).map(_._6).distinct
    assert(cSlope === Seq(0L), "closed-vocabulary corpus must fit flat")
  }

  test("both faces: cumulative counts and vocab are monotone non-decreasing") {
    Seq(0L, 1L).foreach { id =>
      val f = rows.filter(_._1 == id).sortBy(_._2)
      assert(f.map(_._4) === f.map(_._4).sorted, s"face $id n_tokens monotone")
      assert(f.map(_._5) === f.map(_._5).sorted, s"face $id vocab monotone")
    }
  }
}
