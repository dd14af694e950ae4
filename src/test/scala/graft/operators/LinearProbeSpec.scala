package graft.operators

import graft.TestSpark
import graft.functions.Hashing
import org.scalatest.funsuite.AnyFunSuite

/** x179: the Cramer-solved probe recovers the PLANTED coefficients and
  * matches an independent in-memory replay of the floored-cell chain. */
class LinearProbeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.01"

  test("x179 recovers the planted (3,-2,1) betas and matches the in-memory Cramer replay") {
    import spark.implicits._
    val rows = spark.read
      .parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])]
      .collect()
    val data = rows.map { case (id, emb) =>
      val f = (0 until 3).map(i => math.round(emb(i).toDouble * 1000))
      val eps = Hashing.md5BucketOf(id.toString + "#n", 2001L) - 1000L
      val y = 3 * f(0) - 2 * f(1) + f(2) + eps
      (Seq(1L, f(0), f(1), f(2)), y)
    }
    val n = data.length.toLong
    def fdiv(p: BigInt, d: BigInt): BigInt = p - ((p % d + d) % d)
    def cell(s: Long): BigInt = fdiv(BigInt(s), BigInt(n)) / n
    val a = Array.tabulate(4, 4)((j, k) => cell(data.map(r => r._1(j) * r._1(k)).sum))
    val b = Array.tabulate(4)(j => cell(data.map(r => r._1(j) * r._2).sum))
    def det3(m: Array[Array[BigInt]]): BigInt =
      m(0)(0) * (m(1)(1) * m(2)(2) - m(1)(2) * m(2)(1)) -
        m(0)(1) * (m(1)(0) * m(2)(2) - m(1)(2) * m(2)(0)) +
        m(0)(2) * (m(1)(0) * m(2)(1) - m(1)(1) * m(2)(0))
    def det4(m: Array[Array[BigInt]]): BigInt =
      (0 until 4).map { c =>
        val minor = Array.tabulate(3, 3)((r, cc) => m(r + 1)((0 until 4).filter(_ != c)(cc)))
        val s: BigInt = if (c % 2 == 0) 1 else -1
        s * m(0)(c) * det3(minor)
      }.sum
    val den = det4(a)
    assert(den > 0, "Gram determinant must be positive on a non-degenerate corpus")
    val expBetas = (0 until 4).map { i =>
      val ai = Array.tabulate(4, 4)((j, k) => if (k == i) b(j) else a(j)(k))
      (fdiv(det4(ai) * 1000000, den) / den).toLong
    }
    val got = Similarity.queries("x179_linear_probe")(spark, dir).collect().head
    assert(got.getAs[Long]("n") === n)
    val gotBetas = Seq("b_intercept_e6", "b1_e6", "b2_e6", "b3_e6").map(got.getAs[Long](_))
    assert(gotBetas === expBetas, "engine betas differ from the in-memory Cramer replay")
    // planted-coefficient recovery: 3.5 sigma of the sampling error at n=500
    assert(math.abs(gotBetas(1) - 3000000L) < 750000L, "b1 must recover 3")
    assert(math.abs(gotBetas(2) + 2000000L) < 750000L, "b2 must recover -2")
    assert(math.abs(gotBetas(3) - 1000000L) < 750000L, "b3 must recover 1")
  }
}
