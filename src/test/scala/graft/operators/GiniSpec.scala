package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x215 Gini laws: equality → 0, concentration → the closed-form extreme,
  * and agreement with a definitional per-doc-rank reference. */
class GiniSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def giniRef(xs: Seq[Long]): Long = {
    val s = xs.sorted
    val n = s.length.toLong
    val total = s.sum
    val twoSix = s.zipWithIndex.map { case (x, i) => 2L * (i + 1) * x }.sum
    (twoSix - (n + 1) * total) * 1000000L / (n * total)
  }

  private def run(docs: Seq[(String, Int)]): Map[String, Long] = {
    import spark.implicits._
    val dir = TestSpark.tempDir()
    val rows = docs.zipWithIndex.map { case ((src, ntok), i) =>
      (i.toLong, ("w " * ntok).trim, src)
    }
    TestSpark.writeTable(
      dir, "documents",
      rows.toDF("doc_id", "text", "source")
        .selectExpr("doc_id", "text", "'en' AS lang", "source", "length(text) AS n_chars")
    )
    Analytic.queries("x215_gini_tokens")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> r.getLong(3))
      .toMap
  }

  test("perfect equality is exactly 0; heavy concentration nears (n-1)/n") {
    val eq = run((0 until 40).map(i => ("a", 25)))
    assert(eq("a") === 0L)
    assert(eq("*") === 0L)
    val conc = (0 until 19).map(_ => ("b", 1)) :+ (("b", 10000))
    val g = run(conc)("b")
    assert(g === giniRef(Seq.fill(19)(1L) :+ 10000L))
    assert(g > 900000L, s"one-megadoc source must read near 1 ($g)")
  }

  test("matches the definitional per-doc-rank reference incl. ties across sources") {
    val docs = (0 until 60).map(i => (s"s${i % 3}", 1 + (i * 7) % 23))
    val got = run(docs)
    (0 until 3).foreach { k =>
      val xs = docs.filter(_._1 == s"s$k").map(_._2.toLong)
      assert(got(s"s$k") === giniRef(xs), s"source s$k")
    }
    assert(got("*") === giniRef(docs.map(_._2.toLong)))
  }
}
