package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x213 kappa laws: perfect agreement → 1e6, exact independence → 0,
  * perfect disagreement → −1e6. Raters are controlled independently via
  * token count (a) and the n_chars column (b). */
class KappaSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** docs with given (a, b) truth per row */
  private def run(ab: Seq[(Boolean, Boolean)]): Long = {
    import spark.implicits._
    val dir = TestSpark.tempDir()
    val rows = ab.zipWithIndex.map { case ((a, b), i) =>
      val text = if (a) ("tok " * 50).trim else "short text"
      (i.toLong, text, if (b) 300L else 10L)
    }
    TestSpark.writeTable(
      dir, "documents",
      rows.toDF("doc_id", "text", "n_chars")
        .selectExpr("doc_id", "text", "'en' AS lang", "'t' AS source", "n_chars")
    )
    Analytic.queries("x213_cohens_kappa")(spark, dir).collect().head.getLong(6)
  }

  test("perfect agreement yields kappa = 1e6") {
    val k = run(Seq.fill(30)((true, true)) ++ Seq.fill(20)((false, false)))
    assert(k === 1000000L)
  }

  test("exact marginal independence yields kappa = 0") {
    val k = run(
      Seq.fill(25)((true, true)) ++ Seq.fill(25)((true, false)) ++
        Seq.fill(25)((false, true)) ++ Seq.fill(25)((false, false))
    )
    assert(k === 0L)
  }

  test("perfect disagreement yields kappa = -1e6") {
    val k = run(Seq.fill(25)((true, false)) ++ Seq.fill(25)((false, true)))
    assert(k === -1000000L)
  }
}
