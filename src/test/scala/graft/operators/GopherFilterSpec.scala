package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x51 Gopher-rule filter: each planted document targets exactly one rule;
  * langs are distinct so the per-lang aggregate exposes each verdict. */
class GopherFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("each rule fires on its planted document and only there") {
    val dir = TestSpark.tempDir()
    val pass = "the quick brown fox jumps over a lazy dog while the cat is asleep in the warm sun today"
    val rows = Seq(
      (0L, pass, "ok", "t", pass.length.toLong), // 19 words, stopwords, clean
      (1L, "too few words here now", "nw", "t", 22L), // 5 words < 15
      (2L, ("a " * 29 + "a").trim, "wl", "t", 59L), // 30 one-char words → mean 1000 < 2000
      (3L, Seq.fill(20)("@#$%").mkString(" ") + " the and of", "sy", "t", 110L), // symbol-dense
      (4L, Seq.fill(20)("blueberry").mkString(" "), "st", "t", 199L) // zero stopwords
    )
    TestSpark.writeTable(dir, "documents", rows.toDF("doc_id", "text", "lang", "source", "n_chars"))
    val got = TextAnalysis
      .queries("x51_gopher_filter")(spark, dir)
      .collect()
      .map(r =>
        r.getAs[String]("lang") ->
          (r.getAs[Long]("pass_all"), r.getAs[Long]("fail_words"), r.getAs[Long]("fail_wordlen"),
            r.getAs[Long]("fail_sym"), r.getAs[Long]("fail_stop"))
      )
      .toMap
    assert(got("ok") === ((1L, 0L, 0L, 0L, 0L)))
    assert(got("nw")._2 === 1L && got("nw")._1 === 0L)
    assert(got("wl")._3 === 1L && got("wl")._1 === 0L)
    assert(got("sy")._4 === 1L && got("sy")._1 === 0L)
    assert(got("st")._5 === 1L && got("st")._1 === 0L)
  }
}
