package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x09 char-trigram language ID on a planted fixture where marker-WORD
  * counting cannot separate the languages: every document of both
  * languages carries the same function words ("le", "la", "des"), so an
  * argmax over shared markers ties — but the character-trigram mass of
  * the content words separates them cleanly. */
class LangidSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("shared-marker languages are separated by trigram profiles (diagonal confusion)") {
    import spark.implicits._
    // both langs open with identical shared markers; content differs only
    // in character structure (consonant clusters vs doubled vowels)
    def xxDoc(i: Int) = s"le la des krzko${i % 7} przkt vrzkq zrzkw brzk krzk trzk"
    def yyDoc(i: Int) = s"le la des feenaa${i % 7} veenoo teenee weenuu seenii meenoo"
    val rows =
      (0 until 30).map(i => (i.toLong, "xx", xxDoc(i))) ++
        (30 until 60).map(i => (i.toLong, "yy", yyDoc(i)))
    val dir = java.nio.file.Files.createTempDirectory("langid_spec").toString
    rows.toDF("doc_id", "lang", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val confusion = TextAnalysis.queries("x09_text_langid")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // every document lands on its own language — the shared markers
    // contribute identical trigram weight to both scores and cancel out
    assert(confusion(("xx", "xx")) === 30L)
    assert(confusion(("yy", "yy")) === 30L)
    assert(confusion.keys.forall { case (p, l) => p == l }, s"off-diagonal rows: $confusion")
  }

  test("documents too short for a trigram classify 'und'") {
    import spark.implicits._
    val rows = Seq((0L, "xx", "ab"), (1L, "xx", "x"), (2L, "yy", "meenoo veenoo teenee"))
    val dir = java.nio.file.Files.createTempDirectory("langid_und").toString
    rows.toDF("doc_id", "lang", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val confusion = TextAnalysis.queries("x09_text_langid")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(confusion(("und", "xx")) === 2L)
    assert(confusion(("yy", "yy")) === 1L)
  }
}
