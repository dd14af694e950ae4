package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x72 iterative BPE training against an independent in-memory reference:
  * a planted corpus with a closed-form merge evolution, trained by a plain
  * Scala BPE implementation (Sennrich et al. 2016 semantics — weighted
  * pair counts over the word-frequency vocab, argmax with (count desc,
  * pair asc) ties, left-to-right non-overlapping merges), compared to the
  * distributed trainer's full 8-round merge table. */
class BpeTrainSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("planted corpus: distributed merge table equals the in-memory reference") {
    import spark.implicits._
    // closed-form corpus: 'lowlow' dominates so (l,o) wins round 1, then
    // merged symbols must keep merging ((lo,w), (low,low)…) — deep merge
    // chains and a tie broken lexicographically are both planted
    // the two tail docs pin edge guards: whitespace-only text tokenizes to
    // one empty word, which must NOT reach the symbol split (descending-
    // sequence class), and padded spacing must not create empty tokens
    val texts = Seq.fill(6)("lowlow lower") ++ Seq.fill(4)("newest widest lowlow") ++
      Seq.fill(3)("aaaa abab") ++ Seq(" padded   spacing  test ", "   ")
    val dir = java.nio.file.Files.createTempDirectory("bpe_spec").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val vocab = texts
      .flatMap(_.toLowerCase.trim.split("\\s+"))
      .filter(_.nonEmpty) // the query's length(w) >= 1 guard
      .groupMapReduce(identity)(_ => 1L)(_ + _)
    val expected = BpeReference.train(vocab, 8)
    // the planted evolution actually exercises merged-symbol pairs: at
    // least one later round must merge a multi-char symbol
    assert(expected.drop(1).exists { case (a, b, _) => a.length > 1 || b.length > 1 })

    val got = TextAnalysis.queries("x72_bpe_train")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
    assert(got.length === 8)
    for (((a, b, c), i) <- expected.zipWithIndex) {
      val (round, p1, p2, merged, cnt) = got(i)
      assert(round === i + 1L)
      assert((p1, p2, merged, cnt) === ((a, b, a + b, c)), s"round ${i + 1}")
    }
  }
}
