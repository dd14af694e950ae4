package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x75 BPE encode against the in-memory reference: merges are trained on
  * the even-doc_id half only, so odd docs carry OOV words the trainer
  * never saw — the planted corpus makes one OOV word ("lowland") contain a
  * learned pair, proving encode is merge REPLAY, not vocab lookup. */
class BpeEncodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("planted corpus: per-doc encode equals the reference (incl. OOV merge replay)") {
    import spark.implicits._
    // even docs (the training half) are dominated by 'low…' words so (l,o)
    // merges early; odd docs add 'lowland' — absent from training, but its
    // 'lo'/'low' prefixes must still merge when the learned rules replay
    val texts = Seq(
      "lowlow lower lowest",      // 0 (train)
      "lowland lowland newest",   // 1 (encode-only OOV)
      "lowlow lowlow widest",     // 2 (train)
      "slowest lowland",          // 3 (encode-only OOV)
      "lower lowest newest",      // 4 (train)
      "   ",                      // 5 (whitespace-only: zero words — must drop from output)
      "lowlow aaaa abab",         // 6 (train)
      "lowland lowlow"            // 7 (odd: known + OOV mix)
    )
    val dir = java.nio.file.Files.createTempDirectory("bpe_enc_spec").toString
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    def words(t: String): Seq[String] = t.toLowerCase.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    val trainVocab = texts.zipWithIndex.collect { case (t, i) if i % 2 == 0 => t }
      .flatMap(words).groupMapReduce(identity)(_ => 1L)(_ + _)
    val merges = BpeReference.train(trainVocab, 8).map { case (a, b, _) => (a, b) }

    // the OOV guarantee: 'lowland' is not a training word yet its encoding
    // must be shorter than its char split (a learned merge fired inside it)
    assert(!trainVocab.contains("lowland"))
    assert(BpeReference.encode("lowland", merges).length < "lowland".length)

    val expected = texts.zipWithIndex.flatMap { case (t, i) =>
      val ws = words(t)
      if (ws.isEmpty) None
      else Some((
        i.toLong,
        ws.size.toLong,
        ws.map(w => BpeReference.encode(w, merges).size.toLong).sum,
        ws.map(w => BpeReference.md5Bucket(BpeReference.encode(w, merges).mkString(" "), 1048576L)).sum
      ))
    }

    val got = TextAnalysis.queries("x75_bpe_encode")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
  }
}
