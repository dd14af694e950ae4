package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Content-defined chunking (x271). Laws:
  *   - RECONSTRUCTION: per doc, spans tile [0, n] exactly and the chunks
  *     concatenate back to the original text (no char lost or doubled);
  *   - DEGENERATE SHAPES: an empty doc and a doc shorter than the window
  *     each yield exactly one chunk (the whole doc);
  *   - SHIFT ROBUSTNESS — the reason CDC exists: after inserting a prefix,
  *     most chunk hashes survive (boundaries move WITH content), while
  *     fixed-width chunking of the same pair shares almost nothing;
  *   - determinism across runs.
  */
class CdcChunkSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def words(n: Int, seed: Int): String =
    (0 until n).map { i =>
      // aperiodic words: a periodic stream would let misaligned fixed-width
      // chunks still collide, voiding the contrast the third test pins
      val md = java.security.MessageDigest.getInstance("MD5").digest(s"$seed#$i".getBytes("UTF-8"))
      md.take(3).map(b => f"${b & 0xff}%02x").mkString
    }.mkString(" ")

  private def spansOf(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, String)] =
    Dedup
      .cdcSpans(docs.toDF("doc_id", "t"))
      .orderBy("doc_id", "i")
      .collect()
      .toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("spans tile the doc exactly and chunks concatenate back to the text") {
    val text = words(400, 3)
    val spans = spansOf(Seq((1L, text)))
    assert(spans.head._2 === 0L, "first span starts at 0")
    assert(spans.last._3 === text.length.toLong, "last span ends at n")
    spans.sliding(2).foreach {
      case Seq(a, b) => assert(a._3 === b._2, s"gap between spans $a and $b")
      case _ =>
    }
    assert(spans.map(_._4).mkString === text, "chunks must concatenate to the doc")
    assert(spans.size > 5, s"a 400-word doc should cut into many chunks, got ${spans.size}")
  }

  test("degenerate docs yield exactly one whole-doc chunk") {
    val spans = spansOf(Seq((1L, ""), (2L, "short"), (3L, "12345678")))
    assert(spans === Seq((1L, 0L, 0L, ""), (2L, 0L, 5L, "short"), (3L, 0L, 8L, "12345678")))
  }

  test("shift robustness: a prefix insertion preserves most CDC chunks; fixed-width shares none") {
    val base = words(600, 7)
    val shifted = "zq9 inserted header " + base
    val spans = spansOf(Seq((1L, base), (2L, shifted)))
    val h1 = spans.filter(_._1 == 1L).map(_._4).groupBy(identity).view.mapValues(_.size).toMap
    val h2 = spans.filter(_._1 == 2L).map(_._4).groupBy(identity).view.mapValues(_.size).toMap
    val shared = h1.keySet.intersect(h2.keySet).toSeq.map(k => math.min(h1(k), h2(k))).sum
    val frac = shared.toDouble / h1.values.sum
    assert(frac >= 0.7, s"CDC must survive a prefix shift: shared fraction $frac")
    // fixed 32-char chunking of the same pair: the 20-char shift misaligns everything
    def fixed(t: String): Seq[String] = t.grouped(32).toSeq
    val f1 = fixed(base).groupBy(identity).view.mapValues(_.size).toMap
    val f2 = fixed(shifted).groupBy(identity).view.mapValues(_.size).toMap
    val fShared = f1.keySet.intersect(f2.keySet).toSeq.map(k => math.min(f1(k), f2(k))).sum
    assert(
      fShared.toDouble / f1.size < 0.1,
      s"fixed-width chunking should share ~nothing under a shift, shared=$fShared"
    )
  }

  test("deterministic across runs") {
    val docs = Seq((1L, words(300, 1)), (2L, words(250, 2)))
    assert(spansOf(docs) === spansOf(docs))
  }
}
