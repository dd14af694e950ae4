package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** x127 WordPiece greedy encoding against an independent in-memory
  * reference (try-longest-first per position, the BERT matching rule) on
  * a planted corpus: the distributed max-match + fold walk must agree on
  * every word, including mid-word [UNK] routing and pure-foreign words,
  * and must be invariant to input partitioning. */
class WordpieceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // >8 distinct train words, so some (sanded, wide) fall outside the
  // whole-word tier and MUST segment; encode-only docs plant a pos-0
  // dead end (zebra9), a mid-walk dead end (lowestz), and clean OOV
  // words that segment through pieces (lowland, salander)
  private val texts = Seq(
    "lowlow lower lowest widest",                // 0 (train)
    "lowland slowest newest a",                  // 1 (encode-only)
    "lowlow wide widest best salted",            // 2 (train)
    "zebra9 lowest salted",                      // 3 (encode-only)
    "newest best widest lower sanded basaltlands", // 4 (train; last word > MaxWordChars → excluded from vocab)
    "lowx lowestz salander lowlowlower"          // 5 (encode-only; last word > MaxWordChars → [UNK])
  )

  private def words(t: String): Seq[String] =
    t.toLowerCase.trim.split("\\s+").toSeq.filter(_.nonEmpty)

  /** reference vocab: same ranks/limits as [[TextAnalysis.wordpieceVocab]]
    * (over-long words never enter the vocabulary) */
  private def refVocab(train: Seq[String]): (Set[String], Set[String]) = {
    val counts = train.filter(_.length <= 8).groupMapReduce(identity)(_ => 1L)(_ + _)
    val whole = counts.toSeq.sortBy { case (w, n) => (-n, w) }.take(8).map(_._1)
    def rankTop(cands: Seq[(String, Long)], k: Int): Seq[String] =
      cands
        .groupMapReduce(_._1)(_._2)(_ + _)
        .toSeq
        .sortBy { case (p, n) => (-n, p) }
        .take(k)
        .map(_._1)
    val pref = rankTop(
      counts.toSeq.flatMap { case (w, n) => (2 to math.min(4, w.length)).map(L => (w.substring(0, L), n)) },
      12
    )
    val inner = rankTop(
      counts.toSeq.flatMap { case (w, n) =>
        for { p <- 2 to w.length; l <- 2 to 4 if p + l - 1 <= w.length } yield (w.substring(p - 1, p - 1 + l), n)
      },
      16
    )
    val startChars = counts.keySet.map(_.substring(0, 1))
    val innerChars = counts.keySet.filter(_.length >= 2).flatMap(w => w.substring(1).map(_.toString))
    ((whole ++ pref).toSet ++ startChars, inner.toSet ++ innerChars)
  }

  /** reference greedy encode: longest match first, [UNK] on any dead end
    * or on an over-long word (the MaxWordChars contract) */
  private def refEncode(w: String, start: Set[String], cont: Set[String]): (Long, Long) = {
    if (w.length > 8) return (1L, 1L)
    var pos = 0
    var n = 0L
    while (pos < w.length) {
      val maxL = if (pos == 0) w.length - pos else math.min(4, w.length - pos)
      val hit = (maxL to 1 by -1).find { l =>
        val sub = w.substring(pos, pos + l)
        if (pos == 0) start(sub) else cont(sub)
      }
      hit match {
        case Some(l) => pos += l; n += 1
        case None    => return (1L, 1L) // whole word routes to [UNK]
      }
    }
    (n, 0L)
  }

  test("planted corpus: every word's piece count and UNK flag match the reference") {
    import spark.implicits._
    val docs = texts.zipWithIndex
      .flatMap { case (t, i) => words(t).map(w => (i.toLong, w)) }
      .toDF("doc_id", "w")
    val train = texts.zipWithIndex.collect { case (t, i) if i % 2 == 0 => t }.flatMap(words)
    val (start, cont) = refVocab(train)

    val got = TextAnalysis
      .wordpieceEncode(docs, TextAnalysis.wordpieceVocab(docs.where(col("doc_id") % 2 === 0)))
      .collect()
      .map(r => r.getAs[String]("w") -> (r.getAs[Long]("n_pieces"), r.getAs[Long]("unk")))
      .toMap

    val distinctWords = texts.flatMap(words).distinct
    assert(got.keySet === distinctWords.toSet)
    for (w <- distinctWords)
      assert(got(w) === refEncode(w, start, cont), s"word '$w'")
    // the planted corpus must exercise EVERY failure mode separately
    // (review-found: an OR here let vocab drift silently uncover one):
    // pos-0 dead end, mid-walk dead end, over-long word, ≥2 real pieces
    assert(got("zebra9") === ((1L, 1L)), "pos-0 dead end")
    assert(got("lowestz") === ((1L, 1L)), "mid-walk dead end")
    assert(got("lowlowlower") === ((1L, 1L)), "over-long word")
    assert(got.exists { case (_, (n, unk)) => unk == 0L && n >= 2L })
  }

  test("encoding is invariant to input partitioning") {
    import spark.implicits._
    val docs = texts.zipWithIndex
      .flatMap { case (t, i) => words(t).map(w => (i.toLong, w)) }
      .toDF("doc_id", "w")
    def run(part: Int): Set[(String, Long, Long, Long)] =
      TextAnalysis
        .wordpieceEncode(
          docs.repartition(part),
          TextAnalysis.wordpieceVocab(docs.repartition(part).where(col("doc_id") % 2 === 0))
        )
        .collect()
        .map(r =>
          (r.getAs[String]("w"), r.getAs[Long]("n_pieces"), r.getAs[Long]("unk"), r.getAs[Long]("wdigest"))
        )
        .toSet
    assert(run(1) === run(7))
  }
}
