package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x207 prefix-filtering join: completeness against an in-test brute force
  * on adversarial shapes — identical docs (J=1), threshold-straddling
  * pairs, docs sharing ONLY ubiquitous shingles, and singletons. */
class PrefixJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def shingles(text: String): Set[String] = {
    val w = text.trim.toLowerCase.split("\\s+")
    if (w.length < 3) Set.empty
    else (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
  }

  private def brute(docs: Seq[(Long, String)]): Seq[(Long, Long, Long)] =
    (for {
      (a, ta) <- docs; (b, tb) <- docs if a < b
      sa = shingles(ta); sb = shingles(tb)
      if sa.nonEmpty && sb.nonEmpty
      i = (sa & sb).size.toLong
      u = sa.size + sb.size - i
      j = i * 1000000L / u
      if j >= 600000L
    } yield (a, b, j)).sortBy(t => (t._1, t._2))

  private def run(docs: Seq[(Long, String)]): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    val dir = TestSpark.tempDir()
    TestSpark.writeTable(
      dir, "documents",
      docs.toDF("doc_id", "text")
        .selectExpr("doc_id", "text", "'en' AS lang", "'t' AS source", "length(text) AS n_chars")
    )
    Dedup.queries("x207_prefix_join")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
  }

  test("matches brute force exactly on an adversarial corpus") {
    val common = "the quick brown fox jumps over the lazy dog again and again"
    val docs: Seq[(Long, String)] = Seq(
      1L -> s"$common alpha beta gamma",
      2L -> s"$common alpha beta gamma", // identical to 1: J = 1
      3L -> s"$common alpha beta delta", // near-dup of 1/2
      4L -> s"$common one two three four five six seven eight nine ten", // diluted
      5L -> "completely different text about completely other things entirely here now",
      6L -> s"$common", // subset-ish of 1
      7L -> "too short", // < 3 tokens: no shingles
      8L -> s"alpha beta gamma $common" // same shingle set as 1 shifted? (no — boundary shingles differ)
    )
    assert(run(docs) === brute(docs))
    val got = run(docs)
    assert(got.exists(t => t._1 == 1L && t._2 == 2L && t._3 == 1000000L), "identical pair at J=1")
    assert(!got.exists(t => t._1 == 5L || t._2 == 5L), "unrelated doc never pairs")
  }

  test("docs sharing only ubiquitous shingles below threshold do not pair") {
    // every doc shares one hot phrase, but jaccard stays < 0.6
    val docs: Seq[(Long, String)] = (0L until 20L).map { i =>
      i -> s"shared hot phrase here u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g u${i}h"
    }
    assert(run(docs) === brute(docs))
    assert(run(docs).isEmpty, "hot-phrase-only overlaps must stay out")
  }
}
