package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x50 SemDeDup semantics on planted embeddings: a positively-scaled copy
  * shares every JL sign (same cluster code) and has cosine 1 → dropped;
  * the negated copy flips every sign (different code) → survives even at
  * cosine −1; an axis-disjoint vector survives. */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("scaled clone dropped within its cluster; negation and orthogonal vectors kept") {
    val dir = TestSpark.tempDir()
    val rng = new scala.util.Random(7)
    val v = Array.fill(64)(rng.nextFloat() * 2f - 1f)
    val rows = Seq(
      (1L, v, 0),
      (2L, v.map(_ * 1.5f), 0), // same signs ⇒ same code; cos = 1
      (3L, v.map(x => -x), 0), // all signs flip ⇒ complement code; cos = −1
      (4L, Array.fill(64)(rng.nextFloat() * 2f - 1f), 1)
    )
    TestSpark.writeTable(dir, "embeddings", rows.toDF("vec_id", "embedding", "label"))
    val got = Similarity
      .queries("x50_semdedup")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> (r.getAs[Long]("code"), r.getAs[Long]("kept")))
      .toMap
    assert(got(1L)._1 === got(2L)._1, "scaling must preserve the sign code")
    assert(got(1L)._2 === 1L && got(2L)._2 === 0L, "higher id of the clone pair must be dropped")
    assert(got(1L)._1 === 255L - got(3L)._1, "negation must complement the 8-bit code")
    assert(got(3L)._2 === 1L && got(4L)._2 === 1L)
  }
}
