package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x76 leakage-safe split: a planted near-dup pair whose two doc_ids
  * bucket to OPPOSITE sides under the naive per-document rule must land on
  * the SAME side under the cluster-aware rule, no x02 edge may cross the
  * boundary, and singletons must keep the naive assignment (they are their
  * own cluster representative). */
class LeakageSplitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def side(id: Long): String =
    if (BpeReference.md5Bucket(id.toString, 100L) < 90) "train" else "heldout"

  test("planted cross-bucket near-dup pair rides its cluster to one side") {
    import spark.implicits._
    // pick a (train, heldout) id pair under the naive rule — deterministic
    // at spec time, found by scanning the md5 buckets
    val ids = (0L to 60L)
    val trainId = ids.find(side(_) == "train").get
    val heldId = ids.find(side(_) == "heldout").get
    assert(side(trainId) != side(heldId)) // the naive split WOULD leak this pair

    // near-dup pair: long shared 3-shingle text, one trailing word differs
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val fillers = ids.filterNot(i => i == trainId || i == heldId).take(6)
    val docs =
      Seq((trainId, s"$base one"), (heldId, s"$base two")) ++
        // fillers share no 3-shingles with anything (unique word streams)
        fillers.zipWithIndex.map { case (i, j) =>
          (i, (0 until 8).map(k => s"w${j}x$k").mkString(" "))
        }
    val dir = java.nio.file.Files.createTempDirectory("leak_split_spec").toString
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = Dedup.queries("x76_leakage_safe_split")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byDoc = got.map(t => t._1 -> t).toMap
    assert(got.length === docs.length)

    // the pair clusters together under the min-id label and shares a side
    val rep = math.min(trainId, heldId)
    assert(byDoc(trainId)._2 === rep)
    assert(byDoc(heldId)._2 === rep)
    assert(byDoc(trainId)._3 === byDoc(heldId)._3)
    assert(byDoc(trainId)._3 === side(rep)) // the side is the REP's bucket

    // singletons: own cluster, naive assignment preserved
    for (i <- fillers) {
      assert(byDoc(i)._2 === i)
      assert(byDoc(i)._3 === side(i))
    }

    // no near-dup edge crosses the boundary (vacuously strong here, but
    // asserted through the real x02 pair set, not by construction)
    val pairs = Dedup.queries("x02_dedup_ngram_jaccard")(spark, dir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty) // the planted pair must actually be detected
    for ((a, b) <- pairs) assert(byDoc(a)._3 === byDoc(b)._3)
  }
}
