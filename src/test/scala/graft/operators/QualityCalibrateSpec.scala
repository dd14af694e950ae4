package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x79 per-domain quality calibration: with two domains whose score bands
  * don't overlap, the per-domain p30 fence keeps exactly 70% of EACH
  * domain, while the global p30 fence (the policy the operator argues
  * against) keeps all of the high band and guts the low one — the
  * domain-bias delta the query's n_kept_global column exposes. */
class QualityCalibrateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("per-domain fences keep 70% each; the global fence misallocates") {
    import spark.implicits._
    // lang hi, doc i: 8 words of length 4+i → score_e6 = (4+i)·100000,
    // strictly increasing in i, all ≥ 400000. No stopwords anywhere.
    val hiDocs = (0 until 20).map { i =>
      (100L + i, "hi", (1 to 8).map(_ => "q" * (4 + i)).mkString(" "))
    }
    // lang lo, doc i: 10 one-char words + i two-char words →
    // score_e6 = ((10+2i)·100000) div (10+i), increasing, all ≤ 165517.
    val loDocs = (0 until 20).map { i =>
      (200L + i, "lo", ((1 to 10).map(_ => "x") ++ (1 to i).map(_ => "zz")).mkString(" "))
    }
    val dir = java.nio.file.Files.createTempDirectory("qcal_spec").toString
    (hiDocs ++ loDocs).toDF("doc_id", "lang", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = TextAnalysis
      .queries("x79_quality_calibrate")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap

    // per-domain p30 over 20 distinct scores: pos = 0.3·19 = 5.7 → fence
    // strictly between ranks 5 and 6 → ranks 6..19 kept = 14 docs = 70%
    // of EACH domain; scores increase with i, so kept ids are the top 14.
    assert(got("hi")._1 === 20L)
    assert(got("lo")._1 === 20L)
    assert(got("hi")._2 === 14L)
    assert(got("lo")._2 === 14L)
    assert(got("hi")._4 === (106L to 119L).sum)
    assert(got("lo")._4 === (206L to 219L).sum)

    // global p30 over all 40: pos = 0.3·39 = 11.7 → fence inside the lo
    // band (ranks 11/12 of the global order are both lo docs) → hi keeps
    // everything, lo keeps only 8 — the bias the operator corrects.
    assert(got("hi")._3 === 20L)
    assert(got("lo")._3 === 8L)
  }
}
