package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x77 PPS systematic sample: the distributed integer draw walk must match
  * an in-memory replay exactly, draws must be CONSERVED (Σ n_draws = k —
  * every draw point lands in exactly one document interval), and a
  * document wider than the step must catch multiple draws (the
  * with-replacement face of PPS for oversized units). */
class PpsSampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** graft.functions.Hashing.md5Window15 twin for spec-side expectations */
  private def h(id: Long): Long = {
    val hex = java.security.MessageDigest
      .getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_))
      .mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("planted corpus: draw walk matches in-memory reference; draws conserved") {
    import spark.implicits._
    // 40 docs of 5 tokens + one 400-token giant (w = 400 > 2·step = 12,
    // so it must receive several draw points)
    val docs = (1L to 40L).map(i => (i, (1 to 5).map(k => s"t${i}x$k").mkString(" "))) :+
      (99L, (1 to 400).map(k => s"big$k").mkString(" "))
    val dir = java.nio.file.Files.createTempDirectory("pps_spec").toString
    docs.toDF("doc_id", "text").write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = Sampling
      .queries("x77_pps_sample")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

    // in-memory replay of the identical integer walk
    val k = 100L
    val weights = docs.map { case (id, t) => (id, t.split("\\s+").length.toLong) }
    val ordered = weights.sortBy { case (id, _) => (h(id), id) }
    val total = weights.map(_._2).sum
    val step = math.max(total / k, 1L)
    var a = 0L
    val expected = ordered.flatMap { case (id, w) =>
      val nd = math.min((a + w + step - 1) / step, k) - math.min((a + step - 1) / step, k)
      val row = if (nd >= 1) Some((id, w, a, nd)) else None
      a += w
      row
    }
    assert(got === expected)

    // conservation: the k equally spaced points partition into the
    // intervals exactly once each
    assert(got.map(_._4).sum === k)

    // P(selected) ∝ w: the giant doc (2/3 of the corpus mass) holds ~2/3
    // of the draws, and certainly more than one
    val big = got.find(_._1 == 99L).get
    assert(big._4 >= 2)
    assert(big._4 === math.min((big._3 + 400 + step - 1) / step, k) - math.min((big._3 + step - 1) / step, k))
  }
}
