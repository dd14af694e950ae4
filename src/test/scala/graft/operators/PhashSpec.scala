package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** x55 perceptual-hash image dedup over the planted BMP fixture: every
  * exact clone must pair with its source at hamming 0; every
  * single-pixel-bumped near-clone must still land within the hamming-3
  * band guarantee (the bump perturbs exactly one 8×8 sample cell, moving
  * at most that bit plus mean-adjacent bits). */
class PhashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("planted exact and near clones are recovered within the band guarantee") {
    val pairs = Multimodal
      .queries("x55_image_phash")(spark, "unused")
      .collect()
      .map(r => (r.getAs[Long]("img_a"), r.getAs[Long]("img_b")) -> r.getAs[Long]("hamming"))
      .toMap
    (0L until 10L).foreach { i =>
      assert(pairs.get((i, i + 100L)) === Some(0L), s"exact clone pair ($i, ${i + 100}) not at hamming 0")
    }
    (10L until 20L).foreach { i =>
      val h = pairs.get((i, i + 100L))
      assert(h.exists(_ <= 3L), s"near clone pair ($i, ${i + 100}) missing or beyond hamming 3: $h")
    }
  }
}
