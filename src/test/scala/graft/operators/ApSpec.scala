package graft.operators

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** x218 AP closed forms on a hand-ranked embedding set: perfect ranking
  * = 1e6, known hit positions reproduce the textbook fractions. */
class ApSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** candidates at controlled cosines to the probe (1,0,0); vec 0..4 are
    * the queries — give them orthogonal unit axes so only q=0 has
    * same-label hits among candidates */
  private def run(cands: Seq[(Long, Float, Int)]): Map[Long, (Long, Long, Long)] = {
    val dir = TestSpark.tempDir()
    val eSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)
    ))
    // queries 0..4: labels 100..104; query 0 points at (1,0,0)
    val qs = (0L to 4L).map(i => Row(i, Seq(if (i == 0) 1.0f else 0.0f, if (i == 0) 0.0f else 1.0f, i.toFloat / 10), 100 + i.toInt))
    val cs = cands.map { case (id, cos, lab) =>
      val sin = math.sqrt(math.max(0.0, 1.0 - cos * cos)).toFloat
      Row(id, Seq(cos, 0.0f, sin), lab)
    }
    val emb = spark.createDataFrame(java.util.Arrays.asList((qs ++ cs): _*), eSchema)
    TestSpark.writeTable(dir, "embeddings", emb)
    Similarity.queries("x218_avg_precision")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
  }

  test("hits at ranks 1 and 3 give AP = (1 + 2/3)/2 exactly (floored e6)") {
    // candidates ranked by cosine desc: ids 10,11,12,13 at cos .9,.8,.7,.6
    // labels: 100 (hit), 1, 100 (hit), 1 → hits at ranks 1 and 3 for q0
    val got = run(Seq((10L, 0.9f, 100), (11L, 0.8f, 1), (12L, 0.7f, 100), (13L, 0.6f, 1)))
    val (nRel, ap, p10) = got(0L)
    assert(nRel === 2L)
    assert(ap === (1000000L + 2000000L / 3) / 2)
    assert(p10 === 200000L, "2 hits in the top 10")
  }

  test("perfect ranking gives AP = 1e6; relegated hits shrink it") {
    val perfect = run(Seq((10L, 0.9f, 100), (11L, 0.8f, 100), (12L, 0.7f, 1), (13L, 0.6f, 1)))
    assert(perfect(0L)._2 === 1000000L)
    val worst = run(Seq((10L, 0.9f, 1), (11L, 0.8f, 1), (12L, 0.7f, 100), (13L, 0.6f, 100)))
    // hits at ranks 3,4: AP = (1/3 + 2/4)/2
    assert(worst(0L)._2 === (1000000L / 3 + 2000000L / 4) / 2)
  }
}
