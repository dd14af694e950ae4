package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** x96 bitmap-exact distinct: the pack/OR/popcount pipeline must equal
  * countDistinct on keys straddling word boundaries and duplicates. */
class BitmapDistinctSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bitmap popcount equals countDistinct across word boundaries and duplicates") {
    import spark.implicits._
    // keys chosen to land on bit 0, bit 62, and the first bits of the
    // next words (63, 64, 126), with duplicates sprinkled in
    val keys = Seq(0L, 1L, 62L, 63L, 64L, 125L, 126L, 189L, 0L, 63L, 126L, 500L, 500L)
    val df = keys.map(("g", _)).toDF("flag", "k")
    val got = df
      .select(col("flag"), expr("k div 63").as("w"), expr("shiftleft(1L, CAST(k % 63 AS INT))").as("bit"))
      .groupBy("flag", "w")
      .agg(expr("bit_or(bit)").as("word"))
      .groupBy("flag")
      .agg(sum(expr("bit_count(word)")).as("ndv_bitmap"))
      .head()
      .getAs[Long]("ndv_bitmap")
    assert(got === keys.distinct.size.toLong)
  }

  test("gate query: bitmap and exact columns agree per group at sf0.001") {
    val rows = Advanced.queries("x96_bitmap_distinct")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("ndv_bitmap") === r.getAs[Long]("ndv_exact"), r.getAs[String]("flag"))
    }
  }
}
