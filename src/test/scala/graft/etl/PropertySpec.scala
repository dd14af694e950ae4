package graft.etl

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests promised by SURVEY.md §5.1: the SAS label parser
  * round-trips arbitrary entries; the SAS epoch decode is the exact inverse
  * of day-difference from 1960-01-01. (Raw ScalaCheck generators sampled
  * with fixed seeds — the scalatest bridge artifact isn't in the offline
  * dependency set.) */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  private val labelGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', ',', '.', '-', '(', ')')))
      .map(_.mkString.trim)
      .suchThat(_.nonEmpty)

  test("SAS parser round-trips arbitrary numeric-code blocks (incl. quote escaping)") {
    samples(Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 999), labelGen)), 50).foreach { entries =>
      val distinct = entries.distinctBy(_._1)
      val block = distinct
        .map { case (c, l) => s"   $c =  '${l.replace("'", "''")}'" }
        .mkString("value testblk\n", "\n", " ;")
      val parsed = SasLabels.parseBlocks(block)("testblk")
      assert(parsed.map(e => (e.code.toInt, e.label)) === distinct.toVector.map { case (c, l) => (c, l) })
    }
  }

  test("SAS epoch decode inverts datediff from 1960-01-01 for all plausible day counts") {
    // one Spark job for the whole range beats thousands of tiny jobs
    val decoded = spark
      .range(-5000L, 40000L, 977L)
      .select(col("id").cast("double").as("d"))
      .select(col("d"), Clean.sasDate(col("d")).as("dt"))
      .withColumn("back", datediff(col("dt"), lit("1960-01-01").cast("date")))
      .where(col("back") =!= col("d").cast("int"))
      .count()
    assert(decoded === 0L)
  }

  test("date parsers never throw on arbitrary strings — they null out") {
    val strs = samples(Gen.oneOf(Gen.alphaNumStr, Gen.asciiPrintableStr, Gen.const("D/S"), Gen.const("")), 30)
    val rows = strs.map(Option(_))
      .toDF("x")
      .select(Clean.yyyymmdd(col("x")).as("a"), Clean.mmddyyyy(col("x")).as("b"))
      .collect()
    // reaching here without an exception IS the property; values may be null
    assert(rows.length === strs.length)
  }
}
