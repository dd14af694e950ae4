package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** x251's derandomized noise source: the trailing-zero count of a
  * uniform 60-bit hash must be EXACTLY Geometric(1/2) — that identity is
  * the whole reason the geometric mechanism (not Laplace) is the
  * integer-DP gate choice. Verified empirically over 200k draws and
  * structurally on crafted bit patterns.
  */
class GeometricMechanismSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private def tzCensus(n: Long, salt: String) =
    spark
      .range(n)
      .select(graft.functions.Hashing.md5Window15(concat(col("id").cast("string"), lit(salt))).as("h"))
      .select(expr("CAST(length(bin(h & -h)) - 1 AS BIGINT)").as("tz"))
      .groupBy("tz")
      .agg(count(lit(1)).as("c"))
      .collect()
      .map(r => r.getAs[Long]("tz") -> r.getAs[Long]("c"))
      .toMap

  test("trailing zeros of md5 windows are Geometric(1/2): P(tz = k) ~ 2^-(k+1)") {
    val n = 200000L
    val census = tzCensus(n, "#gmspec")
    for (k <- 0 to 6) {
      val expected = n.toDouble / (1L << (k + 1))
      val got = census.getOrElse(k.toLong, 0L).toDouble
      // 5-sigma band on a binomial count
      val sigma = math.sqrt(expected)
      assert(math.abs(got - expected) < 5 * sigma + 1, s"k=$k got=$got expected=$expected")
    }
  }

  test("noise G1 - G2 is symmetric: empirical mean within noise of zero") {
    val n = 200000L
    val mean = spark
      .range(n)
      .select(
        graft.functions.Hashing.md5Window15(concat(col("id").cast("string"), lit("#gm1"))).as("h1"),
        graft.functions.Hashing.md5Window15(concat(col("id").cast("string"), lit("#gm2"))).as("h2")
      )
      .agg(
        avg(
          expr("CAST(length(bin(h1 & -h1)) - 1 AS BIGINT) - CAST(length(bin(h2 & -h2)) - 1 AS BIGINT)")
        ).as("m")
      )
      .collect()
      .head
      .getAs[Double]("m")
    // var of two-sided geometric(1/2) difference = 2·(p/ (1-p)^2)? — the
    // empirical sd is ~2, so the mean of 200k draws sits within ~0.03
    assert(math.abs(mean) < 0.05, s"mean=$mean")
  }

  test("structural: the tz expression isolates the lowest set bit exactly") {
    import spark.implicits._
    val rows = Seq(1L -> 0L, 2L -> 1L, 12L -> 2L, 96L -> 5L, (1L << 40) -> 40L)
    val got = rows
      .map(_._1)
      .toDF("h")
      .withColumn("tz", expr("CAST(length(bin(h & -h)) - 1 AS BIGINT)"))
      .collect()
      .map(r => r.getAs[Long]("h") -> r.getAs[Long]("tz"))
      .toMap
    rows.foreach { case (h, tz) => assert(got(h) === tz, s"h=$h") }
  }
}
