package graft.operators

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves x159's distributed decile assignment (bounded group-table
  * self-join for cum counts + score-partitioned within-group rank + the
  * closed form of SQL NTILE) equals Spark's global `ntile(10)` ROW-EXACTLY
  * — the replacement for the r7-flagged single-partition per-doc window.
  * Covers the padded-bucket boundary (n % 10 ≠ 0, where the first n % 10
  * tiles hold one extra row), heavy score ties spanning tile boundaries,
  * and n < 10 (every row its own tile; the greatest() ANSI-div guard).
  */
class DecileNtileSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** The x159 pipeline shape: global rank by (score, id) assembled from a
    * cum-below self-join + a score-partitioned window, then the NTILE
    * closed form. No unpartitioned window anywhere.
    */
  private def distributedNtile(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val groups = df.groupBy("score").agg(count(lit(1)).as("cnt")).localCheckpoint()
    val cum = groups
      .join(
        broadcast(groups.select(col("score").as("sb"), col("cnt").as("cb"))),
        col("sb") < col("score"),
        "left"
      )
      .groupBy("score")
      .agg(coalesce(sum("cb"), lit(0L)).as("cum"))
    val ntot = groups.agg(sum("cnt").as("ntot"))
    df.join(broadcast(cum), "score")
      .withColumn("rk", col("cum") + row_number().over(Window.partitionBy("score").orderBy("id")))
      .crossJoin(broadcast(ntot))
      .withColumn(
        "tile",
        expr(
          "CAST(IF(rk <= (ntot % 10) * (ntot div 10 + 1), " +
            "(rk - 1) div (ntot div 10 + 1) + 1, " +
            "ntot % 10 + (rk - (ntot % 10) * (ntot div 10 + 1) - 1) div greatest(ntot div 10, 1) + 1) AS BIGINT)"
        )
      )
      .select("id", "score", "tile")
  }

  private def check(rows: Seq[(Long, Long)]): Unit = {
    val df = rows.toDF("id", "score").localCheckpoint()
    val oracle = df
      .withColumn("tile", ntile(10).over(Window.orderBy(col("score"), col("id"))).cast("long"))
      .select("id", "score", "tile")
    val mismatches = distributedNtile(df)
      .join(oracle.withColumnRenamed("tile", "tile_oracle"), Seq("id", "score"))
      .where(col("tile") =!= col("tile_oracle"))
      .count()
    assert(mismatches === 0L)
    // sanity: full coverage (every row got exactly one tile)
    assert(distributedNtile(df).count() === rows.length.toLong)
  }

  test("uneven n (n % 10 != 0): padded tiles match ntile") {
    // 47 rows over 7 distinct scores → tiles 1..7 get 5 rows, 8..10 get 4
    check((1L to 47L).map(i => (i, i % 7)))
  }

  test("even n with heavy ties across tile boundaries") {
    // 60 rows, 3 scores of 20 each — ties span every tile edge
    check((1L to 60L).map(i => (i, i % 3)))
  }

  test("n < 10: each row its own tile (ANSI div guard path)") {
    check(Seq((10L, 5L), (20L, 3L), (30L, 5L), (40L, 1L)))
  }

  test("all-equal scores: order falls entirely to id tiebreak") {
    check((1L to 23L).map(i => (i, 42L)))
  }
}
