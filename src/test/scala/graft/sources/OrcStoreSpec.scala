package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** x106 ORC round-trip: value-exact vs the parquet original, with the scan
  * keeping parquet's scale features — predicate pushdown into the ORC
  * reader and partition-directory pruning on the partition column. */
class OrcStoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("ORC round-trip is value-exact against the parquet original") {
    OrcStore.ensure(spark, sf)
    val orc = OrcStore
      .read(spark, sf)
      .agg(
        count(lit(1)).as("n"),
        sum(expr("CAST(round(l_quantity * 100) AS BIGINT)")).as("qty"),
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("price"),
        sum(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))")).as("ts_sum")
      )
      .collect()
      .head
    val pq = graft.Graft
      .table(spark, sf, "lineitem")
      .agg(
        count(lit(1)).as("n"),
        sum(expr("CAST(round(l_quantity * 100) AS BIGINT)")).as("qty"),
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("price"),
        sum(expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))")).as("ts_sum")
      )
      .collect()
      .head
    assert(orc === pq)
  }

  test("shipdate predicate is pushed into the ORC scan") {
    OrcStore.ensure(spark, sf)
    val plan = OrcStore
      .read(spark, sf)
      .where(expr("l_shipdate >= TIMESTAMP_NTZ '1995-06-01 00:00:00'"))
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("PushedFilters"), plan)
    assert(
      plan.contains("GreaterThanOrEqual(l_shipdate") || plan.contains("GreaterThanOrEqual(`l_shipdate`"),
      s"shipdate filter not pushed:\n$plan"
    )
  }

  test("returnflag filter prunes partition directories, not data") {
    OrcStore.ensure(spark, sf)
    val df = OrcStore.read(spark, sf).where(col("l_returnflag") === "R")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*l_returnflag[^\\]]*\\].*"), plan)
    val expected = graft.Graft
      .table(spark, sf, "lineitem")
      .where(col("l_returnflag") === "R")
      .count()
    assert(df.count() === expected)
  }
}
