package graft.operators

import graft.{Graft, SparkEntry, TestSpark}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom whole-operator extension (TopKPerKeyNode + strategy + two-phase
  * exec): semantics vs the declarative window-rank twin, plan shape (partial
  * below the single exchange, no sort of the input), and the edge semantics
  * (short groups, ties, null keys and null ordering values). */
class TopKPerKeySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def topkDf = {
    val items = Graft
      .table(spark, sf, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    TopKPerKey(
      items,
      keys = Seq(col("l_suppkey")),
      order = Seq(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc),
      k = 3
    )
  }

  test("matches the window-rank formulation row-for-row on testdata") {
    val rank = row_number().over(
      Window
        .partitionBy("l_suppkey")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    )
    val declarative = Graft
      .table(spark, sf, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .withColumn("rn", rank)
      .where(col("rn") <= 3)
      .drop("rn")
    val a = topkDf.orderBy("l_suppkey", "l_orderkey", "l_linenumber").collect()
    val b = declarative.orderBy("l_suppkey", "l_orderkey", "l_linenumber").collect()
    assert(a.length > 0 && a.toSeq === b.toSeq)
  }

  test("plans as partial heaps -> one exchange -> final heaps, no sort of the input") {
    val df = topkDf
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyPartial"), s"no partial phase in:\n$plan")
    assert(plan.contains("TopKPerKeyFinal"), s"no final phase in:\n$plan")
    // partial must sit BELOW the exchange (map-side reduction before shuffle)
    val iPartial = plan.indexOf("TopKPerKeyPartial")
    val iExchange = plan.indexOf("Exchange")
    val iFinal = plan.indexOf("TopKPerKeyFinal")
    assert(iFinal < iExchange && iExchange < iPartial, s"phase order wrong in:\n$plan")
    // bounded heaps replace sorting: no Sort / Window / WindowGroupLimit node
    assert(!plan.contains("Sort"), s"unexpected sort in:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window in:\n$plan")
    // column pruning below the node: the scan reads exactly the 4 columns
    assert(
      plan.contains(
        "ReadSchema: struct<l_orderkey:bigint,l_suppkey:bigint,l_linenumber:int,l_extendedprice:double>"
      ),
      s"scan not pruned to the projected columns in:\n$plan"
    )
  }

  test("short groups pass through whole; ties break on the unique key") {
    val df = Seq(
      // key 1: four rows, two tied on v — tiebreak id must pick id=10 first
      (1L, 10L, 5.0),
      (1L, 11L, 5.0),
      (1L, 12L, 3.0),
      (1L, 13L, 9.0),
      // key 2: a single row (group smaller than k)
      (2L, 20L, 1.0)
    ).toDF("key", "id", "v").repartition(4)
    val got = TopKPerKey(df, Seq(col("key")), Seq(col("v").desc, col("id").asc), k = 2)
      .orderBy("key", "id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === Seq((1L, 10L, 5.0), (1L, 13L, 9.0), (2L, 20L, 1.0)))
  }

  test("null keys form a group; null ordering values follow SortOrder null placement") {
    val df = Seq(
      (Some(1L), 1L, Some(2.0)),
      (Some(1L), 2L, None), // nulls last under .desc: loses to any non-null
      (Some(1L), 3L, Some(1.0)),
      (None, 4L, Some(7.0)),
      (None, 5L, Some(8.0)),
      (None, 6L, Some(6.0))
    ).toDF("key", "id", "v").repartition(3)
    val got = TopKPerKey(df, Seq(col("key")), Seq(col("v").desc, col("id").asc), k = 2)
      .orderBy(col("key").asc_nulls_first, col("id"))
      .collect()
      .map(r => (Option(r.get(0)), r.getLong(1)))
    assert(got.toSeq === Seq((None, 4L), (None, 5L), (Some(1L), 1L), (Some(1L), 3L)))
  }

  test("gate query q51 equals its oracle formulation via Spark SQL") {
    val got = SparkEntry.queries("q51_topk_per_key")(spark, sf)
    Graft.table(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    // DuckDB's oracle SQL is ANSI enough for Spark to run verbatim
    val oracle = spark.sql(SparkEntry.oracleSql("q51_topk_per_key"))
    assert(got.collect().toSeq === oracle.collect().toSeq)
  }
}
