package graft.operators

import graft.{Graft, TestSpark}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{TopKPerKeyStrategy, TopKRewriteRule}
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rewrite: a user's declarative window-rank top-k query
  * re-plans onto the bounded-heap operator automatically, bit-identically —
  * and bails out for rank() and when disabled. */
class TopKRewriteSpec extends AnyFunSuite {
  private val sf = "/root/testdata/sf0.001"

  private lazy val ruled = {
    val s = TestSpark.spark.newSession()
    s.experimental.extraStrategies = Seq(TopKPerKeyStrategy)
    s.experimental.extraOptimizations = Seq(TopKRewriteRule)
    s
  }

  private def declarative(s: org.apache.spark.sql.SparkSession) = {
    val w = Window
      .partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    Graft
      .table(s, sf, "lineitem")
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
  }

  test("row_number-filter pattern plans as the heap operator, results bit-identical") {
    val q = declarative(ruled)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal"), s"rewrite did not fire:\n$plan")
    assert(!plan.contains("WindowGroupLimit"), s"group-limit survived the rewrite:\n$plan")
    val expected = declarative(TestSpark.spark).collect().map(_.toSeq).toSeq
    assert(declarative(ruled).collect().map(_.toSeq).toSeq === expected) // rn column included
  }

  test("disabled via conf: the declarative plan is untouched") {
    ruled.conf.set("spark.graft.topkRewrite.enabled", "false")
    try {
      val plan = declarative(ruled).queryExecution.executedPlan.toString
      assert(!plan.contains("TopKPerKey"), s"rewrite fired while disabled:\n$plan")
    } finally ruled.conf.set("spark.graft.topkRewrite.enabled", "true")
  }

  test("keyless (global) rank-filter plans on AllTuples and stays exact (x272 regression)") {
    // an UNPARTITIONED row_number window rewrites to a KEYLESS top-k —
    // the exec must demand AllTuples, not ClusteredDistribution(Nil)
    // (which is a constructor error; found by the r10 session-wide rule
    // trial on x272's priority-sample shortlist)
    def global(s: org.apache.spark.sql.SparkSession) = {
      val w = Window.orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
      Graft
        .table(s, sf, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 7)
        .orderBy("rn")
    }
    val q = global(ruled)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKeyFinal"), s"rewrite did not fire:\n$plan")
    assert(global(ruled).collect().map(_.toSeq).toSeq === global(TestSpark.spark).collect().map(_.toSeq).toSeq)
  }

  test("rank() is NOT rewritten (tie semantics can exceed k rows)") {
    val w = Window.partitionBy("l_suppkey").orderBy(col("l_extendedprice").desc)
    val q = Graft
      .table(ruled, sf, "lineitem")
      .select("l_suppkey", "l_extendedprice")
      .withColumn("rk", rank().over(w))
      .where(col("rk") <= 3)
    assert(!q.queryExecution.executedPlan.toString.contains("TopKPerKey"))
  }
}
