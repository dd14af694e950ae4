package graft.operators

import graft.{Graft, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{Bridge, EagerAggRule}
import org.scalatest.funsuite.AnyFunSuite

/** EagerAggRule laws beyond the x160 gate: the rewrite is value-identical
  * on its reference shape, the plan actually contains the pushed-down
  * partial aggregate, and every soundness guard (raw dim, outer join,
  * non-mergeable aggregate, decimal sum, distinct aggregate, disabled
  * conf) bails out. */
class EagerAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def fact = Graft
    .table(spark, sf, "lineitem")
    .select(
      col("l_suppkey"),
      expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
      col("l_quantity").cast("long").as("qty")
    )

  private def uniqueDim = Graft
    .table(spark, sf, "supplier")
    .groupBy(col("s_suppkey"))
    .agg(max("s_nationkey").as("nk"))

  private def query(dim: DataFrame, joinType: String = "inner") = fact
    .join(dim, col("l_suppkey") === col("s_suppkey"), joinType)
    .groupBy(col("nk"))
    .agg(sum("cents").as("rev"), count(lit(1)).as("n"), min("qty").as("mn"), max("qty").as("mx"))

  test("fires on a unique dim; partial aggregate below the join; values identical") {
    val (rw, fired) = Bridge.eagerAgg(query(uniqueDim))
    assert(fired, "rule did not fire")
    assert(
      rw.queryExecution.optimizedPlan.toString.contains("graft_partial_"),
      s"no pushed partial in:\n${rw.queryExecution.optimizedPlan}"
    )
    val expected = query(uniqueDim).orderBy("nk").collect().map(_.toSeq).toSeq
    assert(rw.orderBy("nk").collect().map(_.toSeq).toSeq === expected)
  }

  test("bails out on every unsoundness hazard") {
    // raw dim: supplier keys happen to be unique, but the PLAN can't prove it
    val rawDim = Graft.table(spark, sf, "supplier").select(col("s_suppkey"), col("s_nationkey").as("nk"))
    assert(!Bridge.eagerAgg(query(rawDim))._2, "fired on an unproven dim")
    // outer join: unmatched fact rows null-extend, partial merge is wrong
    assert(!Bridge.eagerAgg(query(uniqueDim, "left"))._2, "fired on an outer join")
    // avg is not re-mergeable as itself
    val avgQ = fact
      .join(uniqueDim, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nk"))
      .agg(avg("qty").as("a"))
    assert(!Bridge.eagerAgg(avgQ)._2, "fired on avg")
    // decimal sum: re-summing widens the result precision
    val decQ = fact
      .withColumn("dec", col("cents").cast("decimal(18,2)"))
      .join(uniqueDim, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nk"))
      .agg(sum("dec").as("sd"))
    assert(!Bridge.eagerAgg(decQ)._2, "fired on a decimal sum")
    // distinct aggregate
    val distQ = fact
      .join(uniqueDim, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("nk"))
      .agg(countDistinct("qty").as("cd"))
    assert(!Bridge.eagerAgg(distQ)._2, "fired on a distinct aggregate")
  }

  test("global (ungrouped) aggregates bail: empty-join COUNT must stay 0, not NULL (review-found)") {
    val emptyFact = fact.where(col("l_suppkey") < 0) // no rows survive
    val globalQ = emptyFact
      .join(uniqueDim, col("l_suppkey") === col("s_suppkey"))
      .agg(count(lit(1)).as("n"))
    assert(!Bridge.eagerAgg(globalQ)._2, "fired on an ungrouped aggregate")
    assert(globalQ.head().getLong(0) === 0L)
  }

  test("idempotent under fixpoint batches: re-applying never stacks partials (review-found)") {
    val (rw1, fired1) = Bridge.eagerAgg(query(uniqueDim))
    assert(fired1)
    val (_, fired2) = Bridge.eagerAgg(rw1)
    assert(!fired2, "rule re-fired on its own output")
    // and the session-wide fixpoint path produces exactly one partial layer
    val s2 = spark.newSession()
    s2.experimental.extraOptimizations = Seq(EagerAggRule)
    val q2 = Graft
      .table(s2, sf, "lineitem")
      .select(col("l_suppkey"), expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .join(
        Graft.table(s2, sf, "supplier").groupBy(col("s_suppkey")).agg(max("s_nationkey").as("nk")),
        col("l_suppkey") === col("s_suppkey")
      )
      .groupBy(col("nk"))
      .agg(sum("cents").as("rev"))
    val plan = q2.queryExecution.optimizedPlan.toString
    assert(plan.contains("graft_partial_0"))
    // one alias site + bounded references; a stacking regression shows
    // dozens of lines (one fresh partial per fixpoint iteration)
    assert(
      plan.linesIterator.count(_.contains("graft_partial_0")) <= 3,
      s"partials stacked:\n$plan"
    )
  }

  test("session-wide via extraOptimizations; conf disables it") {
    val s2 = spark.newSession()
    s2.experimental.extraOptimizations = Seq(EagerAggRule)
    def q2 = Graft
      .table(s2, sf, "lineitem")
      .select(col("l_suppkey"), expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .join(
        Graft.table(s2, sf, "supplier").groupBy(col("s_suppkey")).agg(max("s_nationkey").as("nk")),
        col("l_suppkey") === col("s_suppkey")
      )
      .groupBy(col("nk"))
      .agg(sum("cents").as("rev"))
    assert(q2.queryExecution.optimizedPlan.toString.contains("graft_partial_"))
    val expected = query(uniqueDim).select("nk", "rev").orderBy("nk").collect().map(_.toSeq).toSeq
    assert(q2.orderBy("nk").collect().map(_.toSeq).toSeq === expected)
    s2.conf.set("spark.graft.eagerAgg.enabled", "false")
    try assert(!q2.queryExecution.optimizedPlan.toString.contains("graft_partial_"))
    finally s2.conf.set("spark.graft.eagerAgg.enabled", "true")
  }
}
