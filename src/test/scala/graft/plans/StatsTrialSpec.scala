package graft.plans

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Plan asserts for the r10 default-on trial's genuine fires (the
  * verdict's Done criterion): with statistics wired and the rule
  * enabled, the gate queries whose optimized plans changed in the trial
  * — all StatsJoinRule broadcast-hint injections — must (a) actually
  * gain a broadcast hint and (b) return bit-identical results. The
  * trial's full record (9 queries, 0/403 hash breaks) lives in NOTES;
  * this pins three representative shapes: a 2-way shuffle join (q04), a
  * 3-relation chain under an aggregate (q85), and the join-size
  * instrument (x132). */
class StatsTrialSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def withRule[T](on: Boolean)(body: => T): T = {
    spark.conf.set("spark.graft.statsJoin.enabled", on.toString)
    try body
    finally spark.conf.set("spark.graft.statsJoin.enabled", "false")
  }

  private def hinted(name: String): Boolean = {
    val df = SparkEntry.queries(name)(spark, sf)
    val rewritten = org.apache.spark.sql.graftbridge.StatsJoinRule
      .rewrite(org.apache.spark.sql.graftbridge.Bridge.analyzedPlan(df))
    rewritten.toString.contains("strategy=broadcast")
  }

  test("trial-flagged gate queries gain broadcast hints under the rule, results identical") {
    graft.sources.JoinStats.ensure(spark, sf)
    for (name <- Seq("q04_join_shuffle", "q85_volume_shipping", "x132_join_size_estimate")) {
      withRule(on = true) {
        assert(hinted(name), s"$name: no broadcast hint injected")
      }
      val base = SparkEntry.queries(name)(spark, sf).collect().map(_.toString).sorted.toSeq
      val ruled = withRule(on = true) {
        val df = SparkEntry.queries(name)(spark, sf)
        val (on, _) = org.apache.spark.sql.graftbridge.Bridge.statsJoin(df)
        on.collect().map(_.toString).sorted.toSeq
      }
      assert(ruled === base, s"$name: rule changed the RESULT")
    }
  }
}
