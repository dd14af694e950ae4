package graft.operators

import graft.TestSpark
import org.apache.spark.sql.graftbridge.JaroWinklerExpr
import org.apache.spark.sql.functions.{md5, reverse}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Jaro–Winkler laws beyond the gate's 2000-pair DuckDB conformance:
  * literature-known values, the DuckDB degenerate convention, SQL-vs-
  * Column parity through the registered function, and codegen. */
class JaroWinklerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def jw(a: String, b: String): Double =
    JaroWinklerExpr.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  test("known values from the record-linkage literature") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-15)
    assert(math.abs(jw("dwayne", "duane") - 0.84) < 1e-15)
    // no boost below/at-prefix-0 even though jaro > 0.7
    assert(math.abs(jw("jellyfish", "smellyfish") - 0.8962962962962964) < 1e-15)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("a", "b") === 0.0) // no matches
  }

  test("degenerate convention follows DuckDB: any empty side is 0.0") {
    assert(jw("", "") === 0.0)
    assert(jw("abc", "") === 0.0)
    assert(jw("", "abc") === 0.0)
  }

  test("SQL registration parity and whole-stage codegen") {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    val df = Seq(("martha", "marhta"), ("crate", "trace"), ("zzz", "qqq"))
      .toDF("a", "b")
    val viaSql = df.selectExpr("jaro_winkler(a, b) AS j").as[Double].collect()
    val viaCol = df.select(graft.functions.JaroWinkler($"a", $"b").as("j")).as[Double].collect()
    assert(viaSql.toSeq === viaCol.toSeq)
    // codegen span needs a non-local relation (a LocalRelation constant-folds
    // the whole projection before planning — the DedupSpec lesson)
    val cust = graft.Graft
      .table(spark, "/root/testdata/sf0.001", "customer")
      .select(md5($"c_custkey".cast("string")).as("nm"))
    val agg = cust.select(graft.functions.JaroWinkler($"nm", reverse($"nm")).as("j")).groupBy().max("j")
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("jaro_winkler")))
  }
}
