package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{Bridge, StatsSkewRule}
import org.scalatest.funsuite.AnyFunSuite

/** Stats-fed skew salting (x273) — the fourth optimizer rule. Laws:
  *   - the rewrite NEVER changes results (salted ≡ plain, row for row);
  *   - it fires only where the stats support it: inner single-equi joins
  *     over registered leaves whose probe key's count-min bound clears the
  *     share threshold — outer joins, multi-conjunct conditions,
  *     unregistered tables, uniform keys, and unloaded stats all bail;
  *   - it is fixpoint-stable (a salted join never re-salts — the optimizer
  *     applies user rules repeatedly);
  *   - the session-toggle path (injected rule + conf) agrees with the
  *     explicit Bridge path.
  */
class StatsSkewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def armed[T](body: => T): T = {
    graft.sources.JoinStats.ensure(spark, d)
    body
  }

  private def skewQ = {
    val root = graft.sources.SkewFixture.dir(d)
    val fact = spark.read.parquet(s"$root/skewfact.parquet")
    val dim = spark.read.parquet(s"$root/skewdim.parquet")
    fact
      .join(dim, fact("skey") === dim("skey"))
      .groupBy("sname")
      .agg(count(lit(1)).as("n"), sum("cents").as("v"))
  }

  test("rewrite fires on the skewed join, salts the plan, and never changes the result") {
    armed {
      val (on, fired) = Bridge.statsSkew(skewQ)
      assert(fired, "rule must fire on the 70%-skewed key")
      assert(Bridge.saltAudit(on), "salt projection must be in the rewritten plan")
      assert(!Bridge.saltAudit(skewQ), "plain plan must not carry a salt")
      assert(
        on.orderBy("sname").collect().toSeq === skewQ.orderBy("sname").collect().toSeq,
        "salted result must equal the plain join"
      )
      val (share, salts) = StatsSkewRule.adviceFor("skewfact", "skey").get
      assert(share > 600000 && share < 800000, s"CM bound must see the 70% stripe: $share")
      assert(salts === 16)
    }
  }

  test("bail-outs: outer join, multi-conjunct, unregistered leaf, uniform key, unloaded stats") {
    armed {
      val root = graft.sources.SkewFixture.dir(d)
      val fact = spark.read.parquet(s"$root/skewfact.parquet")
      val dim = spark.read.parquet(s"$root/skewdim.parquet")
      // outer join
      assert(!Bridge.statsSkew(fact.join(dim, fact("skey") === dim("skey"), "left"))._2)
      // multi-conjunct condition (v1 handles single equi only)
      assert(
        !Bridge
          .statsSkew(fact.join(dim, fact("skey") === dim("skey") && fact("skey") >= dim("skey")))
          ._2
      )
      // unregistered leaf (in-memory frame, no stats)
      import spark.implicits._
      val mem = Seq((0L, "m0"), (1L, "m1")).toDF("skey", "mname")
      assert(!Bridge.statsSkew(fact.join(mem, fact("skey") === mem("skey")))._2)
      // uniform key: l_orderkey's CM bound is far under the 20% share floor
      val li = graft.Graft.table(spark, d, "lineitem").select("l_orderkey", "l_quantity")
      val ord = graft.Graft.table(spark, d, "orders").select("o_orderkey", "o_orderstatus")
      assert(!Bridge.statsSkew(li.join(ord, li("l_orderkey") === ord("o_orderkey")))._2)
      // no stats, no rewrite
      graft.sources.JoinStats.unload()
      try assert(!Bridge.statsSkew(skewQ)._2)
      finally graft.sources.JoinStats.load(spark)
    }
  }

  test("fixpoint-stable: a salted plan never re-salts") {
    armed {
      val analyzed = Bridge.analyzedPlan(skewQ)
      val once = StatsSkewRule.rewrite(analyzed)
      assert(!once.fastEquals(analyzed))
      assert(StatsSkewRule.rewrite(once).fastEquals(once), "second application must be a no-op")
    }
  }

  test("optimizer-injected path: the rule salts under the conf, survives fixpoint, result unchanged") {
    armed {
      val plain = skewQ.orderBy("sname").collect().toSeq
      // the runtime equivalent of spark.sql.extensions=GraftExtensions
      // (one shared test session): inject into the session optimizer, so
      // the rule runs inside a REPEATED batch — the fixpoint guard is
      // load-bearing here, not just asserted
      val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      classic.experimental.extraOptimizations =
        classic.experimental.extraOptimizations :+ StatsSkewRule
      spark.conf.set("spark.graft.skewSalt.enabled", "true")
      try {
        val q = skewQ
        val salted = Bridge
          .optimizedPlan(q)
          .collectFirst {
            case g: org.apache.spark.sql.catalyst.plans.logical.Generate
                if g.generatorOutput.exists(_.name == "_rsalt") =>
              true
          }
          .getOrElse(false)
        assert(salted, "injected rule must salt the optimized plan under the conf")
        assert(q.orderBy("sname").collect().toSeq === plain)
      } finally {
        spark.conf.unset("spark.graft.skewSalt.enabled")
        classic.experimental.extraOptimizations =
          classic.experimental.extraOptimizations.filterNot(_ eq StatsSkewRule)
      }
    }
  }
}
