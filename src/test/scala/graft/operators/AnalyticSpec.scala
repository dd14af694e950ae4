package graft.operators

import graft.{Graft, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnalyticSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q63 ntile: quartiles within a segment differ by at most 1 row and partition the segment") {
    val rows = Analytic.queries("q63_ntile_distribution")(spark, sf).collect()
    val segTotals = Graft
      .table(spark, sf, "customer")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getAs[String]("c_mktsegment") -> r.getAs[Long]("n"))
      .toMap
    rows.groupBy(_.getAs[String]("seg")).foreach { case (seg, qs) =>
      assert(qs.map(_.getAs[Long]("quartile")).sorted.toSeq === Seq(1L, 2L, 3L, 4L))
      val sizes = qs.map(_.getAs[Long]("n"))
      assert(sizes.max - sizes.min <= 1, s"ntile bucket sizes uneven for $seg")
      assert(sizes.sum === segTotals(seg))
      // quartile value ranges are non-overlapping in window order: ntile
      // splits by ROW position under a total order, so bucket k's max is
      // never above bucket k+1's min (equality allowed on tied cents)
      val sortedQ = qs.sortBy(_.getAs[Long]("quartile"))
      sortedQ.sliding(2).foreach {
        case Array(a, b) => assert(a.getAs[Long]("max_cents") <= b.getAs[Long]("min_cents"))
        case _           =>
      }
      // percent_rank of the first quartile starts at 0; cume_dist of the last hits exactly 1e6
      assert(sortedQ.head.getAs[Long]("pr_min_e6") === 0L)
      assert(sortedQ.last.getAs[Long]("cd_max_e6") === 1000000L)
    }
  }

  test("q64 ignore-nulls navigation skips the planted view NULLs") {
    val rows = Analytic.queries("q64_ignore_nulls")(spark, sf).collect()
    assert(rows.nonEmpty)
    // recompute first/second non-null per user directly
    // let Spark do the (ts, event_id) ordering — collected rows stay in
    // orderBy order, so per-user sequences need no client-side re-sort
    val direct = Graft
      .table(spark, sf, "events")
      .select(
        col("user_id"),
        col("ts"),
        col("event_id"),
        when(col("event_type") =!= "view", expr("CAST(round(value * 100) AS BIGINT)")).as("cents")
      )
      .orderBy("user_id", "ts", "event_id")
      .collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (u, rs) =>
        val nonNull = rs.flatMap(r => Option(r.getAs[java.lang.Long]("cents")).map(_.longValue()))
        u -> (nonNull.headOption, nonNull.drop(1).headOption)
      }
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val (f, s2) = direct(u)
      assert(Option(r.getAs[java.lang.Long]("first_cents")).map(_.longValue()) === f, s"user $u first")
      assert(Option(r.getAs[java.lang.Long]("second_cents")).map(_.longValue()) === s2, s"user $u second")
    }
  }

  test("q65 bitwise aggregate identities hold per group") {
    val rows = Analytic.queries("q65_bitwise_agg")(spark, sf).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      val (and, or) = (r.getAs[Long]("b_and"), r.getAs[Long]("b_or"))
      // AND is a subset of OR's bits
      assert((and & or) === and)
      assert(r.getAs[Long]("or_low8") === (or & 255L))
      assert(r.getAs[Long]("and_shl2") === (and << 2))
    }
  }

  test("q66 median matches a direct sorted-midpoint computation") {
    val rows = Analytic.queries("q66_median")(spark, sf).collect()
    val direct = Graft
      .table(spark, sf, "orders")
      .select(col("o_orderpriority"), expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("c"))
      .collect()
      .groupBy(_.getAs[String]("o_orderpriority"))
      .map { case (p, rs) =>
        val v = rs.map(_.getAs[Long]("c")).sorted
        val m =
          if (v.length % 2 == 1) v(v.length / 2).toDouble
          else (v(v.length / 2 - 1) + v(v.length / 2)) / 2.0
        p -> m
      }
    rows.foreach(r => assert(r.getAs[Double]("med_cents") === direct(r.getAs[String]("o_orderpriority"))))
  }

  test("q67 try_divide nulls exactly the quantity-1 rows; try_element_at nulls linenumber>1") {
    val rows = Analytic.queries("q67_try_arith")(spark, sf).collect()
    val li = Graft.table(spark, sf, "lineitem")
    val nQty1 = li.where(col("l_quantity") === 1.0).groupBy("l_returnflag").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n")).toMap
    val nLine1 = li.where(col("l_linenumber") === 1).groupBy("l_returnflag").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("n")).toMap
    rows.foreach { r =>
      val f = r.getAs[String]("l_returnflag")
      assert(r.getAs[Long]("n_div_null") === nQty1.getOrElse(f, 0L))
      assert(r.getAs[Long]("n_first_line") === nLine1.getOrElse(f, 0L))
    }
  }

  test("q70 boolean aggregates agree with direct predicate counts") {
    val rows = Analytic.queries("q70_bool_aggs")(spark, sf).collect()
    val li = Graft.table(spark, sf, "lineitem")
    val direct = li
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("l_quantity") > 1.0, 1L).otherwise(0L)).as("n_multi"),
        sum(when(col("l_discount") > 0.05, 1L).otherwise(0L)).as("n_disc"),
        sum(when(col("l_tax") > 0.04, 1L).otherwise(0L)).as("n_taxed")
      )
      .collect()
      .map(r => r.getAs[String]("l_returnflag") -> r)
      .toMap
    rows.foreach { r =>
      val d = direct(r.getAs[String]("l_returnflag"))
      assert(r.getAs[Boolean]("all_multi") === (d.getAs[Long]("n_multi") === d.getAs[Long]("n")))
      assert(r.getAs[Boolean]("any_disc") === (d.getAs[Long]("n_disc") > 0L))
      assert(r.getAs[Long]("n_taxed") === d.getAs[Long]("n_taxed"))
    }
  }

  test("x61 surprisal: closed-form values on a planted two-doc corpus") {
    import spark.implicits._
    val dir = TestSpark.tempDir()
    TestSpark.writeTable(
      dir,
      "documents",
      Seq(
        (0L, "the the the the", "en", "s", 15L),
        (1L, "the zzz", "en", "s", 7L)
      ).toDF("doc_id", "text", "lang", "source", "n_chars")
    )
    val rows = graft.operators.TextAnalysis
      .queries("x61_surprisal")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_tokens"), r.getAs[Long]("mean_bits_e3"), r.getAs[Long]("max_bits")))
      .toMap
    // corpus N=6; tf(the)=5 → bits = floor(log2(6 div 5 = 1)) = 0;
    // tf(zzz)=1 → bits = floor(log2(6)) = 2
    assert(rows(0L) === ((4L, 0L, 0L)))
    assert(rows(1L) === ((2L, 1000L, 2L)))
  }

  test("x63 BPE pair counts: closed-form on a planted corpus, deterministic tie order") {
    import spark.implicits._
    val dir = TestSpark.tempDir()
    TestSpark.writeTable(
      dir,
      "documents",
      Seq((0L, "aaab aab x", "en", "s", 10L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    )
    val rows = graft.operators.TextAnalysis
      .queries("x63_bpe_pairs")(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("pair"), r.getAs[Long]("n")))
    // aaab → aa, aa, ab; aab → aa, ab; x has no pair
    assert(rows.toSeq === Seq(("aa", 3L), ("ab", 2L)))
  }

  test("x65 feature hashing conserves token mass: l1 == token count, nnz bounded") {
    val rows = graft.operators.TextAnalysis.queries("x65_feature_hash")(spark, sf).collect()
    val nTokens = Graft
      .table(spark, sf, "documents")
      .select(col("doc_id"), size(split(lower(trim(col("text"))), "\\s+")).cast("long").as("n"))
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n"))
      .toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("l1") === nTokens(id), s"doc $id l1")
      assert(r.getAs[Long]("nnz") <= math.min(256L, nTokens(id)), s"doc $id nnz")
      assert(r.getAs[Long]("max_cnt") >= 1L)
    }
  }

  test("q69 text roundtrip survives the write/read/parse cycle against a direct aggregate") {
    val rt = Advanced.queries("q69_text_roundtrip")(spark, sf).collect()
    val direct = Graft
      .table(spark, sf, "customer")
      .join(Graft.table(spark, sf, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("n"), expr("sum(CAST(round(c_acctbal * 100) AS BIGINT))").as("cents"))
      .orderBy("n_name")
      .collect()
    assert(rt.length === direct.length)
    rt.zip(direct).foreach { case (a, b) =>
      assert(a.getAs[String]("n_name") === b.getAs[String]("n_name"))
      assert(a.getAs[Long]("n") === b.getAs[Long]("n"))
      assert(a.getAs[Long]("cents") === b.getAs[Long]("cents"))
    }
  }

  test("q71 native session_window: over-gap splits, exact-boundary gap still merges") {
    import spark.implicits._
    val dir = TestSpark.tempDir()
    val min = 60L * 1000000000L // ns
    TestSpark.writeTable(
      dir,
      "events",
      Seq(
        // user 1: 0, +10min (merged), +45min gap → second session
        (1L, 0L * min, 1L, "view", 1.0, "{}"),
        (2L, 10L * min, 1L, "view", 2.0, "{}"),
        (3L, 55L * min, 1L, "view", 4.0, "{}"),
        // user 2: gap of EXACTLY 30min → merged (session end is INCLUSIVE)
        (4L, 0L * min, 2L, "view", 8.0, "{}"),
        (5L, 30L * min, 2L, "view", 16.0, "{}")
      ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    )
    val rows = Analytic.queries("q71_session_window")(spark, dir).collect()
    val sessions = rows.map(r =>
      (r.getAs[Long]("user_id"), r.getAs[Long]("start_us"), r.getAs[Long]("end_us"), r.getAs[Long]("n_events"), r.getAs[Long]("cents"))
    )
    val us = 60L * 1000000L
    assert(
      sessions.toSeq === Seq(
        (1L, 0L, 40L * us, 2L, 300L),   // [0, 10min] + 30min gap
        (1L, 55L * us, 85L * us, 1L, 400L),
        (2L, 0L, 60L * us, 2L, 2400L)   // exact-boundary event merged in
      )
    )
  }

  test("q72 schema evolution: epoch-1 rows surface NULL cents under mergeSchema") {
    val rows = Advanced.queries("q72_schema_evolution")(spark, sf).collect()
    val pre = Graft
      .table(spark, sf, "orders")
      .where(year(col("o_orderdate")) < 1996)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getAs[String]("o_orderpriority") -> r.getAs[Long]("n"))
      .toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_without_cents") === pre.getOrElse(r.getAs[String]("o_orderpriority"), 0L))
      assert(r.getAs[Long]("n_total") >= r.getAs[Long]("n_without_cents"))
    }
  }

  test("q68 add_months clamps to month end (Jan 31 + 1 month = Feb 28/29)") {
    import spark.implicits._
    val clamped = Seq("1995-01-31", "1996-01-31", "1995-03-31")
      .toDF("d")
      .select(date_format(add_months(col("d").cast("date"), 1), "yyyy-MM-dd").as("p"))
      .as[String]
      .collect()
    assert(clamped.toSeq === Seq("1995-02-28", "1996-02-29", "1995-04-30"))
    val rows = Analytic.queries("q68_calendar_arith")(spark, sf).collect()
    assert(rows.nonEmpty)
    // the earliest week floor lands within 6 days before the quarter start
    // (Monday of the quarter's first order week) and inside the quarter
    rows.foreach { r =>
      val qtr = java.time.LocalDate.parse(r.getAs[String]("qtr"))
      val wk = java.time.LocalDate.parse(r.getAs[String]("wk_min"))
      assert(!wk.isBefore(qtr.minusDays(6)) && wk.isBefore(qtr.plusMonths(3)))
      assert(r.getAs[String]("ld_max") >= r.getAs[String]("qtr"))
    }
  }
}
