package graft.operators

import graft.{Graft, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ReshapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("q52 unpivot inverts the pivot back to the long-form aggregate") {
    val melted = Reshape.queries("q52_unpivot")(spark, sf).collect()
    val direct = Graft
      .table(spark, sf, "orders")
      .groupBy("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority", "o_orderstatus")
      .collect()
    assert(melted.length === direct.length)
    melted.zip(direct).foreach { case (m, d) =>
      assert(m.getAs[String]("o_orderpriority") === d.getAs[String]("o_orderpriority"))
      assert(m.getAs[String]("status") === d.getAs[String]("o_orderstatus"))
      assert(m.getAs[Long]("n_orders") === d.getAs[Long]("n_orders"))
    }
  }

  test("q53 grouping sets: pair rows match plain groupBy, single-dim rows match their marginals") {
    val rows = Reshape.queries("q53_grouping_sets")(spark, sf).collect()
    val pairs = rows.filter(r => r.getAs[String]("status") != "ALL" && r.getAs[String]("priority") != "ALL")
    val byStatus = rows.filter(r => r.getAs[String]("status") != "ALL" && r.getAs[String]("priority") == "ALL")
    val byPriority = rows.filter(r => r.getAs[String]("status") == "ALL" && r.getAs[String]("priority") != "ALL")
    val direct = Graft
      .table(spark, sf, "orders")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getAs[String]("o_orderstatus"), r.getAs[String]("o_orderpriority")) -> r.getAs[Long]("n"))
      .toMap
    assert(pairs.length === direct.size)
    pairs.foreach { r =>
      assert(r.getAs[Long]("n_orders") === direct((r.getAs[String]("status"), r.getAs[String]("priority"))))
    }
    // marginals are sums of their pair rows (no () grouping set declared)
    byStatus.foreach { r =>
      val st = r.getAs[String]("status")
      assert(r.getAs[Long]("n_orders") === direct.collect { case ((s, _), n) if s == st => n }.sum)
    }
    byPriority.foreach { r =>
      val pr = r.getAs[String]("priority")
      assert(r.getAs[Long]("n_orders") === direct.collect { case ((_, p), n) if p == pr => n }.sum)
    }
    assert(!rows.exists(r => r.getAs[String]("status") == "ALL" && r.getAs[String]("priority") == "ALL"))
  }

  test("q54 map funcs: totals reconcile and key strings are sorted") {
    val rows = Reshape.queries("q54_map_funcs")(spark, sf).collect()
    val perPriority = Graft
      .table(spark, sf, "orders")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getAs[String]("o_orderpriority") -> r.getAs[Long]("n"))
      .toMap
    rows.foreach { r =>
      // aggregate(map_values) must equal the plain per-priority count
      assert(r.getAs[Long]("total") === perPriority(r.getAs[String]("o_orderpriority")))
      val keys = r.getAs[String]("statuses").split(",").toSeq
      assert(keys === keys.sorted, s"map keys not sorted: $keys")
      assert(keys.distinct.size.toLong === r.getAs[Long]("n_statuses"))
    }
  }

  test("q58 variant_get extraction agrees with the string-JSON twin") {
    val viaVariant = Reshape.queries("q58_variant")(spark, sf).collect()
    val viaString = Graft
      .events(spark, sf)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(expr("k div 10").as("k_bucket"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"))
      .orderBy("k_bucket", "event_type")
      .collect()
    assert(viaVariant.map(_.toSeq).toSeq === viaString.map(_.toSeq).toSeq)
  }

  test("q62 pagerank matches a plain-Scala recompute on a planted graph") {
    val dir = TestSpark.tempDir()
    TestSpark.writeTable(dir, "lineitem",
      Seq((10L, 1L), (10L, 4L), (12L, 1L), (11L, 2L), (13L, 3L)).toDF("l_orderkey", "l_suppkey"))
    TestSpark.writeTable(dir, "orders",
      Seq((10L, 100L), (11L, 100L), (12L, 101L), (13L, 102L)).toDF("o_orderkey", "o_custkey"))
    // reference implementation: same integer formulas, plain Scala
    val rawEdges = Seq((10L, 1L), (10L, 4L), (12L, 1L), (11L, 2L), (13L, 3L)).flatMap { case (o, sup) =>
      Seq((sup * 4 + 1, o * 4 + 2), (o * 4 + 2, sup * 4 + 1))
    } ++ Seq((10L, 100L), (11L, 100L), (12L, 101L), (13L, 102L)).flatMap { case (o, c) =>
      Seq((o * 4 + 2, c * 4 + 3), (c * 4 + 3, o * 4 + 2))
    }
    val edges = rawEdges.distinct
    val deg = edges.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val nodes = edges.map(_._1).distinct
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to 5) {
      val sc = edges.groupBy(_._2).map { case (dst, es) => dst -> es.map(e => r(e._1) / deg(e._1)).sum }
      r = nodes.map(n => n -> (150000L + 850L * sc.getOrElse(n, 0L) / 1000L)).toMap
    }
    val got = Reshape
      .queries("q62_pagerank")(spark, dir)
      .collect()
      .map(x => (x.getAs[String]("node_type"), x.getAs[Long]("id")) -> x.getAs[Long]("r"))
      .toMap
    val tag = Map(1L -> "S", 2L -> "O", 3L -> "C")
    val expected = r.map { case (n, v) => (tag(n % 4), n / 4) -> v }
    assert(got === expected) // 10 nodes < limit 20 → full ranking comparable
  }

  test("q61 fuzzy match keeps distance-1 name pairs and drops distance-2") {
    val rows = Reshape
      .queries("q61_fuzzy_match")(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("name_a"), r.getAs[String]("name_b")) -> r.getAs[Long]("dist"))
      .toMap
    assert(rows.values.forall(_ == 1L))
    assert(rows.contains(("NATION_1", "NATION_2"))) // single substitution
    assert(!rows.contains(("NATION_12", "NATION_21"))) // transposition = distance 2
  }

  test("q55 BFS min-hops on a planted supplier-order-customer graph") {
    val dir = TestSpark.tempDir()
    // S1-{O10,O12}; O10-{S1,S4,C100}; O12-C101; O11-{S2,C100}; O13-{S3,C102}
    // → hop0 S1; hop1 O10,O12; hop2 S4,C100,C101; hop3 O11; S2 is hop 4
    // (beyond depth), S3/O13/C102 disconnected from S1.
    TestSpark.writeTable(dir, "lineitem",
      Seq((10L, 1L), (10L, 4L), (12L, 1L), (11L, 2L), (13L, 3L)).toDF("l_orderkey", "l_suppkey"))
    TestSpark.writeTable(dir, "orders",
      Seq((10L, 100L), (11L, 100L), (12L, 101L), (13L, 102L)).toDF("o_orderkey", "o_custkey"))
    val got = Reshape
      .queries("q55_recursive_reach")(spark, dir)
      .collect()
      .map(r => (r.getAs[String]("node_type"), r.getAs[Long]("hop")) -> r.getAs[Long]("n"))
      .toMap
    assert(got === Map(("S", 0L) -> 1L, ("O", 1L) -> 2L, ("S", 2L) -> 1L, ("C", 2L) -> 2L, ("O", 3L) -> 1L))
  }
  test("x195 assortativity: closed-form graphs pin the statistic and the zero-variance guard") {
    import spark.implicits._
    def r(edges: Seq[(Long, Long)]): Long =
      Reshape.assortativity(edges.toDF("a", "b")).collect().head.getAs[Long]("r_ppm")
    // path 1-2-3-4: endpoint degree pairs (1,2)(2,2)(2,1) -> r = -1/2
    assert(r(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === -500000L)
    // two disjoint cliques (K4 + K3): every edge joins equal degrees -> r = 1
    val k4 = for { i <- 1 to 4; j <- (i + 1) to 4 } yield (i.toLong, j.toLong)
    val k3 = for { i <- 5 to 7; j <- (i + 1) to 7 } yield (i.toLong, j.toLong)
    assert(r(k4 ++ k3) === 1000000L)
    // a star is PERFECTLY disassortative (hub only meets leaves): r = -1
    assert(r((2L to 6L).map(l => (1L, l))) === -1000000L)
    // a single clique is REGULAR: every endpoint degree equal -> zero
    // variance, guarded to 0 (the x162 degenerate-case convention)
    assert(r(k4) === 0L)
  }

}
