package graft.operators

import graft.Graft.table
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Core relational operator surface (SURVEY.md §2.2-§2.5): projection,
  * filter, every join family, hash aggregation, windows, sorts/top-k, set
  * ops, scalar/string/date/JSON functions, grouping sets.
  *
  * Every query is paired with an ANSI-SQL oracle (run by the driver in
  * DuckDB on the same tables) in [[oracles]]. Conventions that make the
  * hash-compare deterministic at any scale:
  *   - total ORDER BY (tie-broken down to a unique key) in BOTH engines;
  *   - money sums rounded to their exact decimal count (2 for raw prices,
  *     4 for price×(1−disc), 6 with tax) so float summation order can never
  *     flip a digit;
  *   - integer-like outputs cast to BIGINT on the Spark side to match
  *     DuckDB's wider default types.
  *
  * Scale notes: dims (region/nation/supplier ≤ few hundred rows even at
  * SF1k) are broadcast; fact-fact joins (orders⋈lineitem) shuffle on the
  * join key and rely on AQE for skew; all aggregations are partial+final
  * hash aggs planned by Catalyst.
  */
object Relational {

  // revenue = extendedprice × (1 − discount): exact-4-decimal quantity
  private def revenue = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- aggregation ------------------------------------------------------
    "q01_pricing_summary" -> ((s, d) => {
      table(s, d, "lineitem")
        .where(col("l_shipdate") <= lit("2001-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base_price"),
          round(sum(revenue), 4).as("sum_disc_price"),
          round(sum(revenue * (lit(1.0) + col("l_tax"))), 4).as("sum_charge"),
          count(lit(1)).as("count_order")
        )
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "q12_distinct_agg" -> ((s, d) => {
      table(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          count_distinct(col("l_partkey")).as("n_parts"),
          count_distinct(col("l_suppkey")).as("n_supps"),
          sum("l_quantity").as("sum_qty")
        )
        .orderBy("l_returnflag")
    }),
    "q18_having" -> ((s, d) => {
      table(s, d, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("spend"))
        .where(col("n_orders") >= 15)
        .orderBy("o_custkey")
    }),

    // ---- filter / projection ---------------------------------------------
    "q02_filter_project" -> ((s, d) => {
      table(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1998-01-01") && col("l_shipdate") < lit("1998-02-01") && col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // ---- joins ------------------------------------------------------------
    "q03_join_broadcast" -> ((s, d) => {
      // customer ⋈ nation ⋈ region: both dims broadcast → fact never shuffles
      table(s, d, "customer")
        .join(broadcast(table(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(table(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_customers"), round(sum("c_acctbal"), 2).as("total_bal"))
        .orderBy("r_name", "n_name")
    }),
    "q04_join_shuffle" -> ((s, d) => {
      // orders ⋈ lineitem: large-large equi-join, shuffles on orderkey (AQE handles skew)
      table(s, d, "orders")
        .join(table(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(round(sum(revenue), 4).as("revenue"), count(lit(1)).as("n_items"))
        .orderBy("o_orderpriority")
    }),
    "q05_join_semi" -> ((s, d) => {
      // left-semi: orders having ≥1 heavy lineitem (EXISTS) — no fact duplication
      table(s, d, "orders")
        .join(
          table(s, d, "lineitem").where(col("l_quantity") >= 48),
          col("o_orderkey") === col("l_orderkey"),
          "left_semi"
        )
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus")
    }),
    "q06_join_anti" -> ((s, d) => {
      // left-anti: customers with no 2001 order (NOT EXISTS)
      table(s, d, "customer")
        .join(
          table(s, d, "orders").where(year(col("o_orderdate")) === 2001),
          col("c_custkey") === col("o_custkey"),
          "left_anti"
        )
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    }),
    "q07_join_outer_hist" -> ((s, d) => {
      // left-outer keeps order-less customers → orders-per-customer histogram
      table(s, d, "customer")
        .join(table(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"))
        .groupBy("n_orders")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("n_orders")
    }),
    "q19_join_derived" -> ((s, d) => {
      // orders beating their priority-class average (broadcast the 5-row agg)
      val o = table(s, d, "orders")
      val avgByPrio = o.groupBy("o_orderpriority").agg(avg("o_totalprice").as("ap"))
      o.join(broadcast(avgByPrio), "o_orderpriority")
        .where(col("o_totalprice") > col("ap"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_above"), round(max("o_totalprice"), 2).as("max_price"))
        .orderBy("o_orderpriority")
    }),

    // ---- windows ----------------------------------------------------------
    "q08_window_rank" -> ((s, d) => {
      // rank ≤ k over a low-cardinality partition key looks like a
      // parallelism collapse, but Catalyst's InferWindowGroupLimit plans a
      // partial WindowGroupLimit BEFORE the shuffle (top-3 per map
      // partition) + a final one after — verified in the probe plan at 16×
      // sf0.1 (4 s, linear). Declarative form is the right one; no
      // hand-rolled two-phase needed.
      val w = Window.partitionBy("c_mktsegment").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      table(s, d, "orders")
        .join(table(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 3)
        .select("c_mktsegment", "rk", "o_orderkey", "o_totalprice")
        .orderBy("c_mktsegment", "rk")
    }),
    "q09_window_running" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      table(s, d, "orders")
        .where(col("o_custkey") < 50)
        .withColumn("run_spend", round(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
        .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
        .withColumn("days_since_prev", datediff(col("o_orderdate").cast("date"), col("prev_date").cast("date")).cast("long"))
        .select("o_custkey", "o_orderkey", "run_spend", "days_since_prev")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ---- sort / top-k ------------------------------------------------------
    "q10_topk" -> ((s, d) => {
      // global top-10 → Catalyst plans TakeOrderedAndProject (no full sort)
      table(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    }),

    // ---- set ops -----------------------------------------------------------
    "q11_set_ops" -> ((s, d) => {
      val o = table(s, d, "orders")
      def buyers(yr: Int) = o.where(year(col("o_orderdate")) === yr).select("o_custkey").distinct()
      val b96 = buyers(1996); val b97 = buyers(1997)
      b96.intersect(b97).agg(count(lit(1)).as("cnt")).select(lit("both").as("tag"), col("cnt"))
        .unionAll(b96.union(b97).distinct().agg(count(lit(1)).as("cnt")).select(lit("either").as("tag"), col("cnt")))
        .unionAll(b96.except(b97).agg(count(lit(1)).as("cnt")).select(lit("only_1996").as("tag"), col("cnt")))
        .orderBy("tag")
    }),

    // ---- scalar functions --------------------------------------------------
    "q13_string_funcs" -> ((s, d) => {
      table(s, d, "part")
        .withColumn("color", element_at(split(col("p_name"), " "), 1))
        .groupBy(upper(col("color")).as("color"))
        .agg(
          count(lit(1)).as("n_parts"),
          count_distinct(col("p_brand")).as("n_brands"),
          min(length(col("p_name")).cast("long")).as("min_name_len"),
          max(concat_ws("/", col("p_type"), col("p_brand"))).as("max_type_brand")
        )
        .orderBy("color")
    }),
    "q14_date_funcs" -> ((s, d) => {
      table(s, d, "orders")
        .groupBy(
          year(col("o_orderdate")).cast("long").as("yr"),
          quarter(col("o_orderdate")).cast("long").as("qtr")
        )
        .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total"))
        .orderBy("yr", "qtr")
    }),
    "q15_conditional" -> ((s, d) => {
      // pivot-style conditional aggregation over join
      table(s, d, "customer")
        .join(broadcast(table(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(table(s, d, "orders"), col("c_custkey") === col("o_custkey"))
        .groupBy("n_name")
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
          sum(when(col("o_orderstatus") === "P", 1L).otherwise(0L)).as("n_p")
        )
        .orderBy("n_name")
    }),
    "q16_json" -> ((s, d) => {
      // both JSON paths: get_json_object (jsonpath) and from_json (typed schema)
      graft.Graft.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .withColumn("k2", from_json(col("props"), lit("k INT")).getField("k").cast("long"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          sum("k").as("sum_k"),
          sum("k2").as("sum_k_typed"),
          round(sum("value"), 2).as("sum_value")
        )
        .orderBy("event_type")
    }),

    // ---- grouping sets -----------------------------------------------------
    "q17_rollup" -> ((s, d) => {
      table(s, d, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n_orders")
        )
        .orderBy("status", "priority")
    }),

    // ---- time-bucketed events (batch face of the streaming query) ---------
    "q20_events_window" -> ((s, d) => {
      graft.Graft.events(s, d)
        .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("ws"), col("event_type"), col("n"), col("sum_value"))
        .orderBy("ws", "event_type")
    }),

    // value-based RANGE window frame — the frame family q09's ROWS frames
    // don't cover: each order aggregates its customer's orders within the
    // PRECEDING 30 DAYS by value distance, not row count (peers at equal
    // days are all included, per SQL RANGE semantics — identical in both
    // engines). One shuffle on the partition key; the frame evaluates
    // inside the sorted window pass.
    "q50_range_frame" -> ((s, d) => {
      val w = Window
        .partitionBy("o_custkey")
        .orderBy("days")
        .rangeBetween(-30, Window.currentRow)
      table(s, d, "orders")
        .where(col("o_custkey") < 100)
        .select(
          col("o_custkey"),
          col("o_orderkey"),
          datediff(col("o_orderdate"), lit("1992-01-01")).cast("long").as("days"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents")
        )
        .withColumn("w30_n", count(lit(1)).over(w))
        .withColumn("w30_cents", sum("cents").over(w))
        .select("o_custkey", "o_orderkey", "days", "w30_n", "w30_cents")
        .orderBy("o_custkey", "days", "o_orderkey")
    }),

    // sliding (overlapping) time windows — the q20 tumbling twin with
    // width 10 min / slide 5 min, so every event lands in exactly two
    // windows. Spark's `window()` generates the window set per row inside
    // codegen before the aggregation shuffle (the overlap factor multiplies
    // shuffle rows by w/slide — bounded and known, unlike a self-join
    // formulation). The oracle expands the same two bucket starts per event
    // from integer arithmetic.
    "q48_sliding_window" -> ((s, d) => {
      graft.Graft.events(s, d)
        .groupBy(window(col("ts"), "10 minutes", "5 minutes").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("ws"), col("event_type"), col("n"), col("sum_value"))
        .orderBy("ws", "event_type")
    })
  )

  def oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 4) AS sum_charge,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q12_distinct_agg" ->
      """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps, sum(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q18_having" ->
      """SELECT o_custkey, count(*) AS n_orders, round(sum(o_totalprice), 2) AS spend
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 15 ORDER BY o_custkey""".stripMargin,
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate >= '1998-01-01' AND l_shipdate < '1998-02-01' AND l_quantity > 45
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_join_broadcast" ->
      """SELECT r_name, n_name, count(*) AS n_customers, round(sum(c_acctbal), 2) AS total_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,
    "q04_join_shuffle" ->
      """SELECT o_orderpriority,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue, count(*) AS n_items
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q05_join_semi" ->
      """SELECT o_orderstatus, count(*) AS n_orders FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q06_join_anti" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND year(o_orderdate) = 2001)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q07_join_outer_hist" ->
      """SELECT n_orders, count(*) AS n_customers FROM (
        |  SELECT c_custkey, count(o_orderkey) AS n_orders
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey)
        |GROUP BY n_orders ORDER BY n_orders""".stripMargin,
    "q19_join_derived" ->
      """SELECT o.o_orderpriority, count(*) AS n_above, round(max(o.o_totalprice), 2) AS max_price
        |FROM orders o JOIN (
        |  SELECT o_orderpriority, avg(o_totalprice) AS ap FROM orders GROUP BY o_orderpriority) a
        |ON o.o_orderpriority = a.o_orderpriority
        |WHERE o.o_totalprice > a.ap
        |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin,
    "q08_window_rank" ->
      """SELECT c_mktsegment, rk, o_orderkey, o_totalprice FROM (
        |  SELECT c_mktsegment, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin,
    "q09_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_spend,
        |  datediff('day',
        |    lag(o_orderdate, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)::DATE,
        |    o_orderdate::DATE) AS days_since_prev
        |FROM orders WHERE o_custkey < 50 ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q10_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q11_set_ops" ->
      """WITH b96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996),
        |     b97 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1997)
        |SELECT 'both' AS tag, count(*) AS cnt FROM (SELECT * FROM b96 INTERSECT SELECT * FROM b97)
        |UNION ALL
        |SELECT 'either' AS tag, count(*) AS cnt FROM (SELECT * FROM b96 UNION SELECT * FROM b97)
        |UNION ALL
        |SELECT 'only_1996' AS tag, count(*) AS cnt FROM (SELECT * FROM b96 EXCEPT SELECT * FROM b97)
        |ORDER BY tag""".stripMargin,
    "q13_string_funcs" ->
      """SELECT upper(split_part(p_name, ' ', 1)) AS color, count(*) AS n_parts,
        |  count(DISTINCT p_brand) AS n_brands,
        |  min(length(p_name)) AS min_name_len,
        |  max(p_type || '/' || p_brand) AS max_type_brand
        |FROM part GROUP BY 1 ORDER BY color""".stripMargin,
    "q14_date_funcs" ->
      """SELECT year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
        |  count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY yr, qtr""".stripMargin,
    "q15_conditional" ->
      """SELECT n_name,
        |  cast(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  cast(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  cast(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |JOIN orders ON c_custkey = o_custkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q16_json" ->
      """SELECT event_type, count(*) AS n_events,
        |  cast(sum(cast(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        |  cast(sum(cast(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k_typed,
        |  round(sum(value), 2) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q17_rollup" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority, count(*) AS n_orders
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "q20_events_window" ->
      """SELECT strftime(time_bucket(INTERVAL 5 MINUTE, ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ws,
        |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin,
    "q50_range_frame" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(date_diff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS days,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders WHERE o_custkey < 100)
        |SELECT o_custkey, o_orderkey, days,
        |  count(*) OVER w AS w30_n,
        |  CAST(sum(cents) OVER w AS BIGINT) AS w30_cents
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY days
        |             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, days, o_orderkey""".stripMargin,
    "q48_sliding_window" ->
      """SELECT strftime(time_bucket(INTERVAL 5 MINUTE, ts::TIMESTAMP) - k * INTERVAL 5 MINUTE,
        |    '%Y-%m-%d %H:%M:%S') AS ws,
        |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events, unnest([0, 1]) t(k)
        |GROUP BY 1, 2 ORDER BY ws, event_type""".stripMargin
  )
}
