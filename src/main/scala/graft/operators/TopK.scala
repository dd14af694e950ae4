package graft.operators

import graft.Graft.table
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Top-k rows per key as a whole-operator Catalyst extension — the public
  * face of [[org.apache.spark.sql.graftbridge.TopKPerKeyNode]] (custom
  * `LogicalPlan` + `SparkStrategy` + two-phase `SparkPlan`).
  *
  * Semantically identical to
  * `row_number() OVER (PARTITION BY keys ORDER BY order) <= k` — which is
  * exactly how the DuckDB oracle states it — but physically it is partial
  * bounded-heap reduce → one hash exchange on the keys → final bounded-heap
  * merge: per-partition memory O(k · keys), shuffle volume ≤ k rows per key
  * per input partition instead of every input row, and no full per-group
  * sort. See the scale rationale on the node's Scaladoc.
  *
  * `order` must be a total order (tie-break to a unique key) for "the" top-k
  * to be well-defined; pass `col(...).desc` / `.asc` columns.
  *
  * Project the input to the columns you need FIRST: the node passes its
  * child's schema through untouched, so column pruning must happen below it
  * (the gate query selects 4 columns before the operator — its scan
  * `ReadSchema` stays 4-wide, asserted in TopKPerKeySpec).
  */
object TopKPerKey {

  def apply(df: DataFrame, keys: Seq[Column], order: Seq[Column], k: Int): DataFrame =
    Bridge.topKPerKey(df, keys, order, k)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q51: 3 highest-value lineitems per supplier — many small groups, the
    // per-key-top-k shape (dashboard "best n per entity") that window-rank
    // would full-sort. Price crosses the gate as integer cents (NOTES
    // invariant #8); (orderkey, linenumber) tie-breaks to a unique key.
    "q51_topk_per_key" -> ((s, d) => {
      val items = table(s, d, "lineitem")
        .select(
          col("l_suppkey"),
          col("l_orderkey"),
          col("l_linenumber"),
          col("l_extendedprice")
        )
      TopKPerKey(
        items,
        keys = Seq(col("l_suppkey")),
        order = Seq(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc),
        k = 3
      )
        .select(
          col("l_suppkey"),
          col("l_orderkey"),
          col("l_linenumber"),
          round(col("l_extendedprice") * 100).cast("long").as("price_cents")
        )
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    })
  )

  def oracles: Map[String, String] = Map(
    "q51_topk_per_key" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |       CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
        |FROM (
        |  SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
        |         row_number() OVER (
        |           PARTITION BY l_suppkey
        |           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |         ) AS rn
        |  FROM lineitem)
        |WHERE rn <= 3
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin
  )
}
