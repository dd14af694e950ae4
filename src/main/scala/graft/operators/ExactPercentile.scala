package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Distributed exact percentiles without the per-group value map.
  *
  * Spark's built-in `percentile` buffers a value→count OpenHashMap per group
  * inside the aggregation buffer. Grouped by a low-cardinality key over a
  * near-continuous double (q27: 3 groups × l_extendedprice), the final-agg
  * task for each group must hold every distinct value in memory at once —
  * billions of entries at 100 TB, an un-spillable OOM cliff (VERDICT r01,
  * What's-wrong #4).
  *
  * This two-phase shape computes the identical result with bounded memory:
  *
  *   1. `groupBy(group, value).count()` — distributed pre-aggregation,
  *      map-side partial combine, shuffle on (group, value).
  *   2. A running-count window per group ordered by value. The window sort
  *      is an external (spillable) sort and the running sum is streaming,
  *      so the per-task footprint is O(1) rows regardless of how many
  *      distinct values a group has — that is the difference from the
  *      hash-map buffer, which cannot spill.
  *   3. Each requested percentile becomes one tiny target row
  *      (pos = p·(N−1), its floor and ceil); values at those order
  *      statistics are picked up in one more equi-join on the group key and
  *      interpolated with Spark's own formula
  *      `(hi − pos)·v_lo + (pos − lo)·v_hi` — bit-identical to the
  *      built-in (asserted in ExactPercentileSpec) and to DuckDB's
  *      `quantile_cont` (driver gate, q27).
  *
  * Three shuffles total, all spill-safe; survives any distinct-value
  * cardinality. The built-in stays preferable when groups are numerous and
  * small (its buffer then fits); this is the low-group-cardinality /
  * high-distinct-value regime's escape hatch.
  */
object ExactPercentile {

  /** One output column per (alias, percentage), exact-interpolated.
    * NULL values are excluded up front — the built-in `percentile` (and
    * DuckDB `quantile_cont`) ignore NULLs, so counting them would shift
    * every order-statistic position and could interpolate against a null
    * endpoint (ADVICE r02). */
  def apply(df: DataFrame, group: String, value: Column, ps: Seq[(String, Double)]): DataFrame = {
    val counts = df
      .where(value.isNotNull)
      .groupBy(col(group), value.as("x"))
      .agg(count(lit(1)).as("c"))
    val wcum = Window.partitionBy(group).orderBy("x").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("cum", sum("c").over(wcum))
      .withColumn("prev", col("cum") - col("c"))
    val targets = counts
      .groupBy(col(group))
      .agg(sum("c").as("n"))
      .select(
        col(group),
        explode(array(ps.map { case (nm, p) => struct(lit(nm).as("pname"), lit(p).as("p")) }: _*)).as("t"),
        col("n")
      )
      .select(col(group), col("t.pname").as("pname"), (col("t.p") * (col("n") - 1)).as("pos"))
      .withColumn("lo", floor(col("pos")))
      .withColumn("hi", ceil(col("pos")))
    val hit = (bound: Column) => bound.between(col("prev"), col("cum") - 1)
    val picked = cum
      .join(targets, Seq(group))
      .where(hit(col("lo")) || hit(col("hi")))
      .groupBy(col(group), col("pname"), col("pos"), col("lo"), col("hi"))
      .agg(
        max(when(hit(col("lo")), col("x"))).as("vlo"),
        max(when(hit(col("hi")), col("x"))).as("vhi")
      )
      .withColumn(
        "pval",
        when(col("lo") === col("hi"), col("vlo"))
          .otherwise((col("hi") - col("pos")) * col("vlo") + (col("pos") - col("lo")) * col("vhi"))
      )
    picked
      .groupBy(col(group))
      .agg(
        ps.map { case (nm, _) => max(when(col("pname") === nm, col("pval"))).as(nm) }.head,
        ps.tail.map { case (nm, _) => max(when(col("pname") === nm, col("pval"))).as(nm) }: _*
      )
  }

  /** WEIGHTED exact percentiles (x133), lower-bound semantics: the p-th
    * weighted percentile is the smallest value whose cumulative weight
    * reaches p·W — an actual data value, never an interpolation, so
    * integer inputs cross the gate as integers. Same spillable two-phase
    * shape as [[apply]]: per-(group, value) weight sums, one streaming
    * cumulative window, then each target picks its UNIQUE covering row
    * via `prev < target ≤ cum` (no scan of the distribution per target).
    * Weights must be positive (non-positive rows are excluded, matching
    * the oracle's WHERE); `p` should be dyadic so p·W is IEEE-exact. */
  def weighted(
      df: DataFrame,
      group: String,
      value: Column,
      weight: Column,
      ps: Seq[(String, Double)]
  ): DataFrame = {
    val counts = df
      .where(value.isNotNull && weight > 0)
      .groupBy(col(group), value.as("x"))
      .agg(sum(weight).as("c"))
    val wcum = Window.partitionBy(group).orderBy("x").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counts
      .withColumn("cum", sum("c").over(wcum))
      .withColumn("prev", col("cum") - col("c"))
    val targets = counts
      .groupBy(col(group))
      .agg(sum("c").as("w_total"))
      .select(
        col(group),
        col("w_total"),
        explode(array(ps.map { case (nm, p) => struct(lit(nm).as("pname"), lit(p).as("p")) }: _*)).as("t")
      )
      // p = 0 still means "the smallest value": clamp the target to 1 unit
      .select(col(group), col("w_total"), col("t.pname").as("pname"),
        greatest(col("t.p") * col("w_total"), lit(1.0)).as("tgt"))
    val picked = cum
      .join(targets, Seq(group))
      .where(col("prev") < col("tgt") && col("tgt") <= col("cum"))
    val aggs = max(col("w_total")).as("w_total") +:
      ps.map { case (nm, _) => max(when(col("pname") === nm, col("x"))).as(nm) }
    picked.groupBy(col(group)).agg(aggs.head, aggs.tail: _*)
  }
}
