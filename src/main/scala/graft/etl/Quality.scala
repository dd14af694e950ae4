package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality checks — the real implementation of the reference's stub
  * `DataQualityOperator` (`plugins/operators/data_quality.py:12-13` is
  * `pass`) plus the notebook cell-12 checklist: row-count completeness,
  * unique key, FK coverage, null-ratio thresholds (SURVEY.md §2.8 O12).
  *
  * Each check is one distributed aggregation; nothing is collected but the
  * scalar verdict, so the same checks run unchanged at 100 TB.
  */
object Quality {

  final case class Result(check: String, passed: Boolean, detail: String)

  /** Source/Count completeness: table is non-empty. */
  def nonEmpty(df: DataFrame, name: String): Result = {
    val n = df.count()
    Result(s"non_empty($name)", n > 0, s"rows=$n")
  }

  /** Unique-key check via one agg (count vs distinct count — no self-join).
    * NULL keys violate a primary-key contract, so they are counted too. */
  def uniqueKey(df: DataFrame, key: String): Result = {
    val row = df
      .agg(
        count(lit(1)).as("rows"),
        count_distinct(col(key)).as("d"),
        sum(col(key).isNull.cast("long")).as("nulls")
      )
      .head()
    val (n, d, nulls) = (row.getLong(0), row.getLong(1), if (row.isNullAt(2)) 0L else row.getLong(2))
    Result(s"unique_key($key)", nulls == 0 && n == d, s"rows=$n distinct=$d nulls=$nulls")
  }

  /** FK coverage: fraction of fact keys found in the dim — ONE scan of the
    * fact side (broadcast left join; total and misses from the same agg). */
  def fkCoverage(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String, minCoverage: Double = 1.0): Result = {
    val d = dim.select(col(dimKey).as("_dim_key")).distinct()
    val row = fact
      .where(col(factKey).isNotNull)
      .join(broadcast(d), col(factKey) === col("_dim_key"), "left")
      .agg(count(lit(1)).as("total"), sum(col("_dim_key").isNull.cast("long")).as("misses"))
      .head()
    val total = row.getLong(0)
    val misses = if (row.isNullAt(1)) 0L else row.getLong(1)
    val cov = if (total == 0) 1.0 else 1.0 - misses.toDouble / total
    Result(s"fk_coverage($factKey→$dimKey)", cov >= minCoverage, f"coverage=$cov%.4f misses=$misses")
  }

  /** Null-ratio threshold per column, all columns in ONE pass. An empty
    * input has no defined ratio → fail closed rather than vacuously pass. */
  def nullRatios(df: DataFrame, maxRatio: Map[String, Double]): Seq[Result] = {
    val aggs = maxRatio.keys.toSeq.map(c => avg(col(c).isNull.cast("double")).as(c))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    maxRatio.toSeq.map { case (c, mx) =>
      if (row.isNullAt(row.fieldIndex(c)))
        Result(s"null_ratio($c)", passed = false, "no rows — ratio undefined")
      else {
        val r = row.getAs[Double](c)
        Result(s"null_ratio($c)", r <= mx, f"ratio=$r%.4f max=$mx%.2f")
      }
    }
  }

  def runAll(checks: Seq[Result]): Seq[Result] = {
    checks.foreach(r => println(f"[quality] ${if (r.passed) "PASS" else "FAIL"}%s ${r.check}%-40s ${r.detail}"))
    checks
  }
}
