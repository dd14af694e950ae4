package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Star-schema assembly (SURVEY.md §2.3 — the joins the reference's data
  * model declares but never implements).
  *
  * Every dimension here is ≤660 rows against a 3.1M-row (reference scale) to
  * 100 TB (target scale) fact side, so each join is pinned to broadcast-hash
  * with `broadcast()` — zero shuffle of the fact table, the only plan that
  * survives a 1000-executor scale-up.
  */
object Model {

  /** Decode-join the cleaned fact against all five SAS-label dims. */
  def build(spark: SparkSession, fact: DataFrame, dims: SasLabels.Dims): DataFrame = {
    def dim(df: DataFrame, prefix: String) =
      broadcast(df.select(col("code").as(s"${prefix}_code_k"), col("name").as(s"${prefix}_name")))

    fact
      .join(dim(dims.countries, "origin"), col("origin_country_code") === col("origin_code_k"), "left")
      .join(dim(dims.countries, "residence"), col("residence_country_code") === col("residence_code_k"), "left")
      .join(broadcast(dims.ports.select(
          col("code").as("port_code_k"), col("name").as("port_name"),
          col("city").as("port_city"), col("state").as("port_state"))),
        col("port_code") === col("port_code_k"), "left")
      .join(dim(dims.modes, "mode"), col("mode_code") === col("mode_code_k"), "left")
      .join(dim(dims.states, "state"), col("state_code") === col("state_code_k"), "left")
      .join(dim(dims.visas, "visa"), col("visa_code") === col("visa_code_k"), "left")
      .drop("origin_code_k", "residence_code_k", "port_code_k", "mode_code_k", "state_code_k", "visa_code_k")
  }

  /** Demographics dim aggregated to state grain for the fact join on
    * `state_code` ↔ `State Code` (reference `us-cities-demographics.csv:1`). */
  def stateDemographics(demo: DataFrame): DataFrame =
    demo
      .groupBy(col("State Code").as("state_code"), col("State").as("state"))
      .agg(
        sum("Total Population").as("total_population"),
        sum("Foreign-born").as("foreign_born"),
        avg("Median Age").as("median_age")
      )
}
