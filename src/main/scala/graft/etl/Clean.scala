package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Cleaning rules for the I94 fact table (SURVEY.md §2.2 P3-P6 — declared
  * in the reference's notebook cells 7-8 but never implemented there).
  *
  * All rules are single Catalyst expressions — codegen'd, no UDFs — so the
  * whole clean stage stays inside one WholeStageCodegen span over the scan.
  */
object Clean {

  /** SAS date numeric = days since 1960-01-01 (reference
    * `I94_SAS_Labels_Descriptions.SAS:966-968,1038-1040`). Cross-check:
    * arrdate=20566.0 ↔ dtadfile=20160422 (`immigration_data_sample.csv` row 1). */
  def sasDate(c: Column): Column =
    date_add(lit("1960-01-01").cast("date"), c.cast("int"))

  /** `yyyyMMdd` string date, e.g. dtadfile (`...SAS:1056`); unparseable → null. */
  def yyyymmdd(c: Column): Column = try_to_date(c, "yyyyMMdd")

  /** `MMddyyyy` admitted-until date with sentinel `D/S` (duration of status)
    * and `00000000`-style junk (`...SAS:1080`, sample row 2) → null. */
  def mmddyyyy(c: Column): Column =
    try_to_date(nullif(c, lit("D/S")), "MMddyyyy")

  /** Full cleaned fact table: typed keys, decoded dates, sentinel policy.
    *   - doubles-as-keys → int/long (SAS stores all numerics as float64)
    *   - i94addr not in the valid state set → '99' ("everything else goes
    *     into 'other'", `...SAS:979-980`)
    *   - duplicate cicid dropped (notebook cell 7 "duplicate data")
    */
  def immigration(raw: DataFrame, validStateCodes: Seq[String]): DataFrame = {
    val states = validStateCodes.toSet
    raw
      .dropDuplicates("cicid")
      .select(
        col("cicid").cast("long").as("cicid"),
        col("i94yr").cast("int").as("year"),
        col("i94mon").cast("int").as("month"),
        col("i94cit").cast("int").as("origin_country_code"),
        col("i94res").cast("int").as("residence_country_code"),
        col("i94port").as("port_code"),
        sasDate(col("arrdate")).as("arrival_date"),
        col("i94mode").cast("int").as("mode_code"),
        when(col("i94addr").isin(states.toSeq: _*), col("i94addr"))
          .otherwise(lit("99"))
          .as("state_code"),
        sasDate(col("depdate")).as("departure_date"),
        col("i94bir").cast("int").as("age"),
        col("i94visa").cast("int").as("visa_code"),
        yyyymmdd(col("dtadfile")).as("date_added"),
        col("visapost").as("visa_post"),
        col("occup").as("occupation"),
        col("entdepa").as("arrival_flag"),
        col("entdepd").as("departure_flag"),
        col("entdepu").as("update_flag"),
        col("matflag").as("match_flag"),
        col("biryear").cast("int").as("birth_year"),
        mmddyyyy(col("dtaddto")).as("admitted_until"),
        col("gender").as("gender"),
        col("insnum").as("ins_num"),
        col("airline").as("airline"),
        col("admnum").cast("long").as("admission_num"),
        col("fltno").as("flight_no"),
        col("visatype").as("visa_type")
      )
      // stay duration = depdate − arrdate (SURVEY.md §2.5)
      .withColumn("stay_days", datediff(col("departure_date"), col("arrival_date")))
  }
}
