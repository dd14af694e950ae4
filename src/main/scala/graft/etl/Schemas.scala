package graft.etl

import org.apache.spark.sql.types._

/** Explicit StructTypes for every external table the engine ingests.
  *
  * The reference infers every schema (`inferSchema=True` at
  * `dags/transform/airport.py:5`; SAS header in notebook cell 5). At 100 TB
  * an inference pass is a second full scan, so the engine declares schemas
  * once here (SURVEY.md §1.3).
  */
object Schemas {

  /** I94 immigration fact table — 28 columns, all SAS numerics as double
    * (parquet footer of reference `sas_data/part-00000`; FIXTURES.md A1). */
  val immigration: StructType = StructType(
    Seq(
      "cicid", "i94yr", "i94mon", "i94cit", "i94res"
    ).map(StructField(_, DoubleType)) ++ Seq(StructField("i94port", StringType)) ++ Seq(
      "arrdate", "i94mode"
    ).map(StructField(_, DoubleType)) ++ Seq(StructField("i94addr", StringType)) ++ Seq(
      StructField("depdate", DoubleType),
      StructField("i94bir", DoubleType),
      StructField("i94visa", DoubleType),
      StructField("count", DoubleType)
    ) ++ Seq(
      "dtadfile", "visapost", "occup", "entdepa", "entdepd", "entdepu", "matflag"
    ).map(StructField(_, StringType)) ++ Seq(StructField("biryear", DoubleType)) ++ Seq(
      "dtaddto", "gender", "insnum", "airline"
    ).map(StructField(_, StringType)) ++ Seq(StructField("admnum", DoubleType)) ++ Seq(
      "fltno", "visatype"
    ).map(StructField(_, StringType))
  )

  /** `us-cities-demographics.csv` — `;`-delimited, 12 cols (FIXTURES.md A3). */
  val demographics: StructType = StructType(
    Seq(
      StructField("City", StringType),
      StructField("State", StringType),
      StructField("Median Age", DoubleType),
      StructField("Male Population", LongType),
      StructField("Female Population", LongType),
      StructField("Total Population", LongType),
      StructField("Number of Veterans", LongType),
      StructField("Foreign-born", LongType),
      StructField("Average Household Size", DoubleType),
      StructField("State Code", StringType),
      StructField("Race", StringType),
      StructField("Count", LongType)
    )
  )

  /** datahub.io airport-codes schema — the file is absent from the reference
    * checkout (`.MISSING_LARGE_BLOBS:1`) but its schema is public knowledge
    * (FIXTURES.md A5); read at `dags/transform/airport.py:4`. */
  val airportCodes: StructType = StructType(
    Seq(
      StructField("ident", StringType),
      StructField("type", StringType),
      StructField("name", StringType),
      StructField("elevation_ft", DoubleType),
      StructField("continent", StringType),
      StructField("iso_country", StringType),
      StructField("iso_region", StringType),
      StructField("municipality", StringType),
      StructField("gps_code", StringType),
      StructField("iata_code", StringType),
      StructField("local_code", StringType),
      StructField("coordinates", StringType)
    )
  )

  /** 1,000-row CSV sample of the fact table: leading unnamed row-index col
    * + the 28 immigration columns (FIXTURES.md A2). */
  val immigrationSample: StructType =
    StructType(StructField("_row", LongType) +: immigration.fields.toSeq)
}
