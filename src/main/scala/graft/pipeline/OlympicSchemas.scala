package graft.pipeline

import org.apache.spark.sql.types._

/** Pinned bronze-layer schemas for the Olympic pipeline — the 16-column
  * biodata / 10-column results contract the reference's scraper enforces
  * (reference aws_migration/src/athlete_scrape_glue.py:242-272; editions
  * shape from pandas_based/src/editions_scrap.py:53-76). Explicit schemas
  * on every read: no inference pass, no drift (SURVEY.md §1.3).
  */
object OlympicSchemas {

  private def s(n: String) = StructField(n, StringType)

  /** bronze/raw_data/biodata.parquet — 1 row per athlete. */
  val biodata: StructType = StructType(Seq(
    StructField("Athlete_Id", IntegerType, nullable = false),
    s("Roles"), s("Sex"), s("Used name"), s("Born"), s("Died"),
    s("Measurements"), s("Affiliations"), s("NOC"), s("Full name"),
    s("Title(s)"), s("Nationality"), s("Other names"), s("Original name"),
    s("Name order"), s("Nick/petnames")))

  /** bronze/raw_data/results.parquet — 1 row per athlete-event entry. */
  val results: StructType = StructType(Seq(
    StructField("Athlete_Id", IntegerType, nullable = false),
    s("Games"), s("NOC"), s("Discipline"), s("As"), s("Event"),
    s("Team"), s("Pos"), s("Medal"), s("Nationality"), s("Unnamed: 7")))

  /** bronze/raw_data/editions.parquet — 1 row per Olympic edition. */
  val editions: StructType = StructType(Seq(
    s("#"), s("Year"), s("City"), s("Country"), s("Opened"), s("Closed"),
    s("Competition"), s("Unnamed: 7"), s("Game_Type"), s("Edition_Name")))

  /** bronze/data/wikipedia-iso-country-codes.csv header lookup. */
  val isoCountryCodes: StructType = StructType(Seq(
    s("English short name lower case"), s("Alpha-2 code"), s("Alpha-3 code"),
    s("Numeric code"), s("ISO 3166-2")))
}
