package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{CleanFunctions => F, NocExtract}
import graft.operators.GroupOps

/** Stage-I cleaning — the Spark re-expression of the reference's
  * `clean_biodata` / `clean_results` / `clean_editions` composition
  * (reference pandas_based/src/data_clean.py:258-441). Pure
  * `DataFrame => DataFrame` stages; all scalar work is codegen'd Column
  * expressions from [[graft.functions.CleanFunctions]]; pandas semantics
  * are the spec where the reference's two variants diverge (SURVEY §2.13).
  */
object OlympicCleanI {

  /** Biodata columns dropped after parsing (data_clean.py:278). */
  private val biodataDrops = Seq(
    "Used name", "Born", "Died", "Full name", "Measurements", "Affiliations",
    "Title(s)", "Nationality", "Other names", "Original name", "Name order",
    "Nick/petnames")

  /** C1 lenient drop: ignore columns that don't exist. */
  def dropLenient(df: DataFrame, cols: Seq[String]): DataFrame =
    df.drop(cols.filter(df.columns.contains): _*)

  /** Biodata cleaning (name/measurements/dates/location/roles/NOC) —
    * one map-side projection pass, no shuffle.
    * `validCountries` feeds the F13 NOC UDF (bounded broadcast list).
    */
  def cleanBiodata(df: DataFrame, validCountries: Seq[String]): DataFrame = {
    val noc = NocExtract.nocCountries(df.sparkSession, validCountries)
    val parsed = df
      .withColumn("Name", F.cleanName(col("Used name")))
      .withColumn("Height (cm)", F.heightCm(col("Measurements")))
      .withColumn("Weight (kg)", F.weightKg(col("Measurements")))
      .withColumn("Born_Date", F.parseMixedDate(F.extractDateFragment(col("Born"))))
      .withColumn("Died_Date", F.parseMixedDate(F.extractDateFragment(col("Died"))))
      .withColumn("Is_Alive", F.isAlive(col("Died_Date")))
      .withColumn("Born_City", F.locCity(col("Born")))
      .withColumn("Born_Region", F.locRegion(col("Born")))
      .withColumn("Born_Country", F.locCountry(col("Born")))
      .withColumn("Roles", F.cleanRoles(trim(col("Roles"))))
      .withColumn("NOC", noc(col("NOC")))
    dropLenient(parsed, biodataDrops)
  }

  /** Affiliations → (dim_affiliation, bridge_athlete_affiliation)
    * (reference data_clean.py:100-151): explode the `/`-separated list,
    * regex-split club/city/country, build a DENSE Affiliation_Id
    * (pandas reset_index semantics — SURVEY §2.13.2; the Glue variant's
    * monotonically_increasing_id is sparse and was rejected), promote
    * "(XYZ)" city cells to country.
    */
  def affiliationTables(biodata: DataFrame): (DataFrame, DataFrame) = {
    val exploded = biodata
      .filter(col("Affiliations").isNotNull)
      .select(col("Athlete_Id"),
        explode(split(col("Affiliations"), "\\s*/\\s*")).as("aff"))
      .select(col("Athlete_Id"),
        F.affClub(col("aff")).as("Affiliation_Club"),
        F.affCity(col("aff")).as("Affiliation_City"),
        F.affCountry(col("aff")).as("Affiliation_Country"))

    val distinctAff = exploded
      .select("Affiliation_Club", "Affiliation_City", "Affiliation_Country")
      .distinct()
    // dims are bounded (~37k in the reference): row_number is safe; at true
    // scale swap for GroupOps.denseId (same contract, partition-parallel)
    val dim0 = GroupOps.rowNumberId(distinctAff,
        Seq(col("Affiliation_Club"), col("Affiliation_City"), col("Affiliation_Country")),
        "Affiliation_Id")
      .withColumn("Affiliation_Id", col("Affiliation_Id") - 1) // pandas 0-based
    // "(XYZ)" city promoted to country, city nulled (data_clean.py:139-148)
    val dim = dim0
      .withColumn("__code", F.parenCode(col("Affiliation_City")))
      .withColumn("Affiliation_Country",
        when(col("__code").isNotNull, col("__code")).otherwise(col("Affiliation_Country")))
      .withColumn("Affiliation_City",
        when(col("__code").isNotNull, lit(null)).otherwise(col("Affiliation_City")))
      .drop("__code")
      .select("Affiliation_Id", "Affiliation_Club", "Affiliation_City", "Affiliation_Country")

    // bridge joins BEFORE the code promotion (reference order) — keys are
    // the raw 3-tuple; dim is small ⇒ broadcast. NULL-SAFE equality: the
    // pandas merge the reference uses matches NaN keys (city/country are
    // often absent); a plain equi-join would drop those rows.
    val bridge = exploded.as("e").join(
        broadcast(dim0.as("d")),
        col("e.Affiliation_Club") <=> col("d.Affiliation_Club") &&
          col("e.Affiliation_City") <=> col("d.Affiliation_City") &&
          col("e.Affiliation_Country") <=> col("d.Affiliation_Country"),
        "left")
      .select(col("e.Athlete_Id").as("Athlete_Id"), col("d.Affiliation_Id").as("Affiliation_Id"))
      .dropDuplicates("Athlete_Id", "Affiliation_Id")
    (dim, bridge)
  }

  /** Results cleaning (data_clean.py:322-333): year/type split, position
    * digits + tie flag, drop raw columns.
    */
  def cleanResults(df: DataFrame): DataFrame =
    dropLenient(
      df.withColumn("Game Year", F.gameYear(col("Games")))
        .withColumn("Game Type", F.gameType(col("Games")))
        .withColumn("Position", F.positionNumber(col("Pos")))
        .withColumn("Tied", F.tiedFlag(col("Pos"))),
      Seq("Nationality", "Unnamed: 7", "Games", "Pos"))

  /** Editions cleaning (data_clean.py:339-441): competition-range rewrite
    * ("6-13 April" → "6 April"/"13 April"), ISO date strings, ancient-games
    * filter, comments rename, sequential Game_Id. The editions table is 76
    * rows — the single-partition row_number window is deliberate here.
    */
  def cleanEditions(df: DataFrame): DataFrame = {
    // "6-13 April" → start "6 April", end "13 April" (month shared);
    // otherwise split on "-" into both halves
    val comp = F.normalizeDashes(col("Competition"))
    val dayRange = regexp_extract(comp, "^(\\d+)\\s*-\\s*(\\d+\\s+[A-Za-z]+)", 0)
    val rangeStartDay = regexp_extract(comp, "^(\\d+)\\s*-\\s*(\\d+\\s+[A-Za-z]+)", 1)
    val rangeEnd = regexp_extract(comp, "^(\\d+)\\s*-\\s*(\\d+\\s+[A-Za-z]+)", 2)
    val rangeMonth = regexp_extract(rangeEnd, "([A-Za-z]+)", 1)
    val normalized = when(dayRange =!= "",
        concat_ws(" - ", concat_ws(" ", rangeStartDay, rangeMonth), rangeEnd))
      .otherwise(comp)

    val startRaw = trim(split(normalized, "-", 2).getItem(0))
    val endRaw = trim(element_at(split(normalized, "-", 2), -1))
    // try_cast: ancient editions carry years like "776 BC" and the format
    // pass runs BEFORE the ancient-games filter (reference order); pandas
    // errors='coerce' semantics → null, not ANSI failure
    def iso(day: Column) = date_format(
      F.parseDayMonthYear(day, expr("try_cast(`Year` AS INT)")), "yyyy-MM-dd")

    val cleaned = df
      .withColumn("Competition_Start", iso(startRaw))
      .withColumn("Competition_End",
        when(size(split(normalized, "-", 2)) >= 2, iso(endRaw)).otherwise(lit(null)))
      .withColumn("Opened", iso(trim(col("Opened"))))
      .withColumn("Closed", iso(trim(col("Closed"))))
      .filter(col("Game_Type") =!= "Ancient Olympic Games")
      .withColumnRenamed("Unnamed: 7", "Comments")
    val dropped = dropLenient(cleaned, Seq("#", "Competition"))
    GroupOps.rowNumberId(dropped,
      Seq(col("Year"), col("Game_Type"), col("Edition_Name")), "Game_Id")
  }
}
