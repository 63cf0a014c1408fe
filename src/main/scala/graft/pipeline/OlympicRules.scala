package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{CleanFunctions => F}
import graft.operators.{GroupOps, Validation, ValidationRule}

/** The reference's Pandera validation surface as declarative rule sets —
  * reference pandas_based/src/data_quality_and_validation.py:24-235.
  * Row-level checks are `ValidationRule`s (one boolean Column each,
  * evaluated lazily collect-all — §2.10); uniqueness checks are
  * table-level (A9 duplicate detection).
  */
object OlympicRules {

  /** bios schema checks (:47-82 + cross-column :24-43). */
  def biosRules: Seq[ValidationRule] = Seq(
    ValidationRule("athlete_id_min", col("Athlete_Id") >= 1),
    ValidationRule("sex_enum", col("Sex").isNull || col("Sex").isin("Male", "Female")),
    ValidationRule("height_range",
      col("Height (cm)").isNull || col("Height (cm)").between(100, 250)),
    ValidationRule("weight_range",
      col("Weight (kg)").isNull || col("Weight (kg)").between(25, 200)),
    ValidationRule("died_after_born",
      col("Died_Date").isNull || col("Born_Date").isNull ||
        col("Died_Date") >= col("Born_Date")),
    ValidationRule("bmi_sane",
      col("Height (cm)").isNull || col("Weight (kg)").isNull ||
        F.bmiSane(col("Weight (kg)"), col("Height (cm)"))),
    ValidationRule("born_country_len3",
      col("Born_Country").isNull || length(col("Born_Country")) === 3))

  /** affiliations checks (:96-112). */
  def affiliationRules: Seq[ValidationRule] = Seq(
    ValidationRule("affiliation_id_min", col("Affiliation_Id") >= 0),
    ValidationRule("club_present", col("Affiliation_Club").isNotNull))

  /** results checks (:118-164), incl. medal⇔position consistency. */
  def resultsRules: Seq[ValidationRule] = Seq(
    ValidationRule("medal_enum",
      col("Medal").isNull || col("Medal").isin("Gold", "Silver", "Bronze")),
    ValidationRule("position_min",
      col("Position").isNull || col("Position") >= 1),
    ValidationRule("year_range",
      col("Game Year").isNull || col("Game Year").between(1850, 2024)),
    ValidationRule("medal_position_consistent",
      col("Medal").isNull ||
        (col("Medal") === "Gold" && col("Position") === 1) ||
        (col("Medal") === "Silver" && col("Position") === 2) ||
        (col("Medal") === "Bronze" && col("Position") === 3) ||
        col("Tied") === true))

  /** editions checks (:179-235): date orderings over ISO strings (string
    * compare == date compare for yyyy-MM-dd).
    */
  def editionRules: Seq[ValidationRule] = Seq(
    ValidationRule("opened_before_closed",
      col("Opened").isNull || col("Closed").isNull || col("Opened") <= col("Closed")),
    ValidationRule("competition_ordered",
      col("Competition_Start").isNull || col("Competition_End").isNull ||
        col("Competition_Start") <= col("Competition_End")),
    ValidationRule("year_range", col("Year").cast("int").between(1850, 2024)))

  /** Table-level uniqueness (Pandera `unique` / duplicate lambdas —
    * :24-28, :88-92, :172-176): key sets that must not repeat.
    */
  val uniqueKeys: Map[String, Seq[Seq[String]]] = Map(
    "bios" -> Seq(Seq("Athlete_Id"), Seq("Name", "Born_Date")),
    "affiliations" -> Seq(Seq("Affiliation_Id"), Seq("Affiliation_Club")),
    "editions" -> Seq(Seq("Year", "Edition_Name", "Game_Type")))

  /** Run every check for one table: returns (violation counts, duplicate
    * groups per key set, failure-case rows) — the engine's answer to the
    * reference's lazy-collect-all + failure-case materialization.
    */
  def validateTable(df: DataFrame, rules: Seq[ValidationRule],
                    uniques: Seq[Seq[String]]): (DataFrame, Seq[DataFrame], DataFrame) = {
    val counts = Validation.violationCounts(df, rules)
    val dups = uniques.map(keys => GroupOps.duplicateKeys(df, keys))
    val cases = Validation.failureCasesOnePass(df, rules)
    (counts, dups, cases)
  }
}
