package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Gold-layer rename/reorder to warehouse conventions — reference
  * pandas_based/src/columns_renaming_reordering_and_final_save.py:33-96.
  * Rename maps are LinkedHashMap-ordered: the map order IS the output
  * column order; absent columns are silently skipped (the reference relies
  * on that to drop the never-created editions `*_Imputed` pair —
  * SURVEY §2.10 quirk, resolved here by only ever declaring flags the
  * pipeline actually produces).
  */
object OlympicGold {

  /** C2+C3: rename per the map, project to map order, skip absent. */
  def renameAndReorder(df: DataFrame, names: Seq[(String, String)]): DataFrame = {
    val renames = names.filter { case (from, _) => df.columns.contains(from) }
    val renamed = df.withColumnsRenamed(renames.toMap)
    renamed.select(renames.map { case (_, to) => col(to) }: _*)
  }

  val dimAthletes: Seq[(String, String)] = Seq(
    "Athlete_Id" -> "athlete_id",
    "Name" -> "athlete_name",
    "Roles" -> "athlete_roles",
    "Sex" -> "athlete_sex",
    "NOC" -> "athlete_NOC",
    "Height (cm)" -> "athlete_height_cm",
    "Weight (kg)" -> "athlete_weight_kg",
    "Born_Date" -> "athlete_born_date",
    "Died_Date" -> "athlete_died_date",
    "Is_Alive" -> "athlete_is_alive",
    "Born_City" -> "athlete_born_city",
    "Born_Region" -> "athlete_born_region",
    "Born_Country" -> "athlete_born_country",
    "Height_Imputed" -> "athlete_is_height_imputed",
    "Weight_Imputed" -> "athlete_is_weight_imputed",
    "Born_Country_From_NOC" -> "athlete_is_born_country_from_NOC")

  val dimAffiliations: Seq[(String, String)] = Seq(
    "Affiliation_Id" -> "affiliation_id",
    "Affiliation_Club" -> "dim_affiliation_club",
    "Affiliation_City" -> "dim_affiliation_city",
    "Affiliation_Country" -> "dim_affiliation_country")

  val bridgeAthletesAffiliations: Seq[(String, String)] = Seq(
    "Athlete_Id" -> "athlete_id",
    "Affiliation_Id" -> "affiliation_id")

  val dimGames: Seq[(String, String)] = Seq(
    "Game_Id" -> "game_id",
    "Game_Type" -> "dim_game_type",
    "Edition_Name" -> "dim_edition_name",
    "Year" -> "dim_game_year",
    "City" -> "dim_city",
    "Country" -> "dim_country",
    "Opened" -> "dim_opened",
    "Closed" -> "dim_closed",
    "Competition_Start" -> "dim_competition_start",
    "Competition_End" -> "dim_competition_end",
    "Comments" -> "dim_comments",
    "Opened_Imputed" -> "dim_opened_imputed",
    "Closed_Imputed" -> "dim_closed_imputed")

  val fctResults: Seq[(String, String)] = Seq(
    "Athlete_Id" -> "athlete_id",
    "NOC" -> "dim_noc",
    "Discipline" -> "dim_discipline",
    "Game Type" -> "dim_game_type",
    "Game Year" -> "dim_game_year",
    "Event" -> "dim_event_name",
    "Team" -> "dim_team_name",
    "As" -> "dim_as",
    "Tied" -> "m_tied_flag",
    "Position" -> "m_position",
    "Medal" -> "m_medal")

  /** Full gold build from the silver frames. */
  def goldTables(bios: DataFrame, results: DataFrame, editions: DataFrame,
                 dimAffiliation: DataFrame, bridge: DataFrame): Map[String, DataFrame] = Map(
    "dim_athletes" -> renameAndReorder(bios, dimAthletes),
    "dim_affiliations" -> renameAndReorder(dimAffiliation, dimAffiliations),
    "bridge_athletes_affiliations" -> renameAndReorder(bridge, bridgeAthletesAffiliations),
    "dim_games" -> renameAndReorder(editions, dimGames),
    "fct_results" -> renameAndReorder(results, fctResults))
}
