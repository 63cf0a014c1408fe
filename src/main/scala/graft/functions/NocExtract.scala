package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.udf

/** F13 — the reference's one genuinely stateful scalar: NOC / country-name
  * normalization (reference pandas_based/src/data_clean.py:172-256; the Glue
  * UDF variant data_clean_glue.py:199-284 is disabled in its pipeline, so
  * pandas semantics are the spec per SURVEY §2.13.8).
  *
  * Semantics: lowercase/trim → substitute legacy/historical country names →
  * normalize `[/,;]` and the word "and" to spaces → scan for valid country
  * names longest-first as whole words (consuming matches so substrings don't
  * double-count) → emit the sorted, comma-joined set; if nothing matched,
  * pass through the whitespace-collapsed lowercased original.
  *
  * This is a Scala UDF over a broadcast country list — one pass over short
  * strings; per SURVEY §4.3 a codegen Expression is not worth it unless BENCH
  * shows it hot. The broadcast keeps the (tiny, bounded) lookup off the
  * closure-serialization hot path at 1000 executors.
  */
object NocExtract {

  /** Historical country names → current equivalents (reference
    * data_clean.py:184-219 — data mapping, i.e. WHAT to compute).
    */
  val legacyMap: Seq[(String, String)] = Seq(
    "west germany" -> "germany",
    "east germany" -> "germany",
    "germany west germany" -> "germany",
    "germany saar" -> "germany",
    "german democratic republic" -> "germany",
    "saar" -> "germany",
    "soviet union" -> "russian federation",
    "ussr" -> "russian federation",
    "unified team" -> "russian federation",
    "czechoslovakia" -> "czechia",
    "bohemia" -> "czechia",
    "yugoslavia" -> "serbia",
    "serbia and montenegro" -> "serbia",
    "rhodesia" -> "zimbabwe",
    "malaya" -> "malaysia",
    "north yemen" -> "yemen",
    "south yemen" -> "yemen",
    "burma" -> "myanmar",
    "peoples republic of china" -> "china",
    "republic of korea" -> "south korea",
    "korea team" -> "south korea",
    "democratic people's republic of korea" -> "north korea",
    "islamic republic of iran" -> "iran",
    "kingdom of saudi arabia" -> "saudi arabia",
    "united arab republic" -> "egypt",
    "republic of moldova" -> "moldova",
    "roc" -> "russian federation",
    "great britain" -> "united kingdom",
    "the bahamas" -> "bahamas",
    "hong kong, china" -> "hong kong",
    "taiwan" -> "chinese taipei",
    "viet nam" -> "vietnam")

  /** Pure scalar implementation (unit-testable without Spark). */
  def extract(nocStr: String, validCountriesLongestFirst: Seq[String]): String = {
    if (nocStr == null) return ""
    var s = nocStr.toLowerCase.trim
    legacyMap.foreach { case (old, nw) => if (s.contains(old)) s = s.replace(old, nw) }
    s = s.replaceAll("[/,;]", " ").replaceAll("\\band\\b", " ").replaceAll("\\s+", " ").trim
    val found = scala.collection.mutable.SortedSet.empty[String]
    validCountriesLongestFirst.foreach { country =>
      val p = java.util.regex.Pattern.compile(
        "(?<!\\w)" + java.util.regex.Pattern.quote(country) + "(?!\\w)")
      val m = p.matcher(s)
      if (m.find()) {
        found += country
        s = m.replaceAll(" ")
      }
    }
    if (found.isEmpty) nocStr.toLowerCase.trim.replaceAll("\\s+", " ")
    else found.mkString(",")
  }

  /** Column builder: `nocCountries(bcCountries)($"NOC")`. */
  def nocCountries(spark: SparkSession, validCountries: Seq[String]): Column => Column = {
    val prepared = validCountries.map(_.toLowerCase.trim).distinct.sortBy(-_.length)
    val bc: Broadcast[Seq[String]] = spark.sparkContext.broadcast(prepared)
    val f = udf((s: String) => extract(s, bc.value))
    (c: Column) => f(c)
  }
}
