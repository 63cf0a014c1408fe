package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SURVEY.md §2.8 scalar functions, incl. the §2.13 parity decisions:
  * null-on-no-match (not ""), year-only dates kept, substring strip.
  */
class CleanFunctionsSpec extends SparkSpec {
  import CleanFunctions._

  private def evalOne(in: String, f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Any = {
    val df = spark.createDataFrame(Seq(Tuple1(in))).toDF("v")
    df.select(f(col("v")).as("r")).collect()(0).get(0)
  }

  test("regexpExtractNull yields NULL on no-match, not empty string (§2.13.5)") {
    assert(evalOne("DNS", c => positionNumber(c)) == null)
    assert(evalOne("=41", c => positionNumber(c)) == 41)
  }

  test("measurements parse: both, height-only, weight-only (F2/F3)") {
    assert(evalOne("180 cm / 75 kg", heightCm) == 180.0)
    assert(evalOne("180 cm / 75 kg", weightKg) == 75.0)
    assert(evalOne("180 cm", heightCm) == 180.0)
    assert(evalOne("180 cm", weightKg) == null)
    assert(evalOne("75 kg", weightKg) == 75.0)
    assert(evalOne("75 kg", heightCm) == null)
  }

  test("date fragment + mixed parse keeps year-only (D1, §2.13.6)") {
    assert(evalOne("16 December 1994", c => parseMixedDate(extractDateFragment(c))).toString == "1994-12-16")
    assert(evalOne("1994", c => parseMixedDate(extractDateFragment(c))).toString == "1994-01-01")
    assert(evalOne("(born 5 May 1980 in X)", c => extractDateFragment(c)) == "5 May 1980")
    assert(evalOne("garbage", c => parseMixedDate(extractDateFragment(c))) == null)
  }

  test("location extraction 3 groups with accents (F5)") {
    val in = "in São Paulo, São Paulo (BRA)"
    assert(evalOne(in, locCity) == "São Paulo")
    assert(evalOne(in, locCountry) == "BRA")
    assert(evalOne("no match here", locCity) == null)
  }

  test("affiliation optional groups (F6)") {
    assert(evalOne("Sparta, Praha (TCH)", affClub) == "Sparta")
    assert(evalOne("Sparta, Praha (TCH)", affCity) == "Praha")
    assert(evalOne("Sparta, Praha (TCH)", affCountry) == "TCH")
    assert(evalOne("Sparta", affClub) == "Sparta")
    assert(evalOne("Sparta", affCity) == null)
  }

  test("game year/type split (F7)") {
    assert(evalOne("1988 Summer Olympics", gameYear) == 1988)
    assert(evalOne("1988 Summer Olympics", gameType) == "Summer Olympics")
  }

  test("tied flag three-valued semantics (F9)") {
    assert(evalOne("=41", tiedFlag) == true)
    assert(evalOne("41", tiedFlag) == false)
    assert(evalOne(null.asInstanceOf[String], tiedFlag) == null)
  }

  test("paren code promotion (F10)") {
    assert(evalOne("(USA)", parenCode) == "USA")
    assert(evalOne("Boston (USA)", parenCode) == null)
  }

  test("substring strip is not charset strip (F3, §2.13.7)") {
    // pandas str.strip(' cm') would eat trailing 'c'/'m' chars; substring
    // semantics must not: "mc180 cm" keeps its leading chars.
    assert(evalOne("mc180 cm", c => stripSubstring(c, " cm")) == "mc180")
  }

  test("name / roles cleanup (F1)") {
    assert(evalOne("Jim•Bob", cleanName) == "Jim Bob")
    // em-dash removed (leaves its surrounding spaces), bullet becomes the
    // list separator — mirrors pandas replace('—','') + replace(' • ',',')
    assert(evalOne("Athlete — runner • jumper", cleanRoles) == "Athlete  runner,jumper")
  }

  test("competition half extraction attaches year to full halves (F12)") {
    import org.apache.spark.sql.functions.lit
    assert(evalOne("6 April - 13 April", c => competitionHalf(c, lit(1900), 0)) == "6 April 1900")
    assert(evalOne("6 April - 13 April", c => competitionHalf(c, lit(1900), 1)) == "13 April 1900")
    // en-dash input normalizes first
    assert(evalOne("6 April – 13 April", c => competitionHalf(c, lit(1900), 1)) == "13 April 1900")
  }

  test("BMI expression (M1)") {
    assert(evalOne("x", _ => bmi(lit(75.0), lit(180.0))) == 75.0 / math.pow(1.8, 2))
  }
}
