package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** F13 NOC extraction — pure-function tests (pandas semantics are the spec
  * per SURVEY.md §2.13.8).
  */
class NocExtractSpec extends AnyFunSuite {
  private val countries = Seq(
    "germany", "france", "united kingdom", "russian federation", "united states",
    "south korea", "north korea", "korea").map(_.toLowerCase).sortBy(-_.length)

  test("single country passes through") {
    assert(NocExtract.extract("France", countries) == "france")
  }

  test("legacy names map to modern (west germany → germany)") {
    assert(NocExtract.extract("West Germany", countries) == "germany")
    assert(NocExtract.extract("Soviet Union", countries) == "russian federation")
  }

  test("multi-country separator normalization + sorted join") {
    assert(NocExtract.extract("France / Germany", countries) == "france,germany")
    assert(NocExtract.extract("Germany and France", countries) == "france,germany")
  }

  test("longest-first whole-word scan: 'south korea' not double-counted as 'korea'") {
    assert(NocExtract.extract("South Korea", countries) == "south korea")
  }

  test("no-match passthrough is cleaned lowercase original") {
    assert(NocExtract.extract("Atlantis", countries) == "atlantis")
  }

  test("null → empty string") {
    assert(NocExtract.extract(null, countries) == "")
  }

  test("duplicate mentions collapse to a set") {
    assert(NocExtract.extract("France, France", countries) == "france")
  }
}
