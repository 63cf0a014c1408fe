package graft.sources

import graft.SparkSpec
import graft.pipeline.OlympicSchemas

class HtmlIngestSpec extends SparkSpec {

  // invented fixture, shaped like the reference pages: a biodata
  // key/value table and a results grid with meta rows + an unnamed
  // header column
  private val page: String =
    """<html><body>
      |<table class="biodata"><tbody>
      |<tr><th>Roles</th><td>Competed in Olympic Games</td></tr>
      |<tr><th>Sex</th><td>Female</td></tr>
      |<tr><th>Full name</th><td>Anna Maria <b>Example</b>&nbsp;Person</td></tr>
      |<tr><th>Used name</th><td>Anna Example</td></tr>
      |<tr><th>Born</th><td>12 March 1970 in Sampletown (SMP)</td></tr>
      |<tr><th>NOC</th><td><a href="/x">Sampleland</a></td></tr>
      |</tbody></table>
      |<table class="table">
      |<tr><th>Games</th><th>Discipline (Sport) / Event</th><th>NOC / Team</th><th>Pos</th><th>Medal</th><th>As</th><th></th></tr>
      |<tr><td>1992 Summer</td><td>Swimming</td><td>SMP</td><td></td><td></td><td>Anna Example</td><td></td></tr>
      |<tr><td></td><td>100 m freestyle</td><td>Sample Club</td><td>4</td><td></td><td></td><td></td></tr>
      |<tr><td></td><td>200 m freestyle</td><td>Sample Club</td><td>2</td><td>Silver</td><td></td><td></td></tr>
      |<tr><td>1996 Summer</td><td>Swimming</td><td>SMP</td><td></td><td></td><td></td><td></td></tr>
      |<tr><td></td><td>100 m freestyle</td><td></td><td>7</td><td></td><td></td><td></td></tr>
      |</table>
      |</body></html>""".stripMargin

  test("tables: class detection, th header split, markup/entity-stripped cells") {
    val ts = HtmlIngest.tables(page)
    assert(ts.map(_.tableClass) == Vector("biodata", "table"))
    assert(ts(0).header.isEmpty && ts(0).rows.length == 6)
    assert(ts(0).rows(2) == Vector("Full name", "Anna Maria Example Person"))
    assert(ts(1).header.contains(Vector("Games", "Discipline (Sport) / Event",
      "NOC / Team", "Pos", "Medal", "As", "")))
  }

  test("biodataRow transposes key/value rows into the pinned bronze schema") {
    val row = HtmlIngest.biodataRow(page, 42).get
    val df = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](java.util.List.of(row)),
      OlympicSchemas.biodata)
    assert(df.schema == OlympicSchemas.biodata)
    val r = df.collect()(0)
    assert(r.getAs[Int]("Athlete_Id") == 42)
    assert(r.getAs[String]("Sex") == "Female")
    assert(r.getAs[String]("Born") == "12 March 1970 in Sampletown (SMP)")
    assert(r.getAs[String]("NOC") == "Sampleland")
    assert(r.getAs[String]("Died") == null, "missing biodata keys must be null")
    assert(HtmlIngest.biodataRow("<html><p>no tables</p></html>", 1).isEmpty)
  }

  test("resultsRows: meta rows dropped, Games/NOC/Discipline/As forward-filled") {
    val rows = HtmlIngest.resultsRows(page, 42)
    assert(rows.length == 3, "2 meta rows dropped, 3 event rows kept")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), OlympicSchemas.results)
    assert(df.schema == OlympicSchemas.results)
    val got = df.collect().map(r => (r.getAs[String]("Games"), r.getAs[String]("NOC"),
      r.getAs[String]("Discipline"), r.getAs[String]("As"), r.getAs[String]("Event"),
      r.getAs[String]("Team"), r.getAs[String]("Pos"), r.getAs[String]("Medal")))
    assert(got(0) == ("1992 Summer", "SMP", "Swimming", "Anna Example",
      "100 m freestyle", "Sample Club", "4", null))
    assert(got(1) == ("1992 Summer", "SMP", "Swimming", "Anna Example",
      "200 m freestyle", "Sample Club", "2", "Silver"))
    // second meta row: Games updates; As has no new value → still carried
    assert(got(2) == ("1996 Summer", "SMP", "Swimming", "Anna Example",
      "100 m freestyle", null, "7", null))
    assert(HtmlIngest.resultsRows("<html></html>", 1).isEmpty)
  }

  test("parseBronze: distributed parse lands both bronze frames, map-side only") {
    import spark.implicits._
    val pages = Seq((42, page), (43, "<html><p>broken page</p></html>"))
      .toDF("athlete_id", "html")
    val (bio, res) = HtmlIngest.parseBronze(pages, "athlete_id", "html")
    assert(bio.schema == OlympicSchemas.biodata)
    assert(res.schema == OlympicSchemas.results)
    assert(bio.count() == 1, "page without a biodata table is dropped, not fatal")
    assert(res.count() == 3)
  }

  test("ingest with a pluggable fetcher + checkpoint resume via Tables.remaining") {
    import spark.implicits._
    val all = (40 to 44).toDF("athlete_id")
    val done = Seq(40, 41, 44).toDF("athlete_id")
    val todo = Tables.remaining(all, done, "athlete_id")
    assert(todo.collect().map(_.getInt(0)).sorted.toSeq == Seq(42, 43))
    // deterministic fake fetcher — the sandbox has no egress; the real
    // fetcher is the caller's (serializable) HTTP client. Local copy of
    // the fixture so the closure doesn't capture the (non-serializable)
    // suite instance.
    val localPage = page
    val (bio, _) = HtmlIngest.ingest(todo, "athlete_id",
      id => if (id == 42) localPage else "<html></html>")
    val ids = bio.select("Athlete_Id").collect().map(_.getInt(0)).toSeq
    assert(ids == Seq(42))
  }
}
