package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.pipeline.OlympicSchemas

/** S3/S4: HTML-table ingest — the athlete-page scrape stage of the
  * reference (athlete_scrape_glue.py:64-150: bs4 + `pd.read_html` finds
  * the `biodata` key/value table and transposes it to one row, and
  * reshapes the `table` results grid), re-expressed as a distributed
  * parse over an (id, html) frame that lands the SAME pinned bronze
  * schemas ([[graft.pipeline.OlympicSchemas]]).
  *
  * The HTTP fetch itself stays out of the engine (the sandbox has no
  * egress, and fetching is an IO concern the caller owns) — ingest
  * accepts either pre-fetched pages or a pluggable `fetch` function run
  * one-per-partition (the per-partition `requests.Session()` pattern of
  * scrape_partition, athlete_scrape_glue.py:155-200). Resume composes
  * with [[Tables.remaining]]/[[Tables.latestCheckpoint]] (S9/J5) exactly
  * like the parquet scrape checkpoints.
  *
  * The parser is a deliberately small tag scanner, not a general HTML
  * parser: the reference pages carry well-formed, non-nested `<table>`
  * markup, and that's the contract ([[HtmlIngest.tables]]). No external
  * parser dependency exists in this environment.
  */
object HtmlIngest {

  /** One parsed `<table>`: its class attribute, an optional header (the
    * first row if it is all-`<th>`), and the body rows' cell texts.
    */
  final case class HtmlTable(tableClass: String,
                             header: Option[Vector[String]],
                             rows: Vector[Vector[String]])

  private val TableRe = "(?is)<table\\b([^>]*)>(.*?)</table>".r
  private val RowRe = "(?is)<tr\\b[^>]*>(.*?)</tr>".r
  private val CellRe = "(?is)<(t[dh])\\b[^>]*>(.*?)</t[dh]>".r
  private val ClassRe = "(?is)class\\s*=\\s*[\"']([^\"']*)[\"']".r
  private val TagRe = "(?s)<[^>]*>".r

  /** Cell text: strip inner markup, decode the entities that occur in
    * the reference pages, collapse whitespace (what `pd.read_html` does
    * to cell contents).
    */
  private def cellText(raw: String): String =
    TagRe.replaceAllIn(raw, " ")
      .replace("&nbsp;", " ").replace("&amp;", "&")
      .replace("&lt;", "<").replace("&gt;", ">")
      .replace("&#39;", "'").replace("&quot;", "\"")
      .replaceAll("\\s+", " ").trim

  /** All tables in a document, in order (null/empty input → none). */
  def tables(html: String): Vector[HtmlTable] =
    TableRe.findAllMatchIn(if (html == null) "" else html).map { tm =>
      val cls = ClassRe.findFirstMatchIn(tm.group(1)).map(_.group(1)).getOrElse("")
      val parsed = RowRe.findAllMatchIn(tm.group(2)).map { rm =>
        val cells = CellRe.findAllMatchIn(rm.group(1)).map(cm =>
          (cm.group(1).equalsIgnoreCase("th"), cellText(cm.group(2)))).toVector
        (cells.nonEmpty && cells.forall(_._1), cells.map(_._2))
      }.toVector
      parsed match {
        case (true, hdr) +: body => HtmlTable(cls, Some(hdr), body.map(_._2))
        case body                => HtmlTable(cls, None, body.map(_._2))
      }
    }.toVector

  /** First table whose class attribute contains `cls` as a word. */
  def tableWithClass(html: String, cls: String): Option[HtmlTable] =
    tables(html).find(_.tableClass.split("\\s+").contains(cls))

  private def opt(s: String): String = if (s == null || s.isEmpty) null else s

  /** S4 transpose scan: the `biodata` table is key/value ROWS; pandas
    * reads it with `index_col=0` and transposes so keys become COLUMNS
    * (biodata_from_soup, athlete_scrape_glue.py:64-77). Missing keys are
    * null; the output Row matches [[OlympicSchemas.biodata]] positionally.
    */
  def biodataRow(html: String, athleteId: Int): Option[Row] =
    tableWithClass(html, "biodata").map { t =>
      val kv = t.rows.collect { case Vector(k, v, _*) => k -> opt(v) }.toMap
      Row.fromSeq(athleteId +: OlympicSchemas.biodata.fields.tail.map(f =>
        kv.getOrElse(f.name, null)).toSeq)
    }

  /** The results grid (class `table`): meta rows (Games non-empty) carry
    * Games/NOC/Discipline/As for the event rows beneath them; pandas
    * renames `NOC / Team`→Team and `Discipline (Sport) / Event`→Event,
    * forward-fills the meta columns, and drops the meta rows
    * (results_from_soup, athlete_scrape_glue.py:79-110). Unnamed headers
    * get pandas' `Unnamed: i` names; `Unnamed: 6` is dropped. Output
    * Rows match [[OlympicSchemas.results]] positionally; no results
    * table → no rows (same as the reference's empty list).
    */
  def resultsRows(html: String, athleteId: Int): Seq[Row] =
    tableWithClass(html, "table") match {
      case None => Seq.empty
      case Some(t) =>
        val names = t.header.getOrElse(Vector.empty).zipWithIndex
          .map { case (h, i) => if (h.isEmpty) s"Unnamed: $i" else h }
        val recs = t.rows.map(r =>
          names.indices.map(i => names(i) -> opt(r.lift(i).getOrElse(""))).toMap)
        // pandas ffill semantics: a carried value updates on ANY non-null
        // occurrence in its column (meta or event row) and never resets
        // to null — nulls always inherit the latest non-null above
        var games, noc, disc, as: String = null
        def nn(v: String)(set: String => Unit): Unit = if (v != null) set(v)
        val out = Vector.newBuilder[Row]
        recs.foreach { rec =>
          val isMeta = rec.getOrElse("Games", null) != null
          nn(rec.getOrElse("As", null))(as = _)
          if (isMeta) {
            games = rec("Games")
            nn(rec.getOrElse("NOC / Team", null))(noc = _)
            nn(rec.getOrElse("Discipline (Sport) / Event", null))(disc = _)
          } else {
            out += Row(athleteId, games, noc, disc, as,
              rec.getOrElse("Discipline (Sport) / Event", null), // Event
              rec.getOrElse("NOC / Team", null),                 // Team
              rec.getOrElse("Pos", null), rec.getOrElse("Medal", null),
              rec.getOrElse("Nationality", null), rec.getOrElse("Unnamed: 7", null))
          }
        }
        out.result()
    }

  /** Distributed parse of pre-fetched pages → (biodata, results) bronze
    * frames. Pages with no biodata table are dropped from biodata (the
    * reference raises and retries those; a batch parse must not abort the
    * partition). The parse is map-side only — no shuffle; writing the
    * two outputs re-reads `pages` unless the caller persists it.
    */
  def parseBronze(pages: DataFrame, idCol: String, htmlCol: String): (DataFrame, DataFrame) = {
    val spark = pages.sparkSession
    val src = pages.select(col(idCol).cast("int"), col(htmlCol))
    val bio = spark.createDataFrame(
      src.rdd.mapPartitions(_.flatMap(r => biodataRow(r.getString(1), r.getInt(0)))),
      OlympicSchemas.biodata)
    val res = spark.createDataFrame(
      src.rdd.mapPartitions(_.flatMap(r => resultsRows(r.getString(1), r.getInt(0)))),
      OlympicSchemas.results)
    (bio, res)
  }

  /** Fetch + parse with a pluggable page fetcher, one fetcher instance
    * per partition (the reference's per-partition `requests.Session()`,
    * athlete_scrape_glue.py:155-165). `fetch` must be serializable and is
    * created lazily on executors; pair with [[Tables.remaining]] against
    * already-landed bronze ids for idempotent resume (S9/J5).
    */
  def ingest(ids: DataFrame, idCol: String, fetch: Int => String): (DataFrame, DataFrame) = {
    val spark = ids.sparkSession
    import spark.implicits._
    val pages = ids.select(col(idCol).cast("int")).as[Int]
      .mapPartitions { it => it.map(id => (id, fetch(id))) }
      .toDF(idCol, "html")
    parseBronze(pages, idCol, "html")
  }
}
