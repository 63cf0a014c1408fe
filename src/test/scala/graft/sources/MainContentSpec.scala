package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MainContentSpec extends SparkSpec {

  // ---- hand-labeled fixture: a full page with every chrome class ----
  private val article =
    """<html><head><title>ignored</title>
      |<script>var fake = "<p>not content</p>";</script>
      |<style>.x { color: red }</style></head>
      |<body>
      |<!-- build 1234 -->
      |<nav><ul><li><a href="/">Home</a></li><li><a href="/news">News</a></li></ul></nav>
      |<div class="sidebar"><div class="promo"><a href="/sub">Subscribe now</a></div>
      |  <a href="/trend">Trending</a></div>
      |<article>
      |<h1>The Expedition</h1>
      |<p>The expedition reached the base camp after nine days of steady
      |climbing through the lower valleys.</p>
      |<p>Supplies were running low, but morale stayed high as the weather
      |window finally opened over the ridge.</p>
      |<p>Short note.</p>
      |</article>
      |<div class="ad-banner">Buy one get one <a href="/deal">free</a></div>
      |<footer><p>Copyright Example Corp - <a href="/terms">Terms</a>
      |<a href="/privacy">Privacy</a></p></footer>
      |</body></html>""".stripMargin

  test("keeps the article paragraphs and their heading; drops nav/sidebar/ad/footer/script") {
    val e = MainContent.extract(article)
    assert(e.mainText ==
      "The Expedition\n" +
        "The expedition reached the base camp after nine days of steady " +
        "climbing through the lower valleys.\n" +
        "Supplies were running low, but morale stayed high as the weather " +
        "window finally opened over the ridge.")
    // blocks seen: h1 + 3 paragraphs ("Short note." dropped by minChars)
    assert(e.nBlocksTotal == 4 && e.nBlocksKept == 3, e)
  }

  test("nested boilerplate subtrees stay pruned (div inside div.sidebar)") {
    val bs = MainContent.blocks(article)
    assert(!bs.exists(_.text.contains("Subscribe")),
      s"nested promo div leaked out of the pruned sidebar: $bs")
    assert(!bs.exists(_.text.contains("Trending")))
  }

  test("link-dense block drops even when long enough") {
    val html =
      """<body><p>This paragraph carries enough plain words to pass the
        |length floor of the classifier easily.</p>
        |<p><a href="/a">First related story headline</a> -
        |<a href="/b">Second related story headline</a> -
        |<a href="/c">Third related story headline</a> also</p></body>""".stripMargin
    val e = MainContent.extract(html)
    assert(e.mainText.startsWith("This paragraph"))
    assert(!e.mainText.contains("related story"),
      s"link farm survived: ${e.mainText}")
    assert(e.nBlocksTotal == 2 && e.nBlocksKept == 1)
  }

  test("a heading is kept only when its section kept content") {
    val html =
      """<body><h2>Orphan heading</h2>
        |<p><a href="/x">only a link farm under this heading xxxx</a></p>
        |<h2>Real heading</h2>
        |<p>Genuine content follows this one with comfortably enough text
        |to clear the minimum length floor.</p></body>""".stripMargin
    val e = MainContent.extract(html)
    assert(!e.mainText.contains("Orphan"))
    assert(e.mainText.startsWith("Real heading\nGenuine content"))
  }

  test("class lexicon matches words, not substrings (admiral is not an ad)") {
    val html =
      """<body><div class="admiral-story"><p>The admiral's flagship entered
        |the harbor at dawn with every signal flag flying.</p></div>
        |<div class="story ad"><p>This block is a labeled advertisement and
        |must be pruned despite its length being over the floor.</p></div>
        |</body>""".stripMargin
    val e = MainContent.extract(html)
    assert(e.mainText.contains("admiral's flagship"))
    assert(!e.mainText.contains("labeled advertisement"))
  }

  test("entities decode and whitespace collapses (the HtmlIngest.cellText rules)") {
    val html = "<body><p>Fish &amp; chips &lt;daily&gt;   at   the&nbsp;corner, " +
      "every single weekday morning.</p></body>"
    val e = MainContent.extract(html)
    assert(e.mainText ==
      "Fish & chips <daily> at the corner, every single weekday morning.")
  }

  test("null / empty / chrome-only pages extract to empty") {
    assert(MainContent.extract(null) == MainContent.Extraction("", 0, 0, ""))
    assert(MainContent.extract("") == MainContent.Extraction("", 0, 0, ""))
    val chrome = "<body><nav><a href='/'>Home</a></nav><footer>legal</footer></body>"
    assert(MainContent.extract(chrome).mainText == "")
  }

  test("the title survives as metadata while the rest of the head is chrome") {
    val e = MainContent.extract(article)
    assert(e.title == "ignored") // the fixture's <title>
    assert(!e.mainText.contains("ignored"))
    assert(MainContent.title("<head><title> Fish &amp;  Chips </title></head>")
      == "Fish & Chips")
    assert(MainContent.title("<body>no head</body>") == "")
  }

  test("DataFrame op is map-side only (no shuffle in the plan)") {
    import spark.implicits._
    val df = Seq((1, article), (2, "<body><p>tiny</p></body>")).toDF("id", "html")
    val out = MainContent.withMainContent(df, "html")
    val got = out.select("id", "n_blocks_kept").as[(Int, Int)].collect().toMap
    assert(got == Map(1 -> 3, 2 -> 0))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"main-content extraction must not shuffle:\n$plan")
  }
}
