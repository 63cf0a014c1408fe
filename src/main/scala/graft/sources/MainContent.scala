package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Readability-style main-content extraction (boilerplate removal) —
  * the first operator of every crawl-ingest pipeline: strip the
  * nav/sidebar/footer/ad chrome from an HTML page and keep the article
  * text, BEFORE any of the text operators (language-ID, quality,
  * dedup, tokenization) run.
  *
  * The classification is the published block-level heuristic family
  * (Kohlschütter et al., "Boilerplate Detection using Shallow Text
  * Features", WSDM '10; Pomikálek's jusText; Arc90 Readability):
  *
  *  1. PRUNE whole subtrees that are boilerplate by construction:
  *     `<script> <style> <noscript> <template> <head>` plus comments
  *     are removed textually; `<nav> <footer> <aside> <form>` and any
  *     element whose class/id matches the boilerplate lexicon
  *     (nav, menu, footer, sidebar, comment, banner, ad/ads/advert,
  *     social, share, breadcrumb, promo, cookie, popup, related,
  *     subscribe) are removed by a depth-tracking tag scan — a nested
  *     `<div>` inside a pruned `<div class="sidebar">` stays pruned
  *     (the scanner keeps an open-tag stack, not a non-greedy regex).
  *  2. SEGMENT the remaining text into blocks at block-level tags
  *     (p, div, h1–h6, li, td, pre, blockquote, article, section,
  *     main, table/tr, ul/ol, br).
  *  3. CLASSIFY each block: KEEP iff its collapsed text is at least
  *     `minChars` long AND its link density (characters inside `<a>`
  *     over total characters) is at most `maxLinkDensity` — the two
  *     shallow features WSDM '10 found dominate full DOM features.
  *     A heading block (h1–h6) bypasses the length rule and is kept
  *     iff the next kept block before the following heading is
  *     content (headings belong to the section they title).
  *  4. EMIT kept blocks joined by '\n' plus the block counts, so a
  *     pipeline can audit how much chrome each host injects.
  *
  * Scale: pure map-side per-row work (one linear scan per page, no
  * shuffle, no driver state) — compose with any downstream text
  * operator. The reference's ingest parses these same pages for their
  * `<table>`s ([[HtmlIngest]], mirroring athlete_scrape.py:110-158);
  * this operator is the text-pipeline sibling over the same scanner
  * contract (well-formed tags; entity decode and whitespace collapse
  * follow HtmlIngest.cellText).
  */
object MainContent {

  /** One segmented block, pre-classification (exposed for the spec). */
  final case class Block(tag: String, text: String, linkChars: Int)

  /** Extraction result: article text + audit counts + the page title
    * (the one `<head>` element a text pipeline KEEPS as metadata while
    * the rest of the head is chrome).
    */
  final case class Extraction(mainText: String, nBlocksTotal: Int,
                              nBlocksKept: Int, title: String)

  private val TitleRe = "(?is)<title[^>]*>(.*?)</title>".r

  /** The page title, entity-decoded and whitespace-collapsed; "" when
    * absent (titles live inside `<head>`, which [[blocks]] strips, so
    * this reads the raw page before the strip).
    */
  def title(html: String): String =
    if (html == null) ""
    else TitleRe.findFirstMatchIn(html).map(m => collapse(m.group(1))).getOrElse("")

  private val StripRe =
    "(?is)<!--.*?-->|<script\\b[^>]*>.*?</script>|<style\\b[^>]*>.*?</style>|<noscript\\b[^>]*>.*?</noscript>|<template\\b[^>]*>.*?</template>|<head\\b[^>]*>.*?</head>".r
  private val TagRe = "(?s)<(/?)([a-zA-Z][a-zA-Z0-9]*)([^>]*)>".r
  private val ClassIdRe =
    "(?is)(?:class|id)\\s*=\\s*[\"']([^\"']*)[\"']".r

  /** Semantic tags whose whole subtree is boilerplate. */
  private val pruneTags = Set("nav", "footer", "aside", "form")

  /** The class/id boilerplate lexicon (word-boundary match, so
    * "admiral" does not match "ad" but "ad-banner" does).
    */
  private val pruneWord =
    ("(?i)(?:^|[^a-z0-9])(?:nav|menu|footer|sidebar|comment|comments|banner|" +
      "ad|ads|advert|advertisement|social|share|breadcrumb|breadcrumbs|promo|" +
      "cookie|popup|related|subscribe)(?:$|[^a-z0-9])").r

  private val blockTags = Set("p", "div", "h1", "h2", "h3", "h4", "h5", "h6",
    "li", "ul", "ol", "td", "tr", "table", "pre", "blockquote", "article",
    "section", "main", "br", "body", "header", "figure", "figcaption")

  private val headingTags = Set("h1", "h2", "h3", "h4", "h5", "h6")

  /** Self-closing / void elements that never go on the open stack. */
  private val voidTags = Set("br", "hr", "img", "input", "meta", "link",
    "area", "base", "col", "embed", "source", "track", "wbr")

  private def isBoilerplate(tag: String, attrs: String): Boolean =
    pruneTags.contains(tag) ||
      ClassIdRe.findAllMatchIn(attrs).exists(m =>
        pruneWord.findFirstIn(m.group(1)).isDefined)

  /** Entity decode + whitespace collapse — HtmlIngest.cellText's rules. */
  private def collapse(raw: String): String =
    raw.replace("&nbsp;", " ").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&#39;", "'").replace("&quot;", "\"").replace("&amp;", "&")
      .replaceAll("\\s+", " ").trim

  /** Segment a page into classified-ready blocks: prune subtrees, track
    * link depth, split at block tags. Null/empty → no blocks.
    */
  def blocks(html: String): Vector[Block] = {
    if (html == null || html.isEmpty) return Vector.empty
    val src = StripRe.replaceAllIn(html, " ")
    val out = Vector.newBuilder[Block]
    val text = new StringBuilder
    var linkChars = 0
    var curTag = "body"
    var aDepth = 0
    // open-tag stack; pruneAt = stack depth at which pruning began
    var stack = List.empty[String]
    var pruneAt = -1
    def pruning = pruneAt >= 0
    def flush(nextTag: String): Unit = {
      val t = collapse(text.toString)
      // linkChars counted on raw text; scale by collapse is unnecessary
      // for the density test — collapse removes only whitespace, which
      // regular text and link text shed proportionally enough for a
      // 1/3 threshold (the WSDM '10 feature is this coarse by design)
      if (t.nonEmpty) out += Block(curTag, t, linkChars)
      text.clear(); linkChars = 0; curTag = nextTag
    }
    var last = 0
    for (m <- TagRe.findAllMatchIn(src)) {
      val chunk = src.substring(last, m.start)
      last = m.end
      if (!pruning && chunk.nonEmpty) {
        text.append(chunk)
        if (aDepth > 0) linkChars += collapse(chunk).length
      }
      val closing = m.group(1) == "/"
      val tag = m.group(2).toLowerCase
      val attrs = m.group(3)
      val selfClosed = voidTags.contains(tag) || attrs.trim.endsWith("/")
      if (!closing && !selfClosed) {
        stack = tag :: stack
        if (!pruning && isBoilerplate(tag, attrs)) pruneAt = stack.length
        if (!pruning && tag == "a") aDepth += 1
      } else if (closing) {
        // pop to the matching open tag (tolerates simple malformation)
        val i = stack.indexOf(tag)
        if (i >= 0) {
          stack = stack.drop(i + 1)
          if (pruning && stack.length < pruneAt) pruneAt = -1
          // a pruned <a> never bumped aDepth, so only decrement outside
          if (!pruning && tag == "a" && aDepth > 0) aDepth -= 1
        }
      }
      if (!pruning && blockTags.contains(tag)) flush(tag)
    }
    if (!pruning && last < src.length) text.append(src.substring(last))
    flush(curTag)
    out.result()
  }

  /** Classify + join: the extraction itself. */
  def extract(html: String, minChars: Int = 25,
              maxLinkDensity: Double = 1.0 / 3): Extraction = {
    val bs = blocks(html)
    val contentKept = bs.map { b =>
      !headingTags.contains(b.tag) &&
        b.text.length >= minChars &&
        (b.text.isEmpty || b.linkChars.toDouble / b.text.length <= maxLinkDensity)
    }
    // a heading is kept iff the next block decided before the following
    // heading is kept content (scan right-to-left carrying that flag)
    val kept = new Array[Boolean](bs.length)
    var nextContentKept = false
    for (i <- bs.indices.reverse) {
      if (headingTags.contains(bs(i).tag)) {
        kept(i) = nextContentKept
        nextContentKept = false // a heading shields the one above it
      } else {
        kept(i) = contentKept(i)
        if (kept(i)) nextContentKept = true
        else if (bs(i).text.nonEmpty) nextContentKept = false
      }
    }
    val keptBlocks = bs.indices.filter(kept).map(bs(_).text)
    Extraction(keptBlocks.mkString("\n"), bs.length, keptBlocks.length,
      title(html))
  }

  /** DataFrame form: adds (main_text, n_blocks_total, n_blocks_kept)
    * from `htmlCol`. Map-side only — no shuffle; the UDF is one linear
    * scan per page (the NocExtract precedent for parser-shaped per-row
    * logic the built-in functions can't express).
    */
  def extractColumn(htmlCol: Column, minChars: Int = 25,
                    maxLinkDensity: Double = 1.0 / 3): Column = {
    val u = udf((html: String) => extract(html, minChars, maxLinkDensity))
    u(htmlCol)
  }

  def withMainContent(df: DataFrame, htmlCol: String,
                      minChars: Int = 25,
                      maxLinkDensity: Double = 1.0 / 3): DataFrame = {
    // materialize the struct in its OWN projection: a non-cheap UDF
    // referenced from several fields is not inlined by CollapseProject,
    // so the page parses once per row, not once per output column
    df.withColumn("__mc", extractColumn(col(htmlCol), minChars, maxLinkDensity))
      .withColumn("main_text", col("__mc.mainText"))
      .withColumn("title", col("__mc.title"))
      .withColumn("n_blocks_total", col("__mc.nBlocksTotal"))
      .withColumn("n_blocks_kept", col("__mc.nBlocksKept"))
      .drop("__mc")
  }
}
