package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HTML MAIN-CONTENT EXTRACTION (VERDICT r15 #3) — the first stage of
  * a web-crawl training-data pipeline: strip markup, segment into
  * blocks, and keep the blocks that look like body text rather than
  * boilerplate. The classifier is the jusText/text-density family
  * (Pomikálek 2011, public): a block is CONTENT when its stripped text
  * is long enough (≥ `minChars`) AND its link density — anchor-text
  * chars over block text chars — is ≤ 1/3; navigation bars, footers,
  * and "ads" stubs fail one or both. Dependency-free by design (no
  * html parser library exists in this container, and a real crawl
  * pipeline wants the hot path allocation-lean anyway): one
  * single-pass scanner per document, run as a typed map — the
  * multimodal-codec precedent (graft.multimodal): per-row, no shuffle,
  * linear in corpus bytes, embarrassingly partition-parallel at any
  * scale.
  *
  * Parsing model (deliberately the same naive-but-deterministic one
  * the DuckDB oracle's regexes implement, so the two engines cannot
  * disagree on adversarial markup):
  *  - a tag is '<' .. '>' (no quote-awareness — attributes containing
  *    '>' are out of contract, as they are for the oracle's [^>]*);
  *  - <script>/<style> content is dropped up to the first matching
  *    close tag (the oracle's non-greedy .*?);
  *  - BLOCK tags (p, div, h1..h6, head, title, body, html, ul, ol,
  *    li, br, nav, footer, header, article, section, table, tr, td,
  *    th, blockquote, pre) split blocks; all other tags (a, b, i,
  *    span, …) are inline and only stripped;
  *  - anchor text (chars inside <a>..</a>) counts toward the block's
  *    link chars at RAW (pre-normalization) length — only for anchors
  *    that COMPLETE within the block (the regex needs the full pair in
  *    one fragment; an anchor spanning a block tag counts on neither
  *    side — ADVICE r16, fuzz-pinned);
  *  - block text is whitespace-normalized (runs → one space, trimmed);
  *    empty blocks don't exist (they're split artifacts, not blocks).
  *
  * Char counts are CODEPOINT counts (DuckDB `length` semantics; the
  * synthetic corpus is ASCII so Spark's UTF-16 length would agree, but
  * the parser doesn't rely on that).
  */
object Html {

  /** Block-splitting tags. The q222 oracle's split regex enumerates
    * exactly the subset the fixture uses (p, div, h1, head, title,
    * body, html) — the full set here only widens coverage for real
    * markup and is what KernelFuzzSpec's independent reference uses. */
  private val BlockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "head", "title",
    "body", "html", "ul", "ol", "li", "br", "nav", "footer", "header",
    "article", "section", "table", "tr", "td", "th", "blockquote", "pre")

  final case class Block(text: String, chars: Long, linkChars: Long,
                         isContent: Boolean)

  final case class Extracted(nBlocks: Long, nContent: Long,
                             contentChars: Long, totalChars: Long,
                             ratioMicro: Long, mainText: String)

  private def normalize(sb: StringBuilder): String = {
    val out = new StringBuilder(sb.length)
    var i = 0
    var pendingSpace = false
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
        if (out.nonEmpty) pendingSpace = true
      } else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
      i += 1
    }
    out.toString
  }

  private def codepoints(s: String): Long =
    s.codePointCount(0, s.length).toLong

  /** Single-pass block extraction + jusText-style classification.
    *
    * Anchor accounting matches the oracle/reference regex exactly
    * (ADVICE r16): `<a[^>]*>(.*?)</a>` only matches a COMPLETE pair
    * within one block fragment, so an anchor left open at a block-tag
    * boundary contributes link chars to NEITHER side — chars under a
    * still-open anchor accumulate in `openLink` and fold into the
    * block's `curLink` only when the anchor CLOSES; a flush discards
    * them (and the close-side half never counts because `linkDepth`
    * resets). Nested anchors remain out of contract (the reference
    * counts the inner markup raw; neither the fixture nor the fuzzer
    * generates them).
    */
  def extractBlocks(html: String, minChars: Int): Seq[Block] = {
    val blocks = Seq.newBuilder[Block]
    val cur = new StringBuilder
    var curLink = 0L  // completed-anchor chars in this block
    var openLink = 0L // chars under a still-open anchor (discarded at flush)
    var linkDepth = 0
    var skipUntil: String = null // inside <script>/<style>
    def flush(): Unit = {
      val t = normalize(cur)
      if (t.nonEmpty) {
        val n = codepoints(t)
        blocks += Block(t, n, curLink,
          n >= minChars && curLink * 3 <= n)
      }
      cur.setLength(0); curLink = 0L; openLink = 0L; linkDepth = 0
    }
    var i = 0
    val len = html.length
    while (i < len) {
      val c = html.charAt(i)
      if (c == '<') {
        val close = html.indexOf('>', i + 1)
        if (close < 0) {
          // unterminated tag: treat the rest as text (the oracle's
          // regex likewise never matches it — and an anchor still open
          // here never completes, so its chars land in openLink and
          // the final flush drops them, like the reference)
          if (skipUntil == null) {
            cur.append(html, i, len)
            if (linkDepth > 0) openLink += codepoints(html.substring(i, len))
          }
          i = len
        } else {
          val isClosing = i + 1 < close && html.charAt(i + 1) == '/'
          var p = if (isClosing) i + 2 else i + 1
          val nameStart = p
          while (p < close && (html.charAt(p).isLetter || html.charAt(p).isDigit))
            p += 1
          val name = html.substring(nameStart, p).toLowerCase
          if (skipUntil != null) {
            if (isClosing && name == skipUntil) skipUntil = null
          } else if (!isClosing && (name == "script" || name == "style")) {
            skipUntil = name
          } else if (BlockTags.contains(name)) {
            flush()
          } else if (name == "a") {
            if (isClosing) {
              if (linkDepth == 1) { curLink += openLink; openLink = 0L }
              linkDepth = math.max(0, linkDepth - 1)
            } else linkDepth += 1
          } // other inline tags: stripped
          i = close + 1
        }
      } else {
        if (skipUntil == null) {
          cur.append(c)
          // count link chars at codepoint granularity: low surrogates
          // are continuation units, don't double-count
          if (linkDepth > 0 && !Character.isLowSurrogate(c)) openLink += 1
        }
        i += 1
      }
    }
    flush()
    blocks.result()
  }

  /** Per-document rollup of [[extractBlocks]]. Returns None for a
    * document with zero (nonempty) blocks — the oracle's GROUP BY
    * likewise emits no row for it. */
  def extract(html: String, minChars: Int = 20): Option[Extracted] = {
    val bs = extractBlocks(html, minChars)
    if (bs.isEmpty) None
    else {
      val content = bs.filter(_.isContent)
      val cChars = content.map(_.chars).sum
      val tChars = bs.map(_.chars).sum
      Some(Extracted(bs.size.toLong, content.size.toLong, cChars, tChars,
        math.floor(cChars.toDouble * 1e6 / tChars.toDouble + 0.5).toLong,
        content.map(_.text).mkString("\n")))
    }
  }

  /** Main-content extraction over a corpus: one typed map, one row per
    * document with at least one block — (doc_id, n_blocks, n_content,
    * content_chars, total_chars, ratio_micro, main_text). `ratio_micro`
    * is the main-content ratio (content chars over all block chars),
    * the crawl-quality signal a curation pass filters on. */
  def mainContent(df: DataFrame, idCol: String, htmlCol: String,
                  minChars: Int = 20): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("doc_id"),
        col(htmlCol).as("html"))
      .as[(Long, String)]
      .flatMap { case (id, h) =>
        extract(if (h == null) "" else h, minChars).map(e =>
          (id, e.nBlocks, e.nContent, e.contentChars, e.totalChars,
            e.ratioMicro, e.mainText))
      }
      .toDF("doc_id", "n_blocks", "n_content", "content_chars",
        "total_chars", "ratio_micro", "main_text")
  }

  /** Deterministic HTML-wrapping fixture (the wavFixture precedent,
    * graft.multimodal): wraps each document's text in realistic
    * boilerplate — head with style+script (the script BODY contains a
    * fake `<p>` tag, so extraction that splits before stripping
    * scripts leaks a phantom block), a link-dense nav, an h1, the text
    * as two paragraph blocks (the second carrying an inline "read
    * more" anchor — link density on a REAL block), an "ads" stub, and
    * a link-heavy footer. ONE SQL fragment valid in BOTH Spark SQL and
    * DuckDB (|| concat, substr, floor-division spelled with / and
    * floor), so the two engines build bit-identical fixtures — the
    * shared-generator doctrine. */
  def fixtureSql: String = {
    val half = "cast(floor((length(text) + 1) / 2) as int)"
    "'<html><head><title>doc ' || cast(doc_id as string) || '</title>' || " +
      "'<style>p{margin:0}</style>' || " +
      "'<script>var t=\"<p>not content</p>\";</script>' || " +
      "'</head><body>' || " +
      "'<div><a href=\"/\">home</a> <a href=\"/about\">about</a> " +
      "<a href=\"/tag\">' || lang || '</a></div>' || " +
      "'<h1>' || substr(text, 1, 24) || '</h1>' || " +
      s"'<p>' || substr(text, 1, $half) || '</p>' || " +
      s"'<p>' || substr(text, $half + 1) || " +
      "' <a href=\"/more\">read more in ' || lang || '</a></p>' || " +
      "'<p>ads</p>' || " +
      // content-LOOKING boilerplate: long enough, link-free — it passes
      // the q222 length/link-density classifier on purpose, because
      // cross-document LINE FREQUENCY (q224) is the stage that catches
      // it, exactly the jusText-misses-it case CCNet-style line
      // filtering exists for
      "'<p>subscribe to our newsletter for weekly updates</p>' || " +
      "'<div>copyright <a href=\"/privacy\">privacy policy</a> " +
      "<a href=\"/terms\">terms of use</a> " +
      "<a href=\"/contact\">contact</a></div>' || " +
      "'</body></html>'"
  }
}
