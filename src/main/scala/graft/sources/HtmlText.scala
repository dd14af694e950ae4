package graft.sources

/** HTML visible-text extraction (x177) — the boilerplate-strip step
  * between a web crawl ([[WarcScan]]) and every text-curation operator in
  * the engine (quality rules, dedup, language ID all assume plain text).
  * A real single-pass tokenizer, not a regex strip: script/style elements
  * swallow their RAW TEXT content (an `<` inside them is data, not
  * markup), comments skip to `-->`, attribute values are quote-aware (a
  * `>` inside `href="u>v"` must not close the tag — the case regex
  * strippers provably get wrong), and character references decode (the
  * five predefined named entities + decimal numeric). Every dropped
  * tag/comment/raw-text block contributes ONE space (the deterministic
  * stand-in for block-level breaks), then runs of whitespace collapse and
  * the result trims — so extraction is a pure closed-form function of the
  * markup, replayable by the oracle from the fixture's generation
  * formulas.
  *
  * Unterminated constructs (comment, tag, raw-text element) consume to
  * end-of-input — the browser-parity choice, documented rather than
  * quarantined: extraction is a per-row map, and a truncated page still
  * yields its prefix text. A bare `<` not followed by a letter, `/`,
  * `!` or `?` is TEXT (the HTML5 tokenizer rule — "5 < 6" in prose must
  * not swallow the rest of the sentence), and a raw-text close tag only
  * matches when the name ends there (`</scripts>` does not close a
  * script). Structural WARC lies are [[WarcScan]]'s job.
  */
object HtmlText {

  private val Named = Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&apos;" -> "'")

  def extract(html: String): String = {
    val out = new StringBuilder
    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<' && i + 1 < n &&
        (Character.isLetter(html.charAt(i + 1)) || html.charAt(i + 1) == '/' ||
          html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
          out.append(' ')
        } else {
          var j = i + 1
          var quote: Char = 0
          while (j < n && (quote != 0 || html.charAt(j) != '>')) {
            val ch = html.charAt(j)
            if (quote == 0 && (ch == '"' || ch == '\'')) quote = ch
            else if (quote != 0 && ch == quote) quote = 0
            j += 1
          }
          val closing = i + 1 < n && html.charAt(i + 1) == '/'
          var k = if (closing) i + 2 else i + 1
          val ns = k
          while (k < n && Character.isLetterOrDigit(html.charAt(k))) k += 1
          val name = html.substring(ns, k).toLowerCase
          i = if (j < n) j + 1 else n
          out.append(' ')
          if (!closing && (name == "script" || name == "style")) {
            val close = "</" + name
            var e = i
            var found = -1
            while (found < 0 && e + close.length <= n) {
              // the close-tag NAME must end here: '</scripts>' does not
              // close a script element (HTML5 §13.2.5.x rawtext rules)
              val after = e + close.length
              val ends = after >= n || html.charAt(after) == '>' || html.charAt(after) == '/' ||
                Character.isWhitespace(html.charAt(after))
              if (html.regionMatches(true, e, close, 0, close.length) && ends) found = e else e += 1
            }
            if (found < 0) i = n
            else {
              val gt = html.indexOf('>', found)
              i = if (gt < 0) n else gt + 1
              out.append(' ')
            }
          }
        }
      } else if (c == '&') {
        Named.find { case (e, _) => html.startsWith(e, i) } match {
          case Some((e, repl)) =>
            out.append(repl)
            i += e.length
          case None =>
            // decimal numeric reference &#NN; (the fixture's only other
            // form); anything else stays verbatim
            var k = i + 2
            if (html.startsWith("&#", i)) {
              while (k < n && Character.isDigit(html.charAt(k))) k += 1
              if (k > i + 2 && k < n && html.charAt(k) == ';' && k - (i + 2) <= 7) {
                val cp = html.substring(i + 2, k).toLong
                if (cp > 0 && cp <= 0x10ffff) {
                  out.appendAll(Character.toChars(cp.toInt))
                  i = k + 1
                } else { out.append(c); i += 1 }
              } else { out.append(c); i += 1 }
            } else { out.append(c); i += 1 }
        }
      } else {
        out.append(c)
        i += 1
      }
    }
    out.toString.replaceAll("[ \\t\\r\\n\\u000b\\f]+", " ").trim
  }
}
