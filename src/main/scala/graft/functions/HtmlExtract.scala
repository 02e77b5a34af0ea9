package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Boilerplate-stripping main-text extraction from HTML — the step every
  * pretraining pipeline runs before any text analysis (trafilatura /
  * Arc90-readability rule family, the deterministic core of it):
  *
  *  1. `<script>`/`<style>` elements and `<head>` are dropped whole;
  *     comments (`<!-- -->`) are dropped; `<![CDATA[ ]]>` bodies are
  *     kept as literal text.
  *  2. The document segments into BLOCKS at block-level tags (`p`,
  *     `div`, `li`, `h1..h6`, `br`, `table`/`tr`/`td`/`th`, `section`,
  *     `article`, `header`, `footer`, `nav`, `blockquote`, `ul`/`ol`,
  *     `hr`, `pre`, `form`, `body`, `html`); inline tags (`a`, `b`,
  *     `i`, `span`, …) contribute no characters.
  *  3. Entities decode (`&amp; &lt; &gt; &quot; &apos; &nbsp;` and
  *     numeric `&#NN;`/`&#xHH;`); an unrecognized `&…` stays literal.
  *  4. Per block, whitespace runs collapse to one space and ends trim.
  *  5. LINK-DENSITY FILTER (the Arc90 boilerplate heuristic): a block
  *     is kept iff its normalized text is non-empty and
  *     `2 * link_chars <= total_chars`, both counted on DECODED
  *     pre-normalization text (`link_chars` = characters inside
  *     `<a>…</a>`). Navigation bars and footers are all-link → dropped;
  *     prose with an inline citation link passes. The rule is integer
  *     arithmetic on purpose — no float threshold to disagree across
  *     engines.
  *
  * Output: `struct<clean: string, kept_blocks: int, dropped_blocks:
  * int>` — kept blocks joined by `\n`, and the count of non-empty
  * blocks the density rule discarded. NULL input → NULL.
  *
  * Known simplifications (documented, spec-pinned): attribute values
  * containing `>` end the tag early; `<a>` nesting tracks depth and a
  * link may span block boundaries; tag names match case-insensitively.
  *
  * Single pass, one kernel call per row inside whole-stage codegen via
  * [[SketchCodegen]] — an equivalent formula needs a regexp_replace
  * chain (several passes over the document, each allocating) plus a
  * HOF per-block walk on the interpreted path.
  */
case class HtmlExtract(child: Expression)
    extends UnaryExpression with SketchCodegen {

  override def prettyName: String = "graft_html_extract"
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("clean", StringType, nullable = false),
    StructField("kept_blocks", IntegerType, nullable = false),
    StructField("dropped_blocks", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val (clean, kept, dropped) =
      HtmlExtract.extract(input.asInstanceOf[UTF8String].toString)
    new GenericInternalRow(Array[Any](UTF8String.fromString(clean), kept, dropped))
  }

  override protected def withNewChildInternal(newChild: Expression): HtmlExtract =
    copy(child = newChild)
}

object HtmlExtract {

  private val blockTags: Set[String] = Set(
    "p", "div", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
    "br", "table", "tr", "td", "th", "blockquote", "section", "article",
    "header", "footer", "nav", "hr", "pre", "form", "body", "html")

  private val entities: Map[String, Char] = Map(
    "amp" -> '&', "lt" -> '<', "gt" -> '>', "quot" -> '"',
    "apos" -> '\'', "nbsp" -> ' ')

  /** The parser kernel. Returns (clean text, kept blocks, dropped
    * blocks). Package-visible so specs can differential-test it on
    * hand-built edge cases without a session.
    */
  private[graft] def extract(html: String): (String, Int, Int) = {
    val n = html.length
    val out = new java.lang.StringBuilder
    val block = new java.lang.StringBuilder
    var linkChars = 0L
    var totalChars = 0L
    var kept = 0
    var dropped = 0
    var linkDepth = 0
    var i = 0

    def appendText(c: Char): Unit = {
      block.append(c)
      totalChars += 1
      if (linkDepth > 0) linkChars += 1
    }

    def finalizeBlock(): Unit = {
      // collapse whitespace runs, trim ends
      var j = 0
      val m = block.length
      val norm = new java.lang.StringBuilder(m)
      var pendingSpace = false
      while (j < m) {
        val c = block.charAt(j)
        if (Character.isWhitespace(c)) pendingSpace = norm.length > 0
        else {
          if (pendingSpace) { norm.append(' '); pendingSpace = false }
          norm.append(c)
        }
        j += 1
      }
      if (norm.length > 0) {
        if (2L * linkChars <= totalChars) {
          if (out.length > 0) out.append('\n')
          out.append(norm)
          kept += 1
        } else dropped += 1
      }
      block.setLength(0)
      linkChars = 0
      totalChars = 0
    }

    /** Index just past the next occurrence of `needle` (ASCII,
      * case-insensitive) at or after `from`; n if absent. */
    def skipPast(from: Int, needle: String): Int = {
      var s = from
      val nl = needle.length
      while (s + nl <= n) {
        var k = 0
        while (k < nl &&
            Character.toLowerCase(html.charAt(s + k)) == needle.charAt(k)) k += 1
        if (k == nl) return s + nl
        s += 1
      }
      n
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          i = skipPast(i + 4, "-->")
        } else if (html.startsWith("<![CDATA[", i)) {
          val end0 = html.indexOf("]]>", i + 9)
          val end = if (end0 < 0) n else end0
          var j = i + 9
          while (j < end) { appendText(html.charAt(j)); j += 1 }
          i = if (end0 < 0) n else end + 3
        } else {
          // parse the tag: optional '/', name, attributes, '>'
          var j = i + 1
          val closing = j < n && html.charAt(j) == '/'
          if (closing) j += 1
          val nameStart = j
          while (j < n && (Character.isLetterOrDigit(html.charAt(j)))) j += 1
          val name = html.substring(nameStart, j).toLowerCase
          val gt0 = html.indexOf('>', j)
          val tagEnd = if (gt0 < 0) n else gt0 + 1
          if (name.isEmpty) {
            // stray '<' — literal text, like browsers treat it
            appendText(c)
            i += 1
          } else {
            if (!closing && name == "script") i = skipPast(tagEnd, "</script")
            else if (!closing && name == "style") i = skipPast(tagEnd, "</style")
            else if (!closing && name == "head") i = skipPast(tagEnd, "</head")
            else i = tagEnd
            if (i > tagEnd && (name == "script" || name == "style" || name == "head")) {
              // skipPast landed just past "</script" etc — consume to '>'
              val gt1 = html.indexOf('>', i)
              i = if (gt1 < 0) n else gt1 + 1
            } else if (i == n && !closing &&
                (name == "script" || name == "style" || name == "head")) {
              // unterminated — nothing more to do
            }
            if (name == "a") {
              if (closing) linkDepth = math.max(0, linkDepth - 1)
              else if (tagEnd >= 2 && html.charAt(tagEnd - 2) != '/') linkDepth += 1
            } else if (blockTags.contains(name)) {
              finalizeBlock()
            }
          }
        }
      } else if (c == '&') {
        // entity: up to 10 chars to ';'
        val semi = html.indexOf(';', i + 1)
        var decoded = false
        if (semi > i && semi - i <= 10) {
          val body = html.substring(i + 1, semi)
          if (body.startsWith("#x") || body.startsWith("#X")) {
            try {
              appendText(Integer.parseInt(body.substring(2), 16).toChar)
              decoded = true
            } catch { case _: NumberFormatException => }
          } else if (body.startsWith("#")) {
            try {
              appendText(Integer.parseInt(body.substring(1)).toChar)
              decoded = true
            } catch { case _: NumberFormatException => }
          } else entities.get(body) match {
            case Some(ch) => appendText(ch); decoded = true
            case None =>
          }
        }
        if (decoded) i = semi + 1
        else { appendText('&'); i += 1 }
      } else {
        appendText(c)
        i += 1
      }
    }
    finalizeBlock()
    (out.toString, kept, dropped)
  }
}
