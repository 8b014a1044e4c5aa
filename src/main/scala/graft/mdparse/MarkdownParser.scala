package graft.mdparse

import graft.model._
import scala.collection.mutable.ArrayBuffer

/** Minimal CommonMark-subset parser → DocModel (the reference accepts `md`
  * payloads and parses them via docling, app/utils.py:36-54 + transcribe.py:
  * 97-103; this is the from-scratch equivalent). Inline spans (**, *, `,
  * [text](url)) are kept verbatim — they are already the DocModel's inline
  * representation, so MarkdownSerializer∘MarkdownParser is identity on the
  * subset our serializer emits (round-trip-tested).
  *
  * Blocks: ATX headings (#{1,6} ), fenced code (```), pipe tables with a
  * `---` separator row, unordered (-, *) and ordered (N.) lists, blank-line
  * separated paragraphs (soft-wrapped lines joined with a space).
  */
object MarkdownParser {

  def parse(md: String, fallbackName: String): DocModel = {
    val lines = md.split("\n", -1)
    val blocks = ArrayBuffer.empty[Block]
    var title: Option[String] = None
    var i = 0
    val n = lines.length

    def isBlank(s: String): Boolean = s.trim.isEmpty
    def isTableLine(s: String): Boolean = s.startsWith("|") && s.trim.endsWith("|") && s.length > 1
    def isSeparatorRow(s: String): Boolean =
      isTableLine(s) && splitCells(s).forall(c => c.nonEmpty && c.forall(ch => ch == '-' || ch == ':'))
    def listKind(s: String): Int = { // 0 none, 1 unordered, 2 ordered
      if (s.startsWith("- ") || s.startsWith("* ")) 1
      else {
        val dot = s.indexOf(". ")
        if (dot > 0 && dot <= 9 && s.substring(0, dot).forall(_.isDigit)) 2 else 0
      }
    }

    while (i < n) {
      val line = lines(i)
      if (isBlank(line)) { i += 1 }
      else if (line.startsWith("#")) {
        var level = 0
        while (level < line.length && line.charAt(level) == '#' && level < 6) level += 1
        val text = line.substring(level).trim
        if (text.nonEmpty) {
          if (level == 1 && title.isEmpty) title = Some(stripSpans(text))
          blocks += HeadingBlock(level, text)
        }
        i += 1
      } else if (line.startsWith("```")) {
        val buf = ArrayBuffer.empty[String]
        i += 1
        while (i < n && !lines(i).startsWith("```")) { buf += lines(i); i += 1 }
        i += 1 // closing fence
        blocks += CodeBlock(buf.mkString("\n"))
      } else if (isTableLine(line) && i + 1 < n && isSeparatorRow(lines(i + 1))) {
        val headers = splitCells(line).map(unescapeCell)
        i += 2
        val rows = ArrayBuffer.empty[Vector[String]]
        while (i < n && isTableLine(lines(i))) {
          rows += splitCells(lines(i)).map(unescapeCell)
          i += 1
        }
        blocks += TableBlock(headers, rows.toVector, page = None)
      } else if (listKind(line) != 0) {
        val kind = listKind(line)
        val items = ArrayBuffer.empty[String]
        while (i < n && listKind(lines(i)) == kind) {
          val s = lines(i)
          items += (if (kind == 1) s.substring(2).trim else s.substring(s.indexOf(". ") + 2).trim)
          i += 1
        }
        blocks += ListBlock(kind == 2, items.toVector)
      } else {
        val buf = ArrayBuffer.empty[String]
        while (i < n && !isBlank(lines(i)) && !lines(i).startsWith("#") &&
               !lines(i).startsWith("```") && listKind(lines(i)) == 0 &&
               !(isTableLine(lines(i)) && i + 1 < n && isSeparatorRow(lines(i + 1)))) {
          buf += lines(i).trim
          i += 1
        }
        val text = buf.mkString(" ")
        if (text.nonEmpty) blocks += ParaBlock(text)
      }
    }

    DocModel(title.getOrElse(fallbackName), DocumentType.Md, 1, blocks.toVector)
  }

  /** Split `| a | b |` to cells, honoring `\|` escapes. */
  private def splitCells(line: String): Vector[String] = {
    val t = line.trim
    val inner = t.substring(1, t.length - (if (t.endsWith("|")) 1 else 0))
    val cells = Vector.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    while (i < inner.length) {
      val c = inner.charAt(i)
      if (c == '\\' && i + 1 < inner.length) { cur.append(c).append(inner.charAt(i + 1)); i += 2 }
      else if (c == '|') { cells += cur.toString.trim; cur.clear(); i += 1 }
      else { cur.append(c); i += 1 }
    }
    cells += cur.toString.trim
    cells.result()
  }

  private def unescapeCell(s: String): String =
    s.replace("\\|", "|").replace("\\\\", "\\")

  private def stripSpans(s: String): String =
    s.replace("**", "").replace("*", "").replace("`", "")
}

/** Minimal AsciiDoc-subset parser → DocModel (`adoc` DocumentType,
  * app/utils.py:44-45): `=` headings (level = count, `=` doc title),
  * `*` bullet / `.` ordered lists, `|===`-delimited tables (first row =
  * header), `----` literal blocks, blank-line paragraphs. */
object AsciidocParser {

  def parse(adoc: String, fallbackName: String): DocModel = {
    val lines = adoc.split("\n", -1)
    val blocks = ArrayBuffer.empty[Block]
    var title: Option[String] = None
    var i = 0
    val n = lines.length

    def isBlank(s: String): Boolean = s.trim.isEmpty

    while (i < n) {
      val line = lines(i)
      if (isBlank(line)) i += 1
      else if (line.startsWith("=")) {
        var level = 0
        while (level < line.length && line.charAt(level) == '=' && level < 6) level += 1
        val text = line.substring(level).trim
        if (text.nonEmpty) {
          if (level == 1 && title.isEmpty) title = Some(text)
          blocks += HeadingBlock(level, text)
        }
        i += 1
      } else if (line.startsWith("----")) {
        val buf = ArrayBuffer.empty[String]
        i += 1
        while (i < n && !lines(i).startsWith("----")) { buf += lines(i); i += 1 }
        i += 1
        blocks += CodeBlock(buf.mkString("\n"))
      } else if (line.startsWith("|===")) {
        i += 1
        val rows = ArrayBuffer.empty[Vector[String]]
        while (i < n && !lines(i).startsWith("|===")) {
          val s = lines(i).trim
          if (s.startsWith("|")) rows += s.substring(1).split("\\|").map(_.trim).toVector
          i += 1
        }
        i += 1
        if (rows.nonEmpty) blocks += TableBlock(rows.head, rows.tail.toVector, page = None)
      } else if (line.startsWith("* ") || line.startsWith(". ")) {
        val ordered = line.startsWith(". ")
        val prefix = if (ordered) ". " else "* "
        val items = ArrayBuffer.empty[String]
        while (i < n && lines(i).startsWith(prefix)) {
          items += lines(i).substring(2).trim
          i += 1
        }
        blocks += ListBlock(ordered, items.toVector)
      } else {
        val buf = ArrayBuffer.empty[String]
        while (i < n && !isBlank(lines(i)) && !lines(i).startsWith("=") &&
               !lines(i).startsWith("* ") && !lines(i).startsWith(". ") &&
               !lines(i).startsWith("|===") && !lines(i).startsWith("----")) {
          buf += lines(i).trim
          i += 1
        }
        val text = buf.mkString(" ")
        if (text.nonEmpty) blocks += ParaBlock(text)
      }
    }

    DocModel(title.getOrElse(fallbackName), DocumentType.Asciidoc, 1, blocks.toVector)
  }
}
