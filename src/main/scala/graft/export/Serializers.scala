package graft.export

import graft.model._

/** Byte-stable serializers for the four output formats
  * (reference: app/transcribe.py:157-193 `_extract_content`). Markdown is
  * the base representation; text = markdown-strip (TextExporter); doctags
  * and json are deterministic renderings of the same DocModel. Goldens are
  * frozen against these exact bytes — any change here is a breaking change.
  */
object MarkdownSerializer {

  def serialize(doc: DocModel): String = {
    val sb = new StringBuilder(1024)
    var first = true
    doc.blocks.foreach { b =>
      if (!first) sb.append("\n\n")
      renderInto(sb, b)
      first = false
    }
    sb.toString
  }

  def renderBlock(b: Block): String = {
    val sb = new StringBuilder
    renderInto(sb, b)
    sb.toString
  }

  /** All blocks render straight into one buffer (the per-block intermediate
    * strings were a measurable slice of kernel garbage — serialize runs once
    * per document over every kept block). Bytes unchanged; goldens pin it. */
  private def renderInto(sb: StringBuilder, b: Block): Unit = b match {
    case HeadingBlock(level, text) =>
      var k = 0
      while (k < level) { sb.append('#'); k += 1 }
      sb.append(' ').append(text)
    case ParaBlock(text) => sb.append(text)
    case ListBlock(ordered, items) =>
      var i = 0
      items.foreach { item =>
        if (i > 0) sb.append('\n')
        if (ordered) sb.append(i + 1).append(". ") else sb.append("- ")
        sb.append(item)
        i += 1
      }
    case t: TableBlock => renderTableInto(sb, t)
    case CodeBlock(text) => sb.append("```\n").append(text).append("\n```")
  }

  def renderTable(t: TableBlock): String = {
    val sb = new StringBuilder
    renderTableInto(sb, t)
    sb.toString
  }

  private def renderTableInto(sb: StringBuilder, t: TableBlock): Unit = {
    val width = (t.headers.length +: t.rows.map(_.length)).max
    appendRow(sb, if (t.headers.nonEmpty) t.headers else Vector.empty, width)
    sb.append('\n')
    sb.append("| ")
    var k = 0
    while (k < width) {
      if (k > 0) sb.append(" | ")
      sb.append("---")
      k += 1
    }
    sb.append(" |")
    t.rows.foreach { r => sb.append('\n'); appendRow(sb, r, width) }
  }

  /** `pad(cells).mkString("| ", " | ", " |")` without the padded vector and
    * per-cell escaped strings: cells beyond `cells.length` render empty. */
  private def appendRow(sb: StringBuilder, cells: Vector[String], width: Int): Unit = {
    sb.append("| ")
    var k = 0
    while (k < width) {
      if (k > 0) sb.append(" | ")
      if (k < cells.length) appendEscapedCell(sb, cells(k))
      k += 1
    }
    sb.append(" |")
  }

  /** escapeCell fused: `\` → `\\`, `|` → `\|`, newline → space, per char —
    * identical to the old sequential replaces. */
  private def appendEscapedCell(sb: StringBuilder, s: String): Unit = {
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => sb.append("\\\\")
        case '|' => sb.append("\\|")
        case '\n' => sb.append(' ')
        case c => sb.append(c)
      }
      i += 1
    }
  }
}

/** DocTags-style tagged token stream (reference delegates to docling's
  * `export_to_document_tokens` at transcribe.py:190-191; this is our
  * deterministic equivalent over the same DocModel). */
object DocTagsSerializer {

  def serialize(doc: DocModel): String = {
    val sb = new StringBuilder
    sb.append("<document name=\"").append(escape(doc.name)).append("\">\n")
    doc.blocks.foreach {
      case HeadingBlock(level, text) =>
        sb.append(s"<section_header_level_$level>").append(escape(text)).append(s"</section_header_level_$level>\n")
      case ParaBlock(text) =>
        sb.append("<paragraph>").append(escape(text)).append("</paragraph>\n")
      case ListBlock(ordered, items) =>
        val tag = if (ordered) "ordered_list" else "unordered_list"
        sb.append(s"<$tag>\n")
        items.foreach(i => sb.append("<list_item>").append(escape(i)).append("</list_item>\n"))
        sb.append(s"</$tag>\n")
      case TableBlock(headers, rows, _) =>
        sb.append("<table>\n")
        if (headers.nonEmpty) {
          sb.append("<table_row>")
          headers.foreach(h => sb.append("<table_header>").append(escape(h)).append("</table_header>"))
          sb.append("</table_row>\n")
        }
        rows.foreach { r =>
          sb.append("<table_row>")
          r.foreach(c => sb.append("<table_cell>").append(escape(c)).append("</table_cell>"))
          sb.append("</table_row>\n")
        }
        sb.append("</table>\n")
      case CodeBlock(text) =>
        sb.append("<code>").append(escape(text)).append("</code>\n")
    }
    sb.append("</document>")
    sb.toString
  }

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
}

/** Canonical JSON of the DocModel: stable field order, indent=2 — the analog
  * of `doc.model_dump_json(indent=2)` (reference: app/transcribe.py:165-166). */
object JsonSerializer {

  def serialize(doc: DocModel): String = {
    val sb = new StringBuilder
    sb.append("{\n")
    sb.append("  \"name\": ").append(jstr(doc.name)).append(",\n")
    sb.append("  \"doc_type\": ").append(jstr(doc.docType)).append(",\n")
    sb.append("  \"page_count\": ").append(doc.pageCount).append(",\n")
    sb.append("  \"blocks\": [")
    if (doc.blocks.nonEmpty) {
      sb.append('\n')
      sb.append(doc.blocks.map(renderBlock).mkString(",\n"))
      sb.append("\n  ]")
    } else sb.append(']')
    sb.append("\n}")
    sb.toString
  }

  private def renderBlock(b: Block): String = b match {
    case HeadingBlock(level, text) =>
      s"""    {"type": "heading", "level": $level, "text": ${jstr(text)}}"""
    case ParaBlock(text) =>
      s"""    {"type": "paragraph", "text": ${jstr(text)}}"""
    case ListBlock(ordered, items) =>
      s"""    {"type": "list", "ordered": $ordered, "items": [${items.map(jstr).mkString(", ")}]}"""
    case TableBlock(headers, rows, page) =>
      val pageStr = page.map(_.toString).getOrElse("null")
      val rowsStr = rows.map(r => "[" + r.map(jstr).mkString(", ") + "]").mkString(", ")
      s"""    {"type": "table", "page": $pageStr, "headers": [${headers.map(jstr).mkString(", ")}], "rows": [$rowsStr]}"""
    case CodeBlock(text) =>
      s"""    {"type": "code", "text": ${jstr(text)}}"""
  }

  /** JSON string escape (control chars, quote, backslash). */
  def jstr(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c0 if c0 < ' ' => sb.append(f"\\u${c0.toInt}%04x")
        case c0 => sb.append(c0)
      }
      i += 1
    }
    sb.append('"')
    sb.toString
  }
}
