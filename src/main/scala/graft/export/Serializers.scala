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
      sb.append(renderBlock(b))
      first = false
    }
    sb.toString
  }

  def renderBlock(b: Block): String = b match {
    case HeadingBlock(level, text) => ("#" * level) + " " + text
    case ParaBlock(text) => text
    case ListBlock(ordered, items) =>
      items.zipWithIndex.map { case (item, i) =>
        if (ordered) s"${i + 1}. $item" else s"- $item"
      }.mkString("\n")
    case t: TableBlock => renderTable(t)
    case CodeBlock(text) => "```\n" + text + "\n```"
  }

  def renderTable(t: TableBlock): String = {
    val width = (t.headers.length +: t.rows.map(_.length)).max
    def pad(cells: Vector[String]): Vector[String] =
      cells.map(escapeCell).padTo(width, "")
    val sb = new StringBuilder
    val headers = if (t.headers.nonEmpty) t.headers else Vector.fill(width)("")
    sb.append(pad(headers).mkString("| ", " | ", " |")).append('\n')
    sb.append(Vector.fill(width)("---").mkString("| ", " | ", " |"))
    t.rows.foreach { r => sb.append('\n').append(pad(r).mkString("| ", " | ", " |")) }
    sb.toString
  }

  private def escapeCell(s: String): String =
    s.replace("\\", "\\\\").replace("|", "\\|").replace("\n", " ")
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
