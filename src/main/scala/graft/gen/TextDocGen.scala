package graft.gen

import graft.export.MarkdownSerializer
import graft.gen.CorpusGen._
import graft.model._

/** Markdown / AsciiDoc payload writers for the corpus — built by converting
  * the article to a DocModel and serializing, so parser∘generator is a
  * byte-level round trip on the supported subset. */
object TextDocGen {

  /** Article → the DocModel its md/adoc payloads represent. */
  def docModelOf(art: Article, docType: String): DocModel = {
    val blocks = Vector.newBuilder[Block]
    blocks += HeadingBlock(1, art.title.mkString(" "))
    art.pieces.foreach {
      case GHeading(level, ws) => blocks += HeadingBlock(level, ws.mkString(" ").capitalize)
      case GPara(ss) =>
        val text = ss.map(s => s.mkString(" ") + ".")
          .map(s => s.headOption.map(c => c.toUpper.toString + s.tail).getOrElse(s)).mkString(" ")
        blocks += ParaBlock(text)
      case GList(ordered, items) => blocks += ListBlock(ordered, items.map(_.mkString(" ")))
      case GTable(headers, rows) => blocks += TableBlock(headers, rows, page = None)
    }
    DocModel(art.title.mkString(" "), docType, 1, blocks.result())
  }

  def renderMd(art: Article): Array[Byte] =
    MarkdownSerializer.serialize(docModelOf(art, DocumentType.Md)).getBytes("UTF-8")

  def renderAdoc(art: Article): Array[Byte] = {
    val doc = docModelOf(art, DocumentType.Asciidoc)
    val sb = new StringBuilder
    var first = true
    doc.blocks.foreach { b =>
      if (!first) sb.append("\n\n")
      first = false
      b match {
        case HeadingBlock(level, text) => sb.append("=" * level).append(' ').append(text)
        case ParaBlock(text) => sb.append(text)
        case ListBlock(ordered, items) =>
          sb.append(items.map(i => (if (ordered) ". " else "* ") + i).mkString("\n"))
        case TableBlock(headers, rows, _) =>
          sb.append("|===\n")
          sb.append((headers +: rows).map(r => "|" + r.mkString(" |")).mkString("\n"))
          sb.append("\n|===")
        case CodeBlock(text) => sb.append("----\n").append(text).append("\n----")
      }
    }
    sb.toString.getBytes("UTF-8")
  }
}
