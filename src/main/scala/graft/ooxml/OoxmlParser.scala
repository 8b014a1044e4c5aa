package graft.ooxml

import graft.html.{Element, TextNode, TreeBuilder}
import graft.model._
import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream
import scala.collection.mutable.ArrayBuffer

/** Minimal OOXML (docx/xlsx/pptx) parsers — the offline reimplementation of
  * the conversion the reference delegates to docling for Office types
  * (reference: app/utils.py:20-33 MIME map; app/transcribe.py:97-103).
  * The XML parts are parsed with the same forgiving tokenizer/tree-builder
  * as HTML (XML is a clean subset of what it accepts; OOXML tag/attr names
  * arrive lowercased: `w:p`, `w:pstyle`, `a:t`, ...).
  *
  * Supported subset = what graft.gen.OoxmlGen emits (FIXTURES.md pattern):
  *  - docx: Title/HeadingN styles, runs with bold/italic, tables;
  *  - xlsx: shared strings, inline numbers, one table per sheet;
  *  - pptx: slides in number order, title + body paragraphs.
  */
object OoxmlParser {

  def parseZip(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val out = Map.newBuilder[String, Array[Byte]]
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out += e.getName -> zin.readAllBytes()
      zin.closeEntry()
      e = zin.getNextEntry
    }
    out.result()
  }

  private def xml(parts: Map[String, Array[Byte]], name: String): Option[Element] =
    parts.get(name).map(b => TreeBuilder.parse(new String(b, "UTF-8")))

  /** All descendant elements with the given (lowercased) tag name. */
  private def descendants(e: Element, name: String): Vector[Element] = {
    val out = Vector.newBuilder[Element]
    def rec(el: Element): Unit = el.children.foreach {
      case c: Element =>
        if (c.name == name) out += c
        rec(c)
      case _ =>
    }
    rec(e)
    out.result()
  }

  private def firstDescendant(e: Element, name: String): Option[Element] =
    descendants(e, name).headOption

  private def textOf(e: Element): String = {
    val sb = new StringBuilder
    def rec(el: Element): Unit = el.children.foreach {
      case TextNode(t) => sb.append(t)
      case c: Element => rec(c)
    }
    rec(e)
    sb.toString
  }

  // ------------------------------------------------------------------ docx

  def parseDocx(bytes: Array[Byte], fallbackName: String): DocModel = {
    val parts = parseZip(bytes)
    val body = xml(parts, "word/document.xml")
      .flatMap(firstDescendant(_, "w:body"))
      .getOrElse(throw new IllegalArgumentException("docx: no word/document.xml body"))

    val blocks = ArrayBuffer.empty[Block]
    var title: Option[String] = None

    body.children.foreach {
      case el: Element if el.name == "w:p" =>
        val style = firstDescendant(el, "w:pstyle").flatMap(_.attr("w:val")).getOrElse("")
        val text = renderRuns(el)
        if (text.nonEmpty) {
          style match {
            case "Title" =>
              if (title.isEmpty) title = Some(stripMd(text))
              blocks += HeadingBlock(1, text)
            case s if s.startsWith("Heading") =>
              val lvl = s.stripPrefix("Heading").toIntOption.getOrElse(2).min(6).max(1)
              blocks += HeadingBlock(lvl, text)
            case _ =>
              blocks += ParaBlock(text)
          }
        }
      case el: Element if el.name == "w:tbl" =>
        val rows = descendants(el, "w:tr").map { tr =>
          descendants(tr, "w:tc").map(tc => stripMd(renderRuns(tc))).toVector
        }.filter(_.nonEmpty)
        if (rows.nonEmpty) blocks += TableBlock(rows.head, rows.tail.toVector, page = None)
      case _ =>
    }

    DocModel(title.getOrElse(fallbackName), DocumentType.Docx, 1, blocks.toVector)
  }

  /** Concatenate a paragraph's runs, wrapping bold/italic as markdown. */
  private def renderRuns(scope: Element): String = {
    val sb = new StringBuilder
    descendants(scope, "w:r").foreach { r =>
      val text = descendants(r, "w:t").map(textOf).mkString
      if (text.nonEmpty) {
        val bold = firstDescendant(r, "w:b").isDefined
        val italic = firstDescendant(r, "w:i").isDefined
        val trimmed = text
        if (bold) sb.append("**").append(trimmed).append("**")
        else if (italic) sb.append('*').append(trimmed).append('*')
        else sb.append(trimmed)
      }
    }
    graft.html.BlockExtractor.normalizeWs(sb.toString)
  }

  private def stripMd(s: String): String = s.replace("**", "").replace("*", "")

  // ------------------------------------------------------------------ xlsx

  def parseXlsx(bytes: Array[Byte], fallbackName: String): DocModel = {
    val parts = parseZip(bytes)
    val shared: Vector[String] = xml(parts, "xl/sharedStrings.xml")
      .map(ss => descendants(ss, "si").map(si => descendants(si, "t").map(textOf).mkString))
      .getOrElse(Vector.empty)

    val sheetNames = parts.keys.filter(n => n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml"))
      .toVector.sortBy(n => n.stripPrefix("xl/worksheets/sheet").stripSuffix(".xml").toIntOption.getOrElse(0))
    if (sheetNames.isEmpty) throw new IllegalArgumentException("xlsx: no worksheets")

    val blocks = sheetNames.flatMap { sn =>
      val sheet = xml(parts, sn).getOrElse(throw new IllegalArgumentException(s"xlsx: bad $sn"))
      val rows = descendants(sheet, "row").map { r =>
        descendants(r, "c").map { c =>
          val v = firstDescendant(c, "v").map(textOf).getOrElse("")
          if (c.attr("t").contains("s")) v.toIntOption.flatMap(shared.lift).getOrElse(v) else v
        }.toVector
      }.filter(_.nonEmpty)
      if (rows.isEmpty) None
      else Some(TableBlock(rows.head, rows.tail.toVector, page = None))
    }

    DocModel(fallbackName, DocumentType.Xlsx, sheetNames.length, blocks.toVector)
  }

  // ------------------------------------------------------------------ pptx

  def parsePptx(bytes: Array[Byte], fallbackName: String): DocModel = {
    val parts = parseZip(bytes)
    val slideNames = parts.keys.filter(n => n.startsWith("ppt/slides/slide") && n.endsWith(".xml"))
      .toVector.sortBy(n => n.stripPrefix("ppt/slides/slide").stripSuffix(".xml").toIntOption.getOrElse(0))
    if (slideNames.isEmpty) throw new IllegalArgumentException("pptx: no slides")

    val blocks = ArrayBuffer.empty[Block]
    var title: Option[String] = None

    slideNames.foreach { sn =>
      val slide = xml(parts, sn).getOrElse(throw new IllegalArgumentException(s"pptx: bad $sn"))
      descendants(slide, "p:sp").foreach { sp =>
        val isTitle = descendants(sp, "p:ph").exists(_.attr("type").contains("title"))
        val paras = descendants(sp, "a:p").map { p =>
          descendants(p, "a:t").map(textOf).mkString
        }.map(graft.html.BlockExtractor.normalizeWs).filter(_.nonEmpty)
        if (isTitle) {
          paras.headOption.foreach { t =>
            if (title.isEmpty) title = Some(t)
            blocks += HeadingBlock(2, t)
          }
        } else {
          paras.foreach(p => blocks += ParaBlock(p))
        }
      }
    }

    DocModel(title.getOrElse(fallbackName), DocumentType.Pptx, slideNames.length, blocks.toVector)
  }
}
