package graft.gen

import graft.gen.CorpusGen._
import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}
import scala.util.Random

/** Deterministic minimal OOXML writers (docx/xlsx/pptx) in the exact subset
  * graft.ooxml.OoxmlParser supports. Zip entry timestamps are pinned so the
  * produced bytes are bit-stable across regenerations. */
object OoxmlGen {

  private val FixedTime = 1735689600000L // 2025-01-01T00:00:00Z

  private def zip(entries: Seq[(String, String)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      val e = new ZipEntry(name)
      e.setTime(FixedTime)
      z.putNextEntry(e)
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  // ------------------------------------------------------------------ docx

  def renderDocx(art: Article, rnd: Random): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<w:document xmlns:w=\"http://schemas.openxmlformats.org/wordprocessingml/2006/main\"><w:body>")
    def para(style: Option[String], runs: Seq[(String, Int)]): Unit = {
      sb.append("<w:p>")
      style.foreach(s => sb.append(s"""<w:pPr><w:pStyle w:val="$s"/></w:pPr>"""))
      runs.foreach { case (text, kind) =>
        sb.append("<w:r>")
        kind match {
          case 1 => sb.append("<w:rPr><w:b/></w:rPr>")
          case 2 => sb.append("<w:rPr><w:i/></w:rPr>")
          case _ =>
        }
        sb.append("<w:t xml:space=\"preserve\">").append(esc(text)).append("</w:t></w:r>")
      }
      sb.append("</w:p>")
    }

    para(Some("Title"), Seq((art.title.mkString(" "), 0)))
    art.pieces.foreach {
      case GHeading(level, ws) =>
        para(Some(s"Heading$level"), Seq((ws.mkString(" ").capitalize, 0)))
      case GPara(ss) =>
        val runs = ss.zipWithIndex.flatMap { case (sent, si) =>
          val kind = rnd.nextInt(8) match { case 0 => 1; case 1 => 2; case _ => 0 }
          val tail = if (si < ss.length - 1) ". " else "."
          Seq((sent.mkString(" ").capitalize, kind), (tail, 0))
        }
        para(None, runs)
      case GList(_, items) =>
        items.foreach(it => para(None, Seq(("- " + it.mkString(" "), 0))))
      case GTable(headers, rows) =>
        sb.append("<w:tbl>")
        def tr(cells: Seq[String]): Unit = {
          sb.append("<w:tr>")
          cells.foreach(c => sb.append("<w:tc><w:p><w:r><w:t>").append(esc(c)).append("</w:t></w:r></w:p></w:tc>"))
          sb.append("</w:tr>")
        }
        tr(headers)
        rows.foreach(tr)
        sb.append("</w:tbl>")
    }
    sb.append("</w:body></w:document>")

    zip(Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/><Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/></Types>""",
      "word/document.xml" -> sb.toString,
    ))
  }

  // ------------------------------------------------------------------ xlsx

  def renderXlsx(art: Article, rnd: Random): Array[Byte] = {
    // tables from the article; guarantee at least one
    val tables: Vector[GTable] = {
      val ts = art.pieces.collect { case t: GTable => t }
      if (ts.nonEmpty) ts.take(3)
      else Vector(GTable(Vector("Key", "Value"), Vector(Vector("total", (rnd.nextInt(9000) / 10.0).toString))))
    }
    val sharedB = Vector.newBuilder[String]
    var sharedIdx = Map.empty[String, Int]
    def sref(s: String): Int = sharedIdx.getOrElse(s, {
      val i = sharedIdx.size
      sharedIdx += s -> i
      sharedB += s
      i
    })

    val sheets = tables.zipWithIndex.map { case (t, si) =>
      val sb = new StringBuilder
      sb.append("<?xml version=\"1.0\"?><worksheet xmlns=\"http://schemas.openxmlformats.org/spreadsheetml/2006/main\"><sheetData>")
      def row(r: Int, cells: Seq[String]): Unit = {
        sb.append(s"""<row r="${r + 1}">""")
        cells.zipWithIndex.foreach { case (cell, ci) =>
          val ref = s"${('A' + ci).toChar}${r + 1}"
          cell.toDoubleOption match {
            case Some(_) => sb.append(s"""<c r="$ref"><v>$cell</v></c>""")
            case None => sb.append(s"""<c r="$ref" t="s"><v>${sref(cell)}</v></c>""")
          }
        }
        sb.append("</row>")
      }
      row(0, t.headers)
      t.rows.zipWithIndex.foreach { case (r, i) => row(i + 1, r) }
      sb.append("</sheetData></worksheet>")
      s"xl/worksheets/sheet${si + 1}.xml" -> sb.toString
    }

    val shared = sharedB.result()
    val ssXml = new StringBuilder
    ssXml.append(s"""<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="${shared.size}" uniqueCount="${shared.size}">""")
    shared.foreach(s => ssXml.append("<si><t>").append(esc(s)).append("</t></si>"))
    ssXml.append("</sst>")

    zip(Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/></Types>""",
      "xl/workbook.xml" ->
        s"""<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheets>${sheets.indices.map(i => s"""<sheet name="Sheet${i + 1}" sheetId="${i + 1}"/>""").mkString}</sheets></workbook>""",
      "xl/sharedStrings.xml" -> ssXml.toString,
    ) ++ sheets)
  }

  // ------------------------------------------------------------------ pptx

  def renderPptx(art: Article, rnd: Random): Array[Byte] = {
    // group pieces into slides: each heading starts a slide; cap 8 slides
    val slides = ArrayBufferOfSlides(art)
    val slideEntries = slides.zipWithIndex.map { case ((title, bodies), i) =>
      val sb = new StringBuilder
      sb.append("<?xml version=\"1.0\"?><p:sld xmlns:p=\"http://schemas.openxmlformats.org/presentationml/2006/main\" xmlns:a=\"http://schemas.openxmlformats.org/drawingml/2006/main\"><p:cSld><p:spTree>")
      sb.append("<p:sp><p:nvSpPr><p:nvPr><p:ph type=\"title\"/></p:nvPr></p:nvSpPr><p:txBody>")
      sb.append("<a:p><a:r><a:t>").append(esc(title)).append("</a:t></a:r></a:p></p:txBody></p:sp>")
      sb.append("<p:sp><p:nvSpPr><p:nvPr><p:ph type=\"body\"/></p:nvPr></p:nvSpPr><p:txBody>")
      bodies.foreach(b => sb.append("<a:p><a:r><a:t>").append(esc(b)).append("</a:t></a:r></a:p>"))
      sb.append("</p:txBody></p:sp></p:spTree></p:cSld></p:sld>")
      s"ppt/slides/slide${i + 1}.xml" -> sb.toString
    }
    zip(Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/><Override PartName="/ppt/presentation.xml" ContentType="application/vnd.openxmlformats-officedocument.presentationml.presentation.main+xml"/></Types>""",
      "ppt/presentation.xml" ->
        """<?xml version="1.0"?><p:presentation xmlns:p="http://schemas.openxmlformats.org/presentationml/2006/main"/>""",
    ) ++ slideEntries)
  }

  private def ArrayBufferOfSlides(art: Article): Vector[(String, Vector[String])] = {
    val slides = Vector.newBuilder[(String, Vector[String])]
    var current = (art.title.mkString(" "), Vector.newBuilder[String])
    var count = 1
    def flush(): Unit = slides += ((current._1, current._2.result()))
    art.pieces.foreach {
      case GHeading(_, ws) if count < 8 =>
        flush()
        current = (ws.mkString(" ").capitalize, Vector.newBuilder[String])
        count += 1
      case GPara(ss) =>
        current._2 += ss.map(s => s.mkString(" ").capitalize + ".").mkString(" ")
      case GList(_, items) =>
        items.foreach(it => current._2 += ("- " + it.mkString(" ")))
      case GTable(headers, rows) =>
        current._2 += (headers ++ rows.flatten).mkString(" | ")
      case _ =>
    }
    flush()
    slides.result()
  }
}
