package graft.gen

import graft.gen.CorpusGen._
import scala.collection.mutable.ArrayBuffer
import scala.util.Random
import java.text.Normalizer

/** Minimal uncompressed PDF 1.4 writer (FIXTURES.md §3): xref table, page
  * tree (1-5 pages), one content stream per page, Helvetica (/F1) +
  * Helvetica-Bold (/F2), text via BT/ET with Tm, Td, TD, T-star, Tj, TJ.
  * Exercised layout features:
  *  - two-column pages with the RIGHT column emitted first in the stream
  *    (reading-order recovery must restore left-then-right);
  *  - file-level object order shuffled vs logical order (xref still valid);
  *  - grid-aligned runs forming tables (x-alignment clustering target);
  *  - headings in bold at larger sizes (20/16/14) vs 11pt body.
  * ASCII-only text (accents transliterated) — the Helvetica subset.
  */
object PdfGen {

  private val PageW = 612
  private val PageH = 792
  private val Margin = 72f
  private val BodySize = 11
  private val Leading = 14f
  private val TitleSize = 20
  private val ColSplitX = 320f // right column x in two-column mode
  private val ColWidth1 = 468f // single column width
  private val ColWidth2 = 228f // each column in two-column mode

  /** A positioned text run: one (x, y, size, bold, text). */
  private final case class Run(x: Float, y: Float, size: Int, bold: Boolean, text: String)

  def render(art: Article, rnd: Random): Array[Byte] = {
    val twoCol = rnd.nextInt(3) == 0 // 1/3 of PDFs are two-column
    val colW = if (twoCol) ColWidth2 else ColWidth1
    val charW = 0.55f // Helvetica approx avg char width in em
    def maxChars(size: Int): Int = math.max(8, (colW / (size * charW)).toInt)

    // --- lay out the article into pages of runs ---
    val pages = ArrayBuffer(ArrayBuffer.empty[Run])
    var col = 0 // 0 = left, 1 = right (two-col only)
    var x = Margin
    var y = PageH - Margin

    def newPageOrCol(): Unit = {
      if (twoCol && col == 0) { col = 1; x = ColSplitX; y = PageH - Margin }
      else { pages += ArrayBuffer.empty[Run]; col = 0; x = Margin; y = PageH - Margin }
    }
    def ensure(h: Float): Unit = if (y - h < Margin) newPageOrCol()
    def emitLine(text: String, size: Int, bold: Boolean, indent: Float = 0f): Unit = {
      ensure(Leading)
      pages.last += Run(x + indent, y, size, bold, text)
      y -= (if (size > BodySize) size * 1.3f else Leading)
    }
    def emitWrapped(words: Seq[String], size: Int, bold: Boolean, prefix: String = ""): Unit = {
      val limit = maxChars(size)
      val line = new StringBuilder(prefix)
      words.foreach { w0 =>
        val w = ascii(w0)
        if (line.nonEmpty && line.length + 1 + w.length > limit) {
          emitLine(line.toString, size, bold)
          line.clear()
        }
        if (line.nonEmpty) line.append(' ')
        line.append(w)
      }
      if (line.nonEmpty) emitLine(line.toString, size, bold)
    }

    // title
    emitWrapped(art.title, TitleSize, bold = true)
    y -= Leading / 2

    art.pieces.foreach {
      case GHeading(level, ws) =>
        val size = if (level <= 2) 16 else 14
        ensure(size * 2f)
        y -= Leading / 2
        emitWrapped(Seq(ws.mkString(" ").capitalize), size, bold = true)
      case GPara(ss) =>
        val sentText = ss.map(s => s.mkString(" ") + ".").map(s => s.headOption.map(c => c.toUpper.toString + s.tail).getOrElse(s))
        emitWrapped(sentText.mkString(" ").split(' ').toSeq, BodySize, bold = false)
        y -= Leading / 2
      case GList(_, items) =>
        items.foreach { it => emitWrapped(("-" +: it).map(ascii), BodySize, bold = false) }
        y -= Leading / 2
      case GTable(headers, rows) =>
        // grid-aligned cells; clamp to what fits the column
        val nCols = math.min(headers.length, math.max(2, (colW / 110).toInt))
        val cellXs = (0 until nCols).map(c => x + c * 110f)
        def tableRow(cells: Seq[String], bold: Boolean): Unit = {
          ensure(Leading)
          cells.take(nCols).zip(cellXs).foreach { case (cell, cx) =>
            pages.last += Run(cx, y, BodySize, bold, ascii(cell).take(16))
          }
          y -= Leading
        }
        tableRow(headers, bold = true)
        rows.foreach(r => tableRow(r, bold = false))
        y -= Leading / 2
    }

    // --- content streams (right column first in two-col mode: the
    //     out-of-order exercise; within a column, top-down) ---
    val streams = pages.map { runs =>
      val ordered =
        if (twoCol) {
          val (left, right) = runs.partition(_.x < ColSplitX - 1)
          right ++ left
        } else runs
      renderStream(ordered.toSeq, rnd)
    }

    assemble(streams.toSeq, rnd)
  }

  /** Serialize runs to a content stream, alternating positioning styles so
    * the parser must handle Tm, Td, TD/T*, Tj and array-TJ. */
  private def renderStream(runs: Seq[Run], rnd: Random): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < runs.length) {
      val r = runs(i)
      val style = rnd.nextInt(3)
      val font = if (r.bold) "/F2" else "/F1"
      style match {
        case 0 =>
          // absolute Tm + single Tj
          sb.append("BT\n").append(font).append(' ').append(r.size).append(" Tf\n")
          sb.append(f"1 0 0 1 ${r.x}%.1f ${r.y}%.1f Tm\n")
          sb.append('(').append(escape(r.text)).append(") Tj\nET\n")
          i += 1
        case 1 =>
          // TD (sets leading) + T* chain over consecutive same-column body runs
          sb.append("BT\n").append(font).append(' ').append(r.size).append(" Tf\n")
          sb.append(f"${r.x}%.1f ${r.y}%.1f Td\n")
          sb.append(f"0 ${-Leading}%.1f TD\n") // set leading via TD (moves down once)
          // TD already moved one line down; rewind with Td to stay on r.y
          sb.append(f"0 ${Leading}%.1f Td\n")
          sb.append('(').append(escape(r.text)).append(") Tj\n")
          var j = i + 1
          var expectedY = r.y - Leading
          while (j < runs.length && runs(j).x == r.x && runs(j).size == r.size &&
                 runs(j).bold == r.bold && math.abs(runs(j).y - expectedY) < 0.01f) {
            sb.append("T*\n(").append(escape(runs(j).text)).append(") Tj\n")
            expectedY -= Leading
            j += 1
          }
          sb.append("ET\n")
          i = j
        case _ =>
          // array TJ with kerning splits
          sb.append("BT\n").append(font).append(' ').append(r.size).append(" Tf\n")
          sb.append(f"1 0 0 1 ${r.x}%.1f ${r.y}%.1f Tm\n")
          val t = r.text
          if (t.length > 6) {
            val cut = t.length / 2
            sb.append("[(").append(escape(t.substring(0, cut))).append(") -10 (")
              .append(escape(t.substring(cut))).append(")] TJ\nET\n")
          } else {
            sb.append("[(").append(escape(t)).append(")] TJ\nET\n")
          }
          i += 1
      }
    }
    sb.toString
  }

  /** Assemble the file: catalog(1), pages(2), per-page page+stream objects,
    * fonts. Object ordering in the FILE BODY is shuffled; xref is correct. */
  private def assemble(streams: Seq[String], rnd: Random): Array[Byte] = {
    val nPages = streams.length
    val fontF1 = 3 + 2 * nPages
    val fontF2 = fontF1 + 1
    val nObjs = fontF2 // object count (ids 1..fontF2)

    val bodies = new Array[String](nObjs + 1) // 1-based
    bodies(1) = "<< /Type /Catalog /Pages 2 0 R >>"
    val kids = (0 until nPages).map(p => s"${3 + 2 * p} 0 R").mkString(" ")
    bodies(2) = s"<< /Type /Pages /Kids [$kids] /Count $nPages >>"
    for (p <- 0 until nPages) {
      val pageId = 3 + 2 * p
      val streamId = pageId + 1
      bodies(pageId) =
        s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 $PageW $PageH] /Contents $streamId 0 R " +
          s"/Resources << /Font << /F1 $fontF1 0 R /F2 $fontF2 0 R >> >> >>"
      val s = streams(p)
      bodies(streamId) = s"<< /Length ${s.length} >>\nstream\n${s}endstream"
    }
    bodies(fontF1) = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    bodies(fontF2) = "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >>"

    // shuffle file order of objects
    val order = rnd.shuffle((1 to nObjs).toVector)
    val sb = new StringBuilder
    sb.append("%PDF-1.4\n")
    val offsets = new Array[Int](nObjs + 1)
    order.foreach { id =>
      offsets(id) = sb.length
      sb.append(id).append(" 0 obj\n").append(bodies(id)).append("\nendobj\n")
    }
    val xrefPos = sb.length
    sb.append("xref\n0 ").append(nObjs + 1).append('\n')
    sb.append("0000000000 65535 f \n")
    for (id <- 1 to nObjs) sb.append(f"${offsets(id)}%010d 00000 n \n")
    sb.append("trailer\n<< /Size ").append(nObjs + 1).append(" /Root 1 0 R >>\n")
    sb.append("startxref\n").append(xrefPos).append("\n%%EOF\n")
    sb.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  private def escape(s: String): String =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  /** Transliterate to the ASCII/Helvetica subset. */
  def ascii(s: String): String = {
    val norm = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new StringBuilder(norm.length)
    norm.foreach { c =>
      if (c < 128) sb.append(c)
      else if (Character.getType(c) != Character.NON_SPACING_MARK.toInt) {
        c match {
          case 'ß' => sb.append("ss")
          case _ => // drop other non-ascii
        }
      }
    }
    sb.toString
  }
}
