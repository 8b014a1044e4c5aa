package graft

import graft.gen.{CorpusGen, OoxmlGen}
import graft.model._
import graft.ooxml.OoxmlParser
import graft.pipeline.{ExtractKernel, TypeDetector}
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** OOXML (docx/xlsx/pptx) generator→parser roundtrip + options semantics. */
class OoxmlSpec extends AnyFunSuite {

  private def art(i: Long) = CorpusGen.articleFor(i, CorpusGen.DefaultSeed)

  test("docx roundtrip: title, headings, paragraphs, tables recovered") {
    val a = art(3)
    val bytes = OoxmlGen.renderDocx(a, new Random(1))
    assert(TypeDetector.sniff(bytes).contains(DocumentType.Docx))
    val doc = OoxmlParser.parseDocx(bytes, "fb")
    assert(doc.name == a.title.mkString(" "))
    assert(doc.blocks.head == HeadingBlock(1, a.title.mkString(" ")))
    val genHeadings = a.pieces.collect { case CorpusGen.GHeading(l, ws) => (l, ws.mkString(" ").capitalize) }
    val parsedHeadings = doc.blocks.collect { case HeadingBlock(l, t) if l > 1 => (l, t) }
    assert(parsedHeadings == genHeadings)
    val genTables = a.pieces.collect { case t: CorpusGen.GTable => t }
    val parsedTables = doc.blocks.collect { case t: TableBlock => t }
    assert(parsedTables.map(_.headers) == genTables.map(_.headers))
    assert(parsedTables.map(_.rows) == genTables.map(_.rows))
  }

  test("xlsx roundtrip: one table per sheet, shared strings + numbers") {
    val a = art(13)
    val bytes = OoxmlGen.renderXlsx(a, new Random(1))
    assert(TypeDetector.sniff(bytes).contains(DocumentType.Xlsx))
    val doc = OoxmlParser.parseXlsx(bytes, "fb")
    val genTables = a.pieces.collect { case t: CorpusGen.GTable => t }.take(3)
    val parsed = doc.blocks.collect { case t: TableBlock => t }
    assert(parsed.nonEmpty)
    if (genTables.nonEmpty) {
      assert(parsed.map(_.headers) == genTables.map(_.headers))
      assert(parsed.map(_.rows) == genTables.map(_.rows))
    }
    assert(doc.pageCount == parsed.length)
  }

  test("pptx roundtrip: slides in order, titles as headings") {
    val a = art(21)
    val bytes = OoxmlGen.renderPptx(a, new Random(1))
    assert(TypeDetector.sniff(bytes).contains(DocumentType.Pptx))
    val doc = OoxmlParser.parsePptx(bytes, "fb")
    assert(doc.name == a.title.mkString(" "))
    assert(doc.pageCount >= 1)
    assert(doc.blocks.head == HeadingBlock(2, a.title.mkString(" ")))
  }

  test("corrupt zip -> failed row via kernel, not a crash") {
    val page = Page("https://x/bad.docx", new java.sql.Timestamp(0),
      Array[Byte]('P', 'K', 3, 4, 'w', 'o', 'r', 'd', '/', 0, 1, 2), "", "en")
    val r = ExtractKernel.extractOne(page, ConversionOptions())
    assert(r.status == TaskStatus.Failed && r.error.isDefined)
  }

  test("options: extract_tables=false yields no tables; doc with tables keeps them otherwise") {
    val page = CorpusGen.pageFor(13) // xlsx row — guaranteed tables
    val withT = ExtractKernel.extractOne(page, ConversionOptions(extractTables = true))
    val withoutT = ExtractKernel.extractOne(page, ConversionOptions(extractTables = false))
    assert(withT.tables.nonEmpty)
    assert(withoutT.tables.isEmpty)
    assert(withT.content == withoutT.content) // content unaffected
  }

  test("options: chunk/overlap bounds enforced (models.py:62-73 semantics)") {
    intercept[IllegalArgumentException](ConversionOptions(chunkSize = 99))
    intercept[IllegalArgumentException](ConversionOptions(chunkSize = 4097))
    intercept[IllegalArgumentException](ConversionOptions(chunkOverlap = 501))
    intercept[IllegalArgumentException](ConversionOptions(outputFormat = "pdfx"))
  }

  test("options: generate_embeddings toggles chunk vectors") {
    val page = CorpusGen.pageFor(0)
    val on = ExtractKernel.extractOne(page, ConversionOptions(generateEmbeddings = true))
    val off = ExtractKernel.extractOne(page, ConversionOptions(generateEmbeddings = false))
    assert(on.chunks.forall(_.embedding.length == 384))
    assert(off.chunks.forall(_.embedding.isEmpty))
  }
}
