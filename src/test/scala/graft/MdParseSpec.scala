package graft

import graft.export.MarkdownSerializer
import graft.gen.{CorpusGen, TextDocGen}
import graft.mdparse.{AsciidocParser, MarkdownParser}
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** Markdown / AsciiDoc parser round trips and edge cases. */
class MdParseSpec extends AnyFunSuite {

  test("markdown round trip: parse(serialize(doc)) == doc, across 40 articles") {
    for (i <- 0 until 40) {
      val doc = TextDocGen.docModelOf(CorpusGen.articleFor(i.toLong, CorpusGen.DefaultSeed), DocumentType.Md)
      val md = MarkdownSerializer.serialize(doc)
      val parsed = MarkdownParser.parse(md, "fb")
      assert(parsed.blocks == doc.blocks, s"roundtrip mismatch for article $i")
      // and the serialization is a fixpoint
      assert(MarkdownSerializer.serialize(parsed) == md)
    }
  }

  test("markdown: code fences, escaped pipes, soft-wrapped paragraphs") {
    val md = "# T\n\npara line one\nline two\n\n```\ncode | with pipe\n# not a heading\n```\n\n| a\\|b | c |\n| --- | --- |\n| 1 | 2 |"
    val doc = MarkdownParser.parse(md, "fb")
    assert(doc.blocks(0) == HeadingBlock(1, "T"))
    assert(doc.blocks(1) == ParaBlock("para line one line two"))
    assert(doc.blocks(2) == CodeBlock("code | with pipe\n# not a heading"))
    assert(doc.blocks(3) == TableBlock(Vector("a|b", "c"), Vector(Vector("1", "2")), None))
    assert(doc.name == "T")
  }

  test("markdown: ordered vs unordered lists") {
    val doc = MarkdownParser.parse("1. one\n2. two\n\n- a\n- b", "fb")
    assert(doc.blocks(0) == ListBlock(ordered = true, Vector("one", "two")))
    assert(doc.blocks(1) == ListBlock(ordered = false, Vector("a", "b")))
  }

  test("asciidoc round trip on generated corpus articles") {
    for (i <- Seq(16L, 41L, 66L)) { // adoc rows (i%25==16)
      val art = CorpusGen.articleFor(i, CorpusGen.DefaultSeed)
      val doc = TextDocGen.docModelOf(art, DocumentType.Asciidoc)
      val parsed = AsciidocParser.parse(new String(TextDocGen.renderAdoc(art), "UTF-8"), "fb")
      assert(parsed.blocks == doc.blocks, s"adoc roundtrip mismatch for article $i")
      assert(parsed.name == art.title.mkString(" "))
    }
  }

  test("asciidoc basics") {
    val doc = AsciidocParser.parse("= Doc\n\n== Sec\n\npara text\nwrapped\n\n* x\n* y\n\n|===\n|H1 |H2\n|a |b\n|===", "fb")
    assert(doc.blocks == Vector(
      HeadingBlock(1, "Doc"), HeadingBlock(2, "Sec"), ParaBlock("para text wrapped"),
      ListBlock(ordered = false, Vector("x", "y")),
      TableBlock(Vector("H1", "H2"), Vector(Vector("a", "b")), None)))
  }

  test("md/adoc rows flow through the kernel") {
    val mdPage = CorpusGen.pageFor(9) // md row
    val r1 = graft.pipeline.ExtractKernel.extractOne(mdPage, ConversionOptions())
    assert(r1.status == TaskStatus.Completed && r1.document_type == DocumentType.Md)
    assert(r1.content.startsWith("# "))
    val adocPage = CorpusGen.pageFor(16) // adoc row
    val r2 = graft.pipeline.ExtractKernel.extractOne(adocPage, ConversionOptions())
    assert(r2.status == TaskStatus.Completed && r2.document_type == DocumentType.Asciidoc)
    assert(r2.content.nonEmpty)
  }
}
