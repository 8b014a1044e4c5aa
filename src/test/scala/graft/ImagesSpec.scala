package graft

import graft.html.{BlockExtractor, TreeBuilder}
import graft.model._
import org.scalatest.funsuite.AnyFunSuite

/** extract_images option (reference: app/models.py:49-52) — off by default
  * (goldens pin that), on renders markdown image spans. */
class ImagesSpec extends AnyFunSuite {

  private val html =
    """<html><body><p>Before <img src="/pic.png" alt="a chart"> after the image here.</p>
      |<p>Data-uri <img src="data:image/png;base64,AAA" alt="inline"> skipped always ok.</p>
      |<p>No src <img alt="ghost"> stays out of the text flow.</p></body></html>""".stripMargin

  private def para(doc: DocModel, i: Int): String =
    doc.blocks.collect { case ParaBlock(t) => t }(i)

  test("default (extract_images=false): images skipped, text unchanged") {
    val doc = BlockExtractor.extract(TreeBuilder.parse(html), "f")
    assert(para(doc, 0) == "Before after the image here.")
  }

  test("extract_images=true: markdown image span with alt and src") {
    val doc = BlockExtractor.extract(TreeBuilder.parse(html), "f", extractImages = true)
    assert(para(doc, 0) == "Before ![a chart](/pic.png) after the image here.")
    // data: URIs and srcless imgs stay out either way
    assert(para(doc, 1) == "Data-uri skipped always ok.")
    assert(para(doc, 2) == "No src stays out of the text flow.")
  }

  test("span-breaking characters are escaped (ADVICE r1)") {
    val tricky =
      """<html><body><p>X <img src="/a b/c(1).png" alt="fig] caption"> Y.</p></body></html>"""
    val doc = BlockExtractor.extract(TreeBuilder.parse(tricky), "f", extractImages = true)
    // ']' in alt escaped; url with spaces/parens goes angle-bracketed
    assert(para(doc, 0) == "X ![fig\\] caption](</a b/c(1).png>) Y.")
  }

  test("kernel honors ConversionOptions.extractImages") {
    val page = Page("https://x.example/a.html", new java.sql.Timestamp(0L),
      html.getBytes("UTF-8"), "", "en")
    val off = graft.pipeline.ExtractKernel.extractOne(page, ConversionOptions())
    val on = graft.pipeline.ExtractKernel.extractOne(page, ConversionOptions(extractImages = true))
    assert(!off.content.contains("!["))
    assert(on.content.contains("![a chart](/pic.png)"))
  }
}
