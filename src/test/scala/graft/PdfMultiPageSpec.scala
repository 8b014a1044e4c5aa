package graft

import graft.gen.CorpusGen
import graft.model.ConversionOptions
import graft.pipeline.ExtractKernel
import org.scalatest.funsuite.AnyFunSuite

/** PDF page-tree metadata: multi-page documents report real page counts
  * (metadata analog of transcribe.py:269-276). */
class PdfMultiPageSpec extends AnyFunSuite {
  test("heavy-tail pdf rows produce multi-page documents with correct metadata") {
    val pdfRows = (0L until 600L).filter(CorpusGen.isPdfRow)
    val counts = pdfRows.map { i =>
      val r = ExtractKernel.extractOne(CorpusGen.pageFor(i), ConversionOptions())
      assert(r.status == "completed", s"row $i: ${r.error}")
      assert(r.metadata("page_count") == r.page_count.toString)
      r.page_count
    }
    assert(counts.forall(_ >= 1))
    assert(counts.exists(_ > 1), s"expected some multi-page pdfs in the tail, got max=${counts.max}")
  }
}
