package graft.tools

import graft.gen.CorpusGen
import graft.pdf.PdfParser

/** Stage-level cost breakdown inside PdfParser (pure JVM): decodes where
  * the per-doc µs goes (object scan + dict regex vs content-stream lexing
  * vs layout) so optimization lands where the time is.
  * sbt "runMain graft.tools.PdfProbe [nPdfDocs]" */
object PdfProbe {
  def main(args: Array[String]): Unit = {
    val want = args.headOption.map(_.toInt).getOrElse(4000)
    val pdfs = Iterator.from(0).map(_.toLong).filter(CorpusGen.isPdfRow)
      .take(want).map(i => CorpusGen.pageFor(i)).toArray
    // warmup
    pdfs.take(500).foreach(p => PdfParser.parse(p.html, "f.pdf"))

    var tParse = 0L; var tScan = 0L; var tInterp = 0L; var tDecode = 0L; var tLayout = 0L
    pdfs.foreach { p =>
      val t0 = System.nanoTime()
      PdfParser.parse(p.html, "f.pdf")
      tParse += System.nanoTime() - t0

      val td = System.nanoTime()
      val s = new String(p.html, java.nio.charset.StandardCharsets.ISO_8859_1)
      tDecode += System.nanoTime() - td
      val t1 = System.nanoTime()
      val objs = PdfParser.scanObjects(s)
      tScan += System.nanoTime() - t1
      val streams = objs.values.flatMap(_.stream)
      val t2 = System.nanoTime()
      val runs = streams.map(PdfParser.interpret)
      tInterp += System.nanoTime() - t2
      val t3 = System.nanoTime()
      runs.zipWithIndex.foreach { case (r, pg) => PdfParser.layout(r, 612f, pg + 1) }
      tLayout += System.nanoTime() - t3
    }
    val n = pdfs.length.toDouble
    println(f"docs=${pdfs.length} total=${tParse / 1000 / n}%.1fus/doc  decode=${tDecode / 1000 / n}%.1fus  scanObjects=${tScan / 1000 / n}%.1fus  interpret=${tInterp / 1000 / n}%.1fus  layout=${tLayout / 1000 / n}%.1fus  rest=${(tParse - tDecode - tScan - tInterp - tLayout) / 1000 / n}%.1fus")
  }
}
