package graft.tools

import graft.model.{ConversionOptions, DocumentType, OutputFormat}
import graft.pipeline.{ExtractKernel, TypeDetector}

/** Single-threaded phase-attribution profiler for the extraction kernel —
  * answers "where does a page's kernel time go" (detect / parse /
  * serialize / strip / tables / chunk / embed) without any Spark noise, so
  * headline-path optimization targets the right stage (guide §1: measure
  * first). Pages come from deterministic CorpusGen ids, the same
  * distribution as the bench corpus.
  *
  *   sbt "runMain graft.tools.KernelProfile [nPages] [reps]"
  */
object KernelProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(4000)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val pages = (0 until n).map(i => graft.gen.CorpusGen.pageFor(i.toLong)).toArray

    // full-kernel throughput reference (per rep)
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      var completed = 0
      pages.foreach { p =>
        val res = ExtractKernel.extractOne(p, ConversionOptions())
        if (res.status == graft.model.TaskStatus.Completed) completed += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[kprof] rep=$r full-kernel: $n pages in $sec%.3f s = ${n / sec}%.0f pages/s ($completed completed)")
    }

    // phase attribution (last rep's measurements, warm JIT)
    var tDetect = 0L; var tParse = 0L; var tMd = 0L; var tTables = 0L
    var tChunk = 0L; var tEmbed = 0L; var tTree = 0L; var tBlocks = 0L
    val byType = new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
    val opts = ConversionOptions()
    pages.foreach { p =>
      var t = System.nanoTime()
      val docType = TypeDetector.detect(p.html, p.url)
      tDetect += System.nanoTime() - t
      try {
        t = System.nanoTime()
        val doc = docType match {
          case DocumentType.Html =>
            val html = new String(p.html, java.nio.charset.StandardCharsets.UTF_8)
            val t1 = System.nanoTime()
            val tree = graft.html.TreeBuilder.parse(html)
            tTree += System.nanoTime() - t1
            val t2 = System.nanoTime()
            val d2 = graft.html.BlockExtractor.extract(tree, "f", opts.extractImages)
            tBlocks += System.nanoTime() - t2
            d2
          case DocumentType.Pdf => graft.pdf.PdfParser.parse(p.html, "f")
          case DocumentType.Docx => graft.ooxml.OoxmlParser.parseDocx(p.html, "f")
          case DocumentType.Xlsx => graft.ooxml.OoxmlParser.parseXlsx(p.html, "f")
          case DocumentType.Pptx => graft.ooxml.OoxmlParser.parsePptx(p.html, "f")
          case DocumentType.Md => graft.mdparse.MarkdownParser.parse(new String(p.html, java.nio.charset.StandardCharsets.UTF_8), "f")
          case DocumentType.Asciidoc => graft.mdparse.AsciidocParser.parse(new String(p.html, java.nio.charset.StandardCharsets.UTF_8), "f")
          case _ => graft.model.DocModel("f", DocumentType.Image, 1, Vector.empty)
        }
        val dt = System.nanoTime() - t
        tParse += dt
        byType.merge(docType, dt, (a: java.lang.Long, b: java.lang.Long) => a + b)
        t = System.nanoTime()
        val md = graft.export.MarkdownSerializer.serialize(doc)
        tMd += System.nanoTime() - t
        t = System.nanoTime()
        val tables = doc.blocks.collect { case tb: graft.model.TableBlock => tb }
        tTables += System.nanoTime() - t
        t = System.nanoTime()
        val chunks = graft.chunk.Chunker.chunkText(md, opts.chunkSize, opts.chunkOverlap)
        tChunk += System.nanoTime() - t
        t = System.nanoTime()
        if (opts.generateEmbeddings)
          chunks.foreach(c => graft.embed.HashEmbedder.embed(c.text, opts.embeddingDim))
        tEmbed += System.nanoTime() - t
        val _ = (md, tables)
      } catch { case _: Throwable => () }
    }
    def ms(x: Long) = x / 1e6
    println(f"[kprof] phases over $n pages (ms): detect=${ms(tDetect)}%.0f parse=${ms(tParse)}%.0f (tree=${ms(tTree)}%.0f blocks=${ms(tBlocks)}%.0f) markdown=${ms(tMd)}%.0f tables=${ms(tTables)}%.0f chunk=${ms(tChunk)}%.0f embed=${ms(tEmbed)}%.0f")
    val it = byType.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); println(f"[kprof] parse by type: ${e.getKey}%-9s ${ms(e.getValue)}%.0f ms") }
  }
}
