package graft.tools

import graft.chunk.Chunker
import graft.export.MarkdownSerializer
import graft.gen.CorpusGen
import graft.html.{BlockExtractor, TreeBuilder}
import graft.model.ConversionOptions
import graft.pipeline.ExtractKernel

/** Stage-level cost breakdown of the HTML kernel path (pure JVM): html is
  * ~60% of total kernel time (TypeProbe), so this decides where the next
  * headline-throughput optimization lands — decode vs tokenizer/DOM vs
  * block extraction vs markdown export vs chunking.
  * sbt "runMain graft.tools.HtmlProbe [nHtmlDocs]" */
object HtmlProbe {
  def main(args: Array[String]): Unit = {
    val want = args.headOption.map(_.toInt).getOrElse(12000)
    val opts = ConversionOptions()
    val pages = Iterator.from(0).map(_.toLong)
      .filter(i => CorpusGen.docTypeFor(i) == "html")
      .take(want).map(i => CorpusGen.pageFor(i)).toArray
    pages.take(2000).foreach(p => ExtractKernel.extractOne(p, opts)) // warmup

    var tKernel = 0L; var tDecode = 0L; var tParse = 0L; var tExtract = 0L
    var tMd = 0L; var tChunk = 0L
    pages.foreach { p =>
      val t0 = System.nanoTime()
      ExtractKernel.extractOne(p, opts)
      tKernel += System.nanoTime() - t0

      val td = System.nanoTime()
      val html = new String(p.html, java.nio.charset.StandardCharsets.UTF_8)
      tDecode += System.nanoTime() - td
      val t1 = System.nanoTime()
      val root = TreeBuilder.parse(html)
      tParse += System.nanoTime() - t1
      val t2 = System.nanoTime()
      val doc = BlockExtractor.extract(root, "f.html", opts.extractImages)
      tExtract += System.nanoTime() - t2
      val t3 = System.nanoTime()
      val md = MarkdownSerializer.serialize(doc)
      tMd += System.nanoTime() - t3
      val t4 = System.nanoTime()
      Chunker.chunkText(md, opts.chunkSize, opts.chunkOverlap)
      tChunk += System.nanoTime() - t4
    }
    val n = pages.length.toDouble
    println(f"docs=${pages.length} kernel=${tKernel / 1000 / n}%.1fus/doc  decode=${tDecode / 1000 / n}%.1fus  parse=${tParse / 1000 / n}%.1fus  extract=${tExtract / 1000 / n}%.1fus  markdown=${tMd / 1000 / n}%.1fus  chunk=${tChunk / 1000 / n}%.1fus  rest=${(tKernel - tDecode - tParse - tExtract - tMd - tChunk) / 1000 / n}%.1fus")
  }
}
