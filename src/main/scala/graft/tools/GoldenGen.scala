package graft.tools

import graft.export.JsonSerializer.jstr
import graft.gen.CorpusGen
import graft.model._
import graft.pipeline.ExtractKernel
import java.nio.file.{Files, Paths, Path}

/** Golden-fixture writer (FIXTURES.md §4): extracts the 64 sf-unit pages in
  * every output format and freezes the bytes under
  * src/test/resources/golden/. Run ONCE, hand-audit, commit; serializer
  * changes require regenerating and re-auditing (breaking change).
  * Usage: sbt "runMain graft.tools.GoldenGen [outDir]"
  */
object GoldenGen {

  val UnitRows = 64

  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args.headOption.getOrElse("src/test/resources/golden"))
    Files.createDirectories(outDir)
    for (i <- 0 until UnitRows) {
      val page = CorpusGen.pageFor(i.toLong)
      write(outDir, s"$i.md", ExtractKernel.extractOne(page, ConversionOptions(outputFormat = OutputFormat.Markdown)).content)
      val txtRes = ExtractKernel.extractOne(page, ConversionOptions(outputFormat = OutputFormat.Text, generateEmbeddings = true))
      write(outDir, s"$i.txt", txtRes.content)
      write(outDir, s"$i.doctags", ExtractKernel.extractOne(page, ConversionOptions(outputFormat = OutputFormat.DocTags)).content)
      val jsonRes = ExtractKernel.extractOne(page, ConversionOptions(outputFormat = OutputFormat.Json))
      write(outDir, s"$i.json", jsonRes.content)
      // chunks for the default (512/50) and one non-default (200/25) pair, over text output
      write(outDir, s"$i.chunks.json", chunksJson(txtRes.chunks))
      val alt = ExtractKernel.extractOne(page, ConversionOptions(outputFormat = OutputFormat.Text, chunkSize = 200, chunkOverlap = 25))
      write(outDir, s"$i.chunks200.json", chunksJson(alt.chunks))
      write(outDir, s"$i.tables.json", tablesJson(jsonRes.tables))
    }
    // adversarial handcrafted cases (SURVEY.md §9 lever 3): md/text/json per case
    CorpusGen.adversarialPages.foreach { case (name, page) =>
      write(outDir, s"adv_$name.md", ExtractKernel.extractOne(page, ConversionOptions(outputFormat = OutputFormat.Markdown)).content)
      write(outDir, s"adv_$name.txt", ExtractKernel.extractOne(page, ConversionOptions(outputFormat = OutputFormat.Text)).content)
      write(outDir, s"adv_$name.json", ExtractKernel.extractOne(page, ConversionOptions(outputFormat = OutputFormat.Json)).content)
    }
    println(s"goldens written for $UnitRows rows + ${CorpusGen.adversarialPages.size} adversarial cases under $outDir")
  }

  def chunksJson(chunks: Seq[Chunk]): String =
    chunks.map { c =>
      val emb = if (c.embedding.nonEmpty)
        c.embedding.take(8).map(f => f"$f%.6f").mkString("[", ",", ",...]") // prefix fingerprint
      else "[]"
      s"""{"id": ${jstr(c.id)}, "chunk_index": ${c.chunk_index}, "char_start": ${c.char_start}, "char_end": ${c.char_end}, "chunk_size": ${c.chunk_size}, "content": ${jstr(c.content)}, "embedding_prefix": ${jstr(emb)}}"""
    }.mkString("[\n", ",\n", "\n]")

  def tablesJson(tables: Seq[TableData]): String =
    tables.map { t =>
      val rows = t.rows.map(r => r.map(jstr).mkString("[", ", ", "]")).mkString("[", ", ", "]")
      s"""{"id": ${jstr(t.id)}, "page": ${t.page.map(_.toString).getOrElse("null")}, "headers": ${t.headers.map(jstr).mkString("[", ", ", "]")}, "rows": $rows, "markdown": ${jstr(t.markdown)}}"""
    }.mkString("[\n", ",\n", "\n]")

  private def write(dir: Path, name: String, content: String): Unit =
    Files.write(dir.resolve(name), Option(content).getOrElse("").getBytes("UTF-8"))
}
