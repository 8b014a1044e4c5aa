package graft

import graft.gen.CorpusGen
import graft.model._
import graft.pipeline.ExtractKernel
import graft.tools.GoldenGen
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The north-rule invariant: byte-identical extracted content per url vs the
  * frozen golden corpus (FIXTURES.md §4), across all output formats, chunk
  * configs, and table extraction. */
class GoldenSpec extends AnyFunSuite {

  private val goldenDir = Paths.get("src/test/resources/golden")

  private def golden(name: String): String =
    new String(Files.readAllBytes(goldenDir.resolve(name)), "UTF-8")

  test("goldens exist") {
    assert(Files.exists(goldenDir.resolve("0.md")), "run `sbt \"runMain graft.tools.GoldenGen\"` once")
  }

  for (i <- 0 until GoldenGen.UnitRows) {
    test(s"row $i byte-identical across formats") {
      val page = CorpusGen.pageFor(i.toLong)
      val md = ExtractKernel.extractOne(page, ConversionOptions(outputFormat = OutputFormat.Markdown))
      assert(md.status == TaskStatus.Completed, md.error)
      assert(md.content == golden(s"$i.md"), s"markdown mismatch row $i")

      val txt = ExtractKernel.extractOne(page, ConversionOptions(outputFormat = OutputFormat.Text, generateEmbeddings = true))
      assert(txt.content == golden(s"$i.txt"), s"text mismatch row $i")
      assert(GoldenGen.chunksJson(txt.chunks) == golden(s"$i.chunks.json"), s"chunks mismatch row $i")

      val dt = ExtractKernel.extractOne(page, ConversionOptions(outputFormat = OutputFormat.DocTags))
      assert(dt.content == golden(s"$i.doctags"), s"doctags mismatch row $i")

      val js = ExtractKernel.extractOne(page, ConversionOptions(outputFormat = OutputFormat.Json))
      assert(js.content == golden(s"$i.json"), s"json mismatch row $i")
      assert(GoldenGen.tablesJson(js.tables) == golden(s"$i.tables.json"), s"tables mismatch row $i")

      val alt = ExtractKernel.extractOne(page, ConversionOptions(outputFormat = OutputFormat.Text, chunkSize = 200, chunkOverlap = 25))
      assert(GoldenGen.chunksJson(alt.chunks) == golden(s"$i.chunks200.json"), s"chunks200 mismatch row $i")
    }
  }

  test("extraction is deterministic: 3 repeated runs bit-identical") {
    val page = CorpusGen.pageFor(7L) // pdf row
    val opts = ConversionOptions()
    val a = ExtractKernel.extractOne(page, opts)
    val b = ExtractKernel.extractOne(page, opts)
    val c = ExtractKernel.extractOne(page, opts)
    assert(a.content == b.content && b.content == c.content)
    assert(a.task_id == b.task_id)
  }

  test("chunk embeddings: blank -> zero vector, others L2-normalized, dim 384") {
    import graft.embed.HashEmbedder
    assert(HashEmbedder.embed("   \n\t ").forall(_ == 0f))
    val v = HashEmbedder.embed("hello world of spark")
    assert(v.length == 384)
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
    // deterministic across calls
    assert(v.sameElements(HashEmbedder.embed("hello world of spark")))
  }
}
