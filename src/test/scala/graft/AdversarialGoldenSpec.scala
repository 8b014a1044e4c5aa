package graft

import graft.gen.CorpusGen
import graft.model._
import graft.pipeline.ExtractKernel
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Byte-stability on hostile input (goldens under golden/adv_*): misnesting,
  * entity floods, giant tables, boilerplate traps, script soup, attr edge
  * cases, unicode, pre/code, empty docs. FuzzSpec proves no-crash; this
  * proves the OUTPUT is pinned. */
class AdversarialGoldenSpec extends AnyFunSuite {

  private val goldenDir = Paths.get("src/test/resources/golden")

  private def golden(name: String): String =
    new String(Files.readAllBytes(goldenDir.resolve(name)), "UTF-8")

  CorpusGen.adversarialPages.foreach { case (name, page) =>
    test(s"adversarial '$name' byte-identical (md/text/json)") {
      val md = ExtractKernel.extractOne(page, ConversionOptions(outputFormat = OutputFormat.Markdown))
      assert(md.status == TaskStatus.Completed, md.error)
      assert(md.content == golden(s"adv_$name.md"), s"markdown mismatch: $name")
      val txt = ExtractKernel.extractOne(page, ConversionOptions(outputFormat = OutputFormat.Text))
      assert(txt.content == golden(s"adv_$name.txt"), s"text mismatch: $name")
      val js = ExtractKernel.extractOne(page, ConversionOptions(outputFormat = OutputFormat.Json))
      assert(js.content == golden(s"adv_$name.json"), s"json mismatch: $name")
    }
  }

  test("boilerplate traps: nav/role/marker blocks dropped, article body kept") {
    val page = CorpusGen.adversarialPages.toMap.apply("boilerplate-traps")
    val md = ExtractKernel.extractOne(page, ConversionOptions()).content
    assert(md.contains("surviving article body paragraph"))
    assert(!md.contains("link farm") && !md.contains("role-marked") &&
      !md.contains("sidebar widget") && !md.contains("footer text"))
  }

  test("script soup: no script/style/comment/cdata content leaks") {
    val page = CorpusGen.adversarialPages.toMap.apply("script-soup")
    val md = ExtractKernel.extractOne(page, ConversionOptions()).content
    assert(md.contains("real paragraph one") && md.contains("real paragraph two"))
    assert(!md.contains("fake paragraph") && !md.contains("not a list") &&
      !md.contains("commented out") && !md.contains("cdata junk") &&
      !md.contains("template div") && !md.contains("noscript content"))
  }

  test("giant table: all 100 rows and 10 columns extracted as one table") {
    val page = CorpusGen.adversarialPages.toMap.apply("giant-table")
    val js = ExtractKernel.extractOne(page, ConversionOptions(outputFormat = OutputFormat.Json))
    assert(js.tables.length == 1)
    assert(js.tables.head.headers.length == 10)
    assert(js.tables.head.rows.length == 100)
  }
}
