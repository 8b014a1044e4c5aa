package graft

import graft.core.Json
import graft.html.Entities
import org.scalatest.funsuite.AnyFunSuite

/** Entity decoding + the manifest JSON util. */
class EntitiesSpec extends AnyFunSuite {

  test("named, numeric, hex references") {
    assert(Entities.decode("a &amp; b &lt;c&gt; &quot;d&quot;") == "a & b <c> \"d\"")
    assert(Entities.decode("&#65;&#x42;&#x63;") == "ABc")
    assert(Entities.decode("x&nbsp;y") == "x y") // NBSP normalized to space by spec
    assert(Entities.decode("&euro;100, &copy; 2025") == "€100, © 2025")
  }

  test("HTML4 extended named set: Latin-1, symbols, Greek, case-sensitive") {
    assert(Entities.decode("&Eacute;l&eacute;phant") == "Éléphant")
    assert(Entities.decode("&frac12; + &frac14; = &frac34;") == "½ + ¼ = ¾")
    assert(Entities.decode("&alpha;&beta;&Gamma; &rarr; &infin;") == "αβΓ → ∞")
    assert(Entities.decode("&Oslash; vs &oslash;") == "Ø vs ø") // names are case-sensitive
    assert(Entities.decode("5&thinsp;000") == "5 000")
    assert(Entities.decode("&ndash;&mdash;&permil;") == "–—‰")
  }

  test("unknown / malformed refs stay literal") {
    assert(Entities.decode("&unknown; &amp") == "&unknown; &amp")
    assert(Entities.decode("&;") == "&;")
    assert(Entities.decode("a & b") == "a & b")
    assert(Entities.decode("&#xZZ;") == "&#xZZ;")
    assert(Entities.decode("&#0;&#x110000;") == "&#0;&#x110000;") // invalid code points
  }

  test("no-& fast path returns the same instance") {
    val s = "plain text"
    assert(Entities.decode(s) eq s)
  }

  test("CDATA sections are skipped by the tokenizer") {
    val doc = graft.html.BlockExtractor.extract(
      graft.html.TreeBuilder.parse("<p>before <![CDATA[ <b>not parsed</b> > ]]>after here now</p>"), "f")
    val text = doc.blocks.collect { case graft.model.ParaBlock(t) => t }.mkString
    assert(text == "before after here now", text)
  }

  test("Json roundtrip: manifest-shaped values") {
    val v: Map[String, Any] = Map(
      "snapshot_id" -> 3L,
      "dirs" -> List("/a/b", "/c d/e\"f"),
      "nested" -> Map("x" -> 1.5, "ok" -> true, "nul" -> null),
      "text" -> "line1\nline2\ttab ctl",
    )
    val parsed = Json.parse(Json.write(v)).asInstanceOf[Map[String, Any]]
    assert(parsed("snapshot_id") == 3L)
    assert(parsed("dirs") == List("/a/b", "/c d/e\"f"))
    val nested = parsed("nested").asInstanceOf[Map[String, Any]]
    assert(nested("x") == 1.5 && nested("ok") == true && nested("nul") == null)
    assert(parsed("text") == "line1\nline2\ttab ctl")
  }
}
