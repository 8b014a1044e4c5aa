package graft

import graft.html.Names
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The zero-allocation fast paths must be observationally identical to the
  * straightforward code they replaced. */
class NamesSpec extends AnyFunSuite {

  private def reference(s: String, from: Int, until: Int): String =
    s.substring(from, until).toLowerCase(java.util.Locale.ROOT)

  test("intern == substring.toLowerCase for known names in any case mix") {
    for (nm <- Seq("div", "DIV", "dIv", "P", "td", "W:VAL", "aria-LABEL", "h3", "BLOCKQUOTE")) {
      val s = "xx" + nm + "yy"
      assert(Names.intern(s, 2, 2 + nm.length) == reference(s, 2, 2 + nm.length))
    }
  }

  test("known names return the canonical shared instance (no allocation)") {
    val s = "<DiV class"
    assert(Names.intern(s, 1, 4) eq Names.intern("div", 0, 3))
  }

  test("intern == substring.toLowerCase on random ASCII and unicode names") {
    val rnd = new Random(7)
    val alphabet = "abcdefgHIJKLMNop-:0123456789" + "éÉßΩ "
    for (_ <- 0 until 5000) {
      val len = 1 + rnd.nextInt(12)
      val name = Vector.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
      val s = "padding" + name + "tail"
      val got = Names.intern(s, 7, 7 + name.length)
      assert(got == reference(s, 7, 7 + name.length), s"name=[$name]")
    }
  }

  test("empty region interns to empty string") {
    assert(Names.intern("abc", 1, 1) == "")
  }

  test("chunkId matches the %04d reference format") {
    for (idx <- Seq(0, 1, 9, 10, 99, 100, 999, 1000, 9999, 10000, 123456)) {
      assert(graft.chunk.Chunker.chunkId("t", idx) == f"t_chunk_$idx%04d")
    }
  }
}
