package graft

import graft.export.TextExporter
import org.scalatest.funsuite.AnyFunSuite

/** T5 port tests — semantics of reference app/transcribe.py:167-189,
  * including the quirks (bullet stripping, unbalanced-link break). */
class TextExporterSpec extends AnyFunSuite {

  test("headers stripped") {
    assert(TextExporter.stripMarkdown("## Title") == "Title")
    assert(TextExporter.stripMarkdown("###   spaced  ") == "spaced")
    assert(TextExporter.stripMarkdown("#x") == "x")
  }

  test("bold/italic markers removed (order ** before *)") {
    assert(TextExporter.stripMarkdown("**bold** and *it* and __u__ and _e_") == "bold and it and u and e")
  }

  test("quirk: single * list bullets are stripped too (leading space kept)") {
    assert(TextExporter.stripMarkdown("* item one") == " item one")
  }

  test("quirk: underscores inside words are removed") {
    assert(TextExporter.stripMarkdown("snake_case_name") == "snakecasename")
  }

  test("links rewritten to text") {
    assert(TextExporter.stripMarkdown("see [docs](http://x.y/z) now") == "see docs now")
    assert(TextExporter.stripMarkdown("[a](u1) mid [b](u2)") == "a mid b")
  }

  test("quirk: malformed link breaks the loop, remainder untouched") {
    // "](" present but no closing ")" → find(')') == -1 → break
    assert(TextExporter.stripMarkdown("x [text](url y") == "x [text](url y")
    // "[" after "](" (mid < start) → break leaves line as-is
    assert(TextExporter.stripMarkdown("a ]( b [ c") == "a ]( b [ c")
  }

  test("empty lines dropped") {
    assert(TextExporter.stripMarkdown("a\n\n\nb\n") == "a\nb")
    assert(TextExporter.stripMarkdown("**") == "")
  }

  test("multi-line document") {
    val md = "# Title\n\nSome **bold** text with [a link](http://e.com).\n\n* one\n* two"
    assert(TextExporter.stripMarkdown(md) == "Title\nSome bold text with a link.\n one\n two")
  }
}
