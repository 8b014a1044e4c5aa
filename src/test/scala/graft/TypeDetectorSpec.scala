package graft

import graft.pipeline.TypeDetector
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** T1 tests — magic-vs-extension precedence incl. default-pdf fallback
  * (reference app/utils.py:76-93). */
class TypeDetectorSpec extends AnyFunSuite {

  test("magic: pdf") {
    assert(TypeDetector.detect("%PDF-1.4\n...".getBytes(UTF_8), "http://x/file.bin") == "pdf")
  }

  test("magic: html via doctype and via <html>") {
    assert(TypeDetector.detect("<!DOCTYPE html><html>".getBytes(UTF_8), "http://x/a") == "html")
    assert(TypeDetector.detect("  \n<html lang=\"en\">".getBytes(UTF_8), "http://x/a") == "html")
  }

  test("magic: images") {
    assert(TypeDetector.detect(Array(0x89.toByte, 'P', 'N', 'G', 0, 0), "u") == "image")
    assert(TypeDetector.detect(Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte), "u") == "image")
  }

  test("magic beats extension") {
    assert(TypeDetector.detect("%PDF-1.4".getBytes(UTF_8), "http://x/page.html") == "pdf")
  }

  test("extension fallback when no magic match") {
    assert(TypeDetector.detect("random bytes".getBytes(UTF_8), "http://x/doc.html") == "html")
    assert(TypeDetector.detect("random bytes".getBytes(UTF_8), "http://x/doc.md?v=2") == "md")
    assert(TypeDetector.detect("random bytes".getBytes(UTF_8), "http://x/paper.PDF") == "pdf")
  }

  test("default pdf when unknown (utils.py:92-93)") {
    assert(TypeDetector.detect("random bytes".getBytes(UTF_8), "http://x/no-ext") == "pdf")
    assert(TypeDetector.detect("random bytes".getBytes(UTF_8), "http://x/f.xyz") == "pdf")
  }
}
