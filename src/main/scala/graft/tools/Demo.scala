package graft.tools

import graft.chunk.Chunker
import graft.export.{DocTagsSerializer, JsonSerializer, MarkdownSerializer, TextExporter}
import graft.html.{BlockExtractor, TreeBuilder}
import graft.pipeline.TypeDetector

/** Library drive: parse an HTML file (or a built-in sample) through the
  * public extraction chain and print every export format. Usage:
  *   sbt "runMain graft.tools.Demo [file.html]"
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val html = args.headOption match {
      case Some(p) => new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
      case None => Sample
    }
    val dom = TreeBuilder.parse(html)
    val doc = BlockExtractor.extract(dom, "document")
    val md = MarkdownSerializer.serialize(doc)
    val txt = TextExporter.stripMarkdown(md)
    println("=== TYPE ===")
    println(TypeDetector.detect(html.getBytes("UTF-8"), args.headOption.getOrElse("http://example.com/page")))
    println("=== MARKDOWN ===")
    println(md)
    println("=== TEXT ===")
    println(txt)
    println("=== CHUNKS (size=120 overlap=20) ===")
    Chunker.chunkText(txt, 120, 20).foreach(c => println(s"[${c.start},${c.end}) ${c.text.replace("\n", "\\n").take(70)}"))
    println("=== DOCTAGS ===")
    println(DocTagsSerializer.serialize(doc))
    println("=== JSON ===")
    println(JsonSerializer.serialize(doc))
  }

  val Sample: String = """<!DOCTYPE html><html><head><title>Acme Widgets Review</title></head>
<body>
<nav class="main-nav"><a href="/">Home</a> <a href="/shop">Shop</a> <a href="/about">About</a></nav>
<header id="site-header"><h1>ACME STORE</h1></header>
<div class="content">
<h1>The 2026 Widget Review</h1>
<p>We tested the <b>new widget</b> for three weeks. It performed <em>admirably</em> under load, and the battery lasted longer than any competitor we have seen. See <a href="https://acme.example/spec">the spec</a> for details.</p>
<p>Short one.</p>
<ul><li>Fast startup</li><li>Low power</li></ul>
<table><tr><th>Model</th><th>Score</th></tr><tr><td>W-100</td><td>9.1</td></tr><tr><td>W-200</td><td>8.7</td></tr></table>
<p><a href="/a">buy now</a> <a href="/b">discount</a> <a href="/c">offer</a></p>
</div>
<div class="sidebar"><p>Subscribe to our newsletter for deals and ads!</p></div>
<footer>(c) 2026 Acme. <a href="/privacy">Privacy</a></footer>
<script>var x = "<p>not content</p>";</script>
</body></html>"""
}
