package graft.export

import graft.core.PyStr

/** Exact port of the reference's markdown-strip text export
  * (reference: app/transcribe.py:167-189), including its quirks:
  *  - `*` removal also strips list bullets and stray asterisks;
  *  - the link rewriter `break`s on the first unbalanced/malformed link
  *    and leaves the remainder of the line untouched;
  *  - blank lines (after stripping) are dropped entirely.
  */
object TextExporter {

  def stripMarkdown(md: String): String = {
    val out = new StringBuilder
    var first = true
    // Python str.split("\n") — keeps empty trailing segments
    val lines = md.split("\n", -1)
    var li = 0
    while (li < lines.length) {
      var line = lines(li)
      // Remove headers: line.lstrip("#").strip()
      line = PyStr.strip(PyStr.lstripChars(line, "#"))
      // Remove bold/italic markers (order matters: ** before *, __ before _)
      line = line.replace("**", "").replace("*", "").replace("__", "").replace("_", "")
      // Remove links but keep text: [text](url) -> text
      var go = line.contains("[") && line.contains("](")
      while (go) {
        val start = line.indexOf("[")
        val mid = line.indexOf("](", start)
        val end = if (mid >= 0) line.indexOf(")", mid) else -1
        if (start >= 0 && mid > start && end > mid) {
          val text = line.substring(start + 1, mid)
          line = line.substring(0, start) + text + line.substring(end + 1)
        } else {
          go = false
        }
        if (go) go = line.contains("[") && line.contains("](")
      }
      if (line.nonEmpty) {
        if (!first) out.append('\n')
        out.append(line)
        first = false
      }
      li += 1
    }
    out.toString
  }
}
