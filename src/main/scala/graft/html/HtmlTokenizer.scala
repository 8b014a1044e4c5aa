package graft.html

import java.util.Locale
import scala.collection.mutable.ArrayBuffer

/** Streaming HTML tokenizer — a WHATWG-tokenizer-state subset implemented as
  * a single-pass state machine with constant per-token memory (the "streaming
  * tokenization" the north rule asks for: one forward scan per document,
  * no backtracking, no global buffers beyond the current token).
  *
  * Covered states: Data, TagOpen, EndTagOpen, TagName, attribute states
  * (name / value dq / sq / unquoted), SelfClosingStartTag, comments
  * (`<!-- -->` incl. bogus), DOCTYPE-as-bogus, RAWTEXT for script/style
  * (skips to the matching `</script`/`</style`). Anything malformed falls
  * back to emitting text — garbage in, best-effort tokens out, never throws.
  */
object HtmlTokenizer {

  sealed trait Tok
  final case class StartTag(name: String, attrs: List[(String, String)], selfClosing: Boolean) extends Tok {
    def attr(key: String): Option[String] = attrs.collectFirst { case (k, v) if k == key => v }
  }
  final case class EndTag(name: String) extends Tok
  final case class Text(s: String) extends Tok

  private val RawTextTags = Set("script", "style")

  def tokenize(html: String): Iterator[Tok] = new Iterator[Tok] {
    private val s = html
    private val n = s.length
    private var i = 0
    private val queue = ArrayBuffer.empty[Tok]
    private var qHead = 0 // consume via index — remove(0) would shift

    override def hasNext: Boolean = { fill(); qHead < queue.length }
    override def next(): Tok = {
      fill()
      val t = queue(qHead)
      qHead += 1
      if (qHead == queue.length) { queue.clear(); qHead = 0 }
      t
    }

    private def fill(): Unit = {
      while (qHead >= queue.length && i < n) step()
    }

    @inline private def isAsciiAlpha(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

    private def step(): Unit = {
      // Data state: scan text until '<'
      val lt = s.indexOf('<', i)
      if (lt < 0) {
        if (i < n) queue += Text(Entities.decode(s.substring(i)))
        i = n
        return
      }
      if (lt > i) {
        queue += Text(Entities.decode(s.substring(i, lt)))
        i = lt
        return
      }
      // i points at '<'
      if (i + 1 >= n) { queue += Text("<"); i = n; return }
      val c1 = s.charAt(i + 1)
      if (c1 == '!') {
        // comment / CDATA / doctype / bogus
        if (s.startsWith("<!--", i)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (s.startsWith("<![CDATA[", i)) {
          val end = s.indexOf("]]>", i + 9)
          i = if (end < 0) n else end + 3
        } else {
          val end = s.indexOf('>', i + 2)
          i = if (end < 0) n else end + 1
        }
      } else if (c1 == '?') { // bogus comment (e.g. <?xml ...>)
        val end = s.indexOf('>', i + 2)
        i = if (end < 0) n else end + 1
      } else if (c1 == '/') {
        if (i + 2 < n && isAsciiAlpha(s.charAt(i + 2))) {
          val (name, after) = readTagName(i + 2)
          // skip to '>'
          val gt = s.indexOf('>', after)
          i = if (gt < 0) n else gt + 1
          queue += EndTag(name)
        } else { // "</>" or "</ " → bogus, skip to '>'
          val end = s.indexOf('>', i + 2)
          i = if (end < 0) n else end + 1
        }
      } else if (isAsciiAlpha(c1)) {
        readStartTag()
      } else {
        // lone '<' → literal text
        queue += Text("<")
        i += 1
      }
    }

    private def readTagName(from: Int): (String, Int) = {
      var j = from
      while (j < n) {
        val c = s.charAt(j)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '/' || c == '>') {
          return (s.substring(from, j).toLowerCase(Locale.ROOT), j)
        }
        j += 1
      }
      (s.substring(from, j).toLowerCase(Locale.ROOT), j)
    }

    private def readStartTag(): Unit = {
      val (name, afterName) = readTagName(i + 1)
      var j = afterName
      val attrs = List.newBuilder[(String, String)]
      var selfClosing = false
      var done = false
      while (!done && j < n) {
        // skip whitespace
        while (j < n && isWs(s.charAt(j))) j += 1
        if (j >= n) { done = true }
        else s.charAt(j) match {
          case '>' => j += 1; done = true
          case '/' =>
            if (j + 1 < n && s.charAt(j + 1) == '>') { selfClosing = true; j += 2; done = true }
            else j += 1
          case _ =>
            // attribute name
            val nameStart = j
            while (j < n && !isWs(s.charAt(j)) && s.charAt(j) != '=' && s.charAt(j) != '>' && s.charAt(j) != '/') j += 1
            val aname = s.substring(nameStart, j).toLowerCase(Locale.ROOT)
            while (j < n && isWs(s.charAt(j))) j += 1
            var avalue = ""
            if (j < n && s.charAt(j) == '=') {
              j += 1
              while (j < n && isWs(s.charAt(j))) j += 1
              if (j < n) {
                val q = s.charAt(j)
                if (q == '"' || q == '\'') {
                  j += 1
                  val close = s.indexOf(q, j)
                  if (close < 0) { avalue = s.substring(j); j = n }
                  else { avalue = s.substring(j, close); j = close + 1 }
                } else {
                  val valStart = j
                  while (j < n && !isWs(s.charAt(j)) && s.charAt(j) != '>') j += 1
                  avalue = s.substring(valStart, j)
                }
              }
            }
            if (aname.nonEmpty) attrs += ((aname, Entities.decode(avalue)))
        }
      }
      i = j
      if (RawTextTags.contains(name) && !selfClosing) {
        // RAWTEXT: skip everything to the matching close tag (case-insensitive)
        val closeIdx = indexOfIgnoreCase(s, "</" + name, i)
        if (closeIdx < 0) { i = n } else {
          val gt = s.indexOf('>', closeIdx)
          i = if (gt < 0) n else gt + 1
        }
        queue += StartTag(name, attrs.result(), selfClosing = false)
        queue += EndTag(name)
      } else {
        queue += StartTag(name, attrs.result(), selfClosing)
      }
    }

    @inline private def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'

    private def indexOfIgnoreCase(hay: String, needle: String, from: Int): Int = {
      val nl = needle.length
      var k = from
      val limit = hay.length - nl
      while (k <= limit) {
        if (hay.regionMatches(true, k, needle, 0, nl)) return k
        k += 1
      }
      -1
    }
  }
}
