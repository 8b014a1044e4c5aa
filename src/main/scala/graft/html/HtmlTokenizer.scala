package graft.html

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
  *
  * Two surfaces over the same state machine:
  *  - [[parse]] pushes events straight into a [[Sink]] — the hot path
  *    (TreeBuilder implements Sink), zero per-token wrapper objects;
  *  - [[tokenize]] materializes the [[Tok]] stream for tests/tools.
  */
object HtmlTokenizer {

  sealed trait Tok
  final case class StartTag(name: String, attrs: List[(String, String)], selfClosing: Boolean) extends Tok {
    def attr(key: String): Option[String] = attrs.collectFirst { case (k, v) if k == key => v }
  }
  final case class EndTag(name: String) extends Tok
  final case class Text(s: String) extends Tok

  /** Push-mode receiver: one call per token, no token objects allocated. */
  trait Sink {
    def onText(t: String): Unit
    def onStartTag(name: String, attrs: List[(String, String)], selfClosing: Boolean): Unit
    def onEndTag(name: String): Unit
  }

  private val RawTextTags = Set("script", "style")

  /** Compatibility/testing surface: the buffered token stream. */
  def tokenize(html: String): Iterator[Tok] = {
    val buf = ArrayBuffer.empty[Tok]
    parse(html, new Sink {
      def onText(t: String): Unit = buf += Text(t)
      def onStartTag(name: String, attrs: List[(String, String)], selfClosing: Boolean): Unit =
        buf += StartTag(name, attrs, selfClosing)
      def onEndTag(name: String): Unit = buf += EndTag(name)
    })
    buf.iterator
  }

  /** Single forward scan of `html`, events pushed into `sink`. */
  def parse(html: String, sink: Sink): Unit = new Parser(html, sink).run()

  private final class Parser(s: String, sink: Sink) {
    private val n = s.length
    private var i = 0
    private var tagNameEnd = 0 // out-param of readTagName (avoids a tuple per tag)

    def run(): Unit = {
      while (i < n) step()
    }

    @inline private def isAsciiAlpha(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

    private def step(): Unit = {
      // Data state: scan text until '<'
      val lt = s.indexOf('<', i)
      if (lt < 0) {
        if (i < n) sink.onText(Entities.decode(if (i == 0) s else s.substring(i)))
        i = n
        return
      }
      if (lt > i) {
        sink.onText(Entities.decode(s.substring(i, lt)))
        i = lt
        return
      }
      // i points at '<'
      if (i + 1 >= n) { sink.onText("<"); i = n; return }
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
          val name = readTagName(i + 2)
          // skip to '>'
          val gt = s.indexOf('>', tagNameEnd)
          i = if (gt < 0) n else gt + 1
          sink.onEndTag(name)
        } else { // "</>" or "</ " → bogus, skip to '>'
          val end = s.indexOf('>', i + 2)
          i = if (end < 0) n else end + 1
        }
      } else if (isAsciiAlpha(c1)) {
        readStartTag()
      } else {
        // lone '<' → literal text
        sink.onText("<")
        i += 1
      }
    }

    /** Name is interned when known (Names) — the old
      * `substring.toLowerCase` pair per tag dominated tokenizer garbage. */
    private def readTagName(from: Int): String = {
      var j = from
      var done = false
      while (j < n && !done) {
        val c = s.charAt(j)
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '/' || c == '>') done = true
        else j += 1
      }
      tagNameEnd = j
      Names.intern(s, from, j)
    }

    private def readStartTag(): Unit = {
      val name = readTagName(i + 1)
      var j = tagNameEnd
      var attrsB: scala.collection.mutable.Builder[(String, String), List[(String, String)]] = null
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
            val aname = Names.intern(s, nameStart, j)
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
            if (aname.nonEmpty) {
              if (attrsB == null) attrsB = List.newBuilder[(String, String)]
              attrsB += ((aname, Entities.decode(avalue)))
            }
        }
      }
      i = j
      val attrs = if (attrsB == null) Nil else attrsB.result()
      if (RawTextTags.contains(name) && !selfClosing) {
        // RAWTEXT: skip everything to the matching close tag (case-insensitive)
        val closeIdx = indexOfIgnoreCase(s, "</" + name, i)
        if (closeIdx < 0) { i = n } else {
          val gt = s.indexOf('>', closeIdx)
          i = if (gt < 0) n else gt + 1
        }
        sink.onStartTag(name, attrs, selfClosing = false)
        sink.onEndTag(name)
      } else {
        sink.onStartTag(name, attrs, selfClosing)
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
