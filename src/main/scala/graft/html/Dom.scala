package graft.html

import scala.collection.mutable.ArrayBuffer

/** Minimal mutable DOM. Recursive, so intentionally NOT product-encodable —
  * it lives entirely inside one mapPartitions call (SURVEY.md §7.2) and is
  * Kryo-registered only for closure/spill safety.
  */
sealed trait Node extends Serializable
final case class TextNode(var text: String) extends Node
final class Element(
    val name: String,
    val attrs: List[(String, String)],
    val children: ArrayBuffer[Node] = ArrayBuffer.empty,
) extends Node {
  def attr(key: String): Option[String] = Option(attrOrNull(key))

  /** Allocation-free attr lookup for hot paths (no Option, no closure). */
  def attrOrNull(key: String): String = {
    var cur = attrs
    while (cur.nonEmpty) {
      val kv = cur.head
      if (kv._1 == key) return kv._2
      cur = cur.tail
    }
    null
  }
  override def toString: String = s"<$name>(${children.size})"
}

/** Forgiving tree construction over the token stream — an HTML5
  * insertion-mode subset: void elements, auto-close of p/li/td/th/tr,
  * unmatched end tags ignored, misnesting recovered by popping to the
  * nearest matching open element.
  */
object TreeBuilder {

  private val Void = Set(
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr")

  private val BlockLevel = Set(
    "address", "article", "aside", "blockquote", "div", "dl", "dd", "dt",
    "fieldset", "figure", "figcaption", "footer", "form", "h1", "h2", "h3",
    "h4", "h5", "h6", "header", "hr", "main", "nav", "ol", "p", "pre",
    "section", "table", "ul", "li")

  /** Tags whose content we will never render — dropped at build time so the
    * tree stays small on script/style/svg-heavy pages. */
  private val DropSubtree = Set("script", "style", "noscript", "template", "svg", "iframe", "object", "applet")

  // auto-close fences (hoisted — these were allocated per start tag, a
  // measurable slice of tokenizer-path garbage)
  private val PFence = Set("table", "td", "th", "ul", "ol", "li", "blockquote", "div", "section", "article")
  private val LiFence = Set("ul", "ol")
  private val CellFence = Set("tr", "table")
  private val TrFence = Set("table")

  /** The insertion-mode logic as a push-mode [[HtmlTokenizer.Sink]] — the
    * tokenizer drives it directly in [[parse]], so the main path allocates
    * no per-token wrapper objects or queues. */
  private final class BuilderSink extends HtmlTokenizer.Sink {
    val root = new Element("#root", Nil)
    private val stack = ArrayBuffer[Element](root)
    private var dropDepth = 0 // >0 while inside a DropSubtree element
    private var dropTag: String = null

    @inline private def top: Element = stack.last

    private def closeUpTo(name: String): Unit = {
      var k = stack.length - 1
      while (k >= 1) {
        if (stack(k).name == name) {
          stack.dropRightInPlace(stack.length - k)
          return
        }
        k -= 1
      }
    }

    /** Close `target` if it is open above any element in `fence`. */
    private def autoClose(target: String, fence: Set[String]): Unit = {
      var k = stack.length - 1
      while (k >= 1) {
        val nm = stack(k).name
        if (nm == target) { stack.dropRightInPlace(stack.length - k); return }
        if (fence.contains(nm)) return
        k -= 1
      }
    }

    def onText(t: String): Unit =
      if (dropDepth == 0 && t.nonEmpty) {
        top.children += TextNode(t)
      }

    def onStartTag(name: String, attrs: List[(String, String)], selfClosing: Boolean): Unit =
      if (dropDepth > 0) {
        if (name == dropTag) dropDepth += 1
      } else if (DropSubtree.contains(name)) {
        if (!selfClosing) { dropDepth = 1; dropTag = name }
      } else {
        // auto-close rules
        if (name == "p" || (BlockLevel.contains(name) && name != "li")) {
          autoClose("p", PFence)
        }
        if (name == "li") autoClose("li", LiFence)
        if (name == "td" || name == "th") {
          autoClose("td", CellFence); autoClose("th", CellFence)
        }
        if (name == "tr") {
          autoClose("td", CellFence); autoClose("th", CellFence)
          autoClose("tr", TrFence)
        }
        val el = new Element(name, attrs)
        top.children += el
        if (!selfClosing && !Void.contains(name)) stack += el
      }

    def onEndTag(name: String): Unit =
      if (dropDepth > 0) {
        if (name == dropTag) {
          dropDepth -= 1
          if (dropDepth == 0) dropTag = null
        }
      } else if (!Void.contains(name)) {
        closeUpTo(name) // ignored when not open
      }
  }

  def build(tokens: Iterator[HtmlTokenizer.Tok]): Element = {
    val sink = new BuilderSink
    tokens.foreach {
      case HtmlTokenizer.Text(t) => sink.onText(t)
      case HtmlTokenizer.StartTag(name, attrs, selfClosing) => sink.onStartTag(name, attrs, selfClosing)
      case HtmlTokenizer.EndTag(name) => sink.onEndTag(name)
    }
    sink.root
  }

  def parse(html: String): Element = {
    val sink = new BuilderSink
    HtmlTokenizer.parse(html, sink)
    sink.root
  }
}
