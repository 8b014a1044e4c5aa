package graft.html

/** Zero-allocation interning of tag / attribute names.
  *
  * The tokenizer historically lower-cased every tag and attribute name via
  * `substring(...).toLowerCase(...)` — two short-lived strings per tag, tens
  * of thousands per document. At 32 threads the kernel is allocation-bound
  * (BENCH.md), so known names are resolved straight from the source string's
  * char region into a canonical shared instance: hash the region with
  * ASCII lower-casing, probe a fixed open-addressed table, compare in place.
  * Unknown or non-ASCII names fall back to the old allocation path, so
  * behavior is unchanged for arbitrary input (golden fixtures prove it).
  *
  * The table carries HTML tag names, common attribute names, and the OOXML
  * part names the docx/xlsx/pptx parsers look up (`w:p`, `a:t`, ...) since
  * they ride the same tokenizer.
  */
object Names {

  private val Known: Array[String] = Array(
    // HTML tags
    "a", "abbr", "address", "applet", "area", "article", "aside", "audio",
    "b", "base", "bdi", "bdo", "big", "blockquote", "body", "br", "button",
    "canvas", "caption", "center", "cite", "code", "col", "colgroup",
    "data", "datalist", "dd", "del", "details", "dfn", "dialog", "div",
    "dl", "dt", "em", "embed", "fieldset", "figcaption", "figure", "font",
    "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "head", "header",
    "hr", "html", "i", "iframe", "img", "input", "ins", "kbd", "label",
    "legend", "li", "link", "main", "mark", "menu", "meta", "nav",
    "noscript", "object", "ol", "optgroup", "option", "p", "param",
    "picture", "pre", "q", "s", "samp", "script", "section", "select",
    "small", "source", "span", "strong", "style", "sub", "summary", "sup",
    "svg", "table", "tbody", "td", "template", "textarea", "tfoot", "th",
    "thead", "time", "title", "tr", "track", "tt", "u", "ul", "var",
    "video", "wbr",
    // common attribute names
    "class", "id", "role", "href", "src", "alt", "type", "name", "value",
    "rel", "target", "width", "height", "lang", "dir", "content", "charset",
    "property", "colspan", "rowspan", "scope", "datetime", "placeholder",
    "action", "method", "loading", "srcset", "sizes", "media", "integrity",
    "crossorigin", "async", "defer", "disabled", "checked", "selected",
    "multiple", "readonly", "required", "hidden", "tabindex", "for",
    "aria-label", "aria-hidden", "aria-expanded", "data-src", "style",
    "onclick", "border", "align", "valign", "bgcolor", "color", "face",
    "size", "start", "download", "hreflang", "itemprop", "itemscope",
    "itemtype", "autocomplete", "autofocus", "xmlns",
    // OOXML element/attr names consumed by graft.ooxml.OoxmlParser
    "w:document", "w:body", "w:p", "w:ppr", "w:pstyle", "w:val", "w:r",
    "w:rpr", "w:t", "w:b", "w:i", "w:tbl", "w:tr", "w:tc", "sst", "si",
    "t", "v", "c", "r", "row", "sheetdata", "worksheet", "p:sp", "p:ph",
    "p:txbody", "a:p", "a:r", "a:t", "p:csld", "p:sptree",
  ).distinct

  // open-addressed probe table, load factor < 0.5
  private val Mask = 1023
  private val Table = new Array[String](Mask + 1)
  Known.foreach { nm =>
    var idx = nm.hashCode & Mask
    while (Table(idx) != null) idx = (idx + 1) & Mask
    Table(idx) = nm
  }

  /** Canonical lowercase name for `s[from, until)`. Allocation-free when the
    * name is in the table; `substring(...).toLowerCase(Locale.ROOT)`
    * otherwise (identical result either way — table entries ARE the
    * lowercase forms, and ASCII lower-casing matches Locale.ROOT). */
  def intern(s: String, from: Int, until: Int): String = {
    var h = 0
    var k = from
    var asciiOnly = true
    while (k < until) {
      var c = s.charAt(k)
      if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
      else if (c >= 0x80) asciiOnly = false
      h = 31 * h + c
      k += 1
    }
    if (asciiOnly) {
      var idx = h & Mask
      var cand = Table(idx)
      while (cand != null) {
        if (cand.length == until - from && regionEq(cand, s, from)) return cand
        idx = (idx + 1) & Mask
        cand = Table(idx)
      }
    }
    s.substring(from, until).toLowerCase(java.util.Locale.ROOT)
  }

  private def regionEq(cand: String, s: String, from: Int): Boolean = {
    var k = 0
    val n = cand.length
    while (k < n) {
      var c = s.charAt(from + k)
      if (c >= 'A' && c <= 'Z') c = (c + 32).toChar
      if (c != cand.charAt(k)) return false
      k += 1
    }
    true
  }
}
