package graft.pipeline

import graft.model.DocumentType
import java.util.Locale

/** Document-type detection over raw bytes + url, mirroring the reference's
  * magic-then-extension-then-default-pdf precedence
  * (reference: app/utils.py:20-54, 76-93). The reference shells out to
  * libmagic on a temp file; here the payload is a column, so we sniff the
  * magic bytes directly — same decision order:
  *   1. content sniff (magic bytes);
  *   2. url extension fallback (EXT_TYPE_MAP analog);
  *   3. default "pdf" (utils.py:92-93).
  */
object TypeDetector {

  private val ExtMap: Map[String, String] = Map(
    ".pdf" -> DocumentType.Pdf,
    ".docx" -> DocumentType.Docx,
    ".pptx" -> DocumentType.Pptx,
    ".xlsx" -> DocumentType.Xlsx,
    ".html" -> DocumentType.Html,
    ".htm" -> DocumentType.Html,
    ".md" -> DocumentType.Md,
    ".markdown" -> DocumentType.Md,
    ".adoc" -> DocumentType.Asciidoc,
    ".asciidoc" -> DocumentType.Asciidoc,
    ".png" -> DocumentType.Image,
    ".jpg" -> DocumentType.Image,
    ".jpeg" -> DocumentType.Image,
    ".tiff" -> DocumentType.Image,
    ".tif" -> DocumentType.Image,
    ".webp" -> DocumentType.Image,
    ".bmp" -> DocumentType.Image,
  )

  def detect(bytes: Array[Byte], url: String): String =
    sniff(bytes).orElse(fromExtension(url)).getOrElse(DocumentType.Pdf)

  /** Detect→decode→parse gate shared by every HTML link/anchor consumer
    * (batch link family + streaming harvest): Some(DOM root) iff the
    * payload detects as HTML. One implementation so charset handling and
    * detection can never drift between batch and streaming. */
  def parseIfHtml(bytes: Array[Byte], url: String): Option[graft.html.Node] =
    if (detect(bytes, url) == DocumentType.Html)
      Some(graft.html.TreeBuilder.parse(
        new String(bytes, java.nio.charset.StandardCharsets.UTF_8)))
    else None

  /** Magic-byte sniff (libmagic analog). */
  def sniff(bytes: Array[Byte]): Option[String] = {
    if (bytes == null || bytes.length < 4) return None
    val b = bytes

    @inline def at(i: Int, v: Int): Boolean = (b(i) & 0xff) == v

    // %PDF-
    if (b.length >= 5 && b(0) == '%' && b(1) == 'P' && b(2) == 'D' && b(3) == 'F' && b(4) == '-')
      return Some(DocumentType.Pdf)
    // PNG
    if (at(0, 0x89) && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') return Some(DocumentType.Image)
    // JPEG
    if (at(0, 0xff) && at(1, 0xd8) && at(2, 0xff)) return Some(DocumentType.Image)
    // TIFF
    if ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
        (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42)) return Some(DocumentType.Image)
    // WEBP: RIFF....WEBP
    if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P') return Some(DocumentType.Image)
    // BMP
    if (b(0) == 'B' && b(1) == 'M') return Some(DocumentType.Image)
    // OOXML zip containers: PK\x03\x04 then look for the part-name hint
    if (b(0) == 'P' && b(1) == 'K' && b(2) == 3 && b(3) == 4) {
      // OOXML container: part names appear uncompressed in the local file
      // headers near the front; use full part names (short markers like
      // "xl/" could collide with deflated payload bytes)
      val head = new String(b, 0, math.min(b.length, 8192), java.nio.charset.StandardCharsets.ISO_8859_1)
      if (head.contains("word/document")) return Some(DocumentType.Docx)
      if (head.contains("ppt/presentation") || head.contains("ppt/slides/")) return Some(DocumentType.Pptx)
      if (head.contains("xl/workbook")) return Some(DocumentType.Xlsx)
      return None
    }
    // HTML: optional BOM/whitespace then <!doctype or <html or a known tag
    var i = 0
    if (b.length >= 3 && at(0, 0xef) && at(1, 0xbb) && at(2, 0xbf)) i = 3
    while (i < b.length && (b(i) == ' ' || b(i) == '\t' || b(i) == '\r' || b(i) == '\n')) i += 1
    if (i < b.length && b(i) == '<') {
      val head = new String(b, i, math.min(b.length - i, 256), java.nio.charset.StandardCharsets.ISO_8859_1)
        .toLowerCase(Locale.ROOT)
      if (head.startsWith("<!doctype html") || head.startsWith("<html") ||
          head.startsWith("<head") || head.startsWith("<body") || head.startsWith("<!--"))
        return Some(DocumentType.Html)
    }
    None
  }

  /** Extension from the url path, lowercased (reference: app/utils.py:96-101). */
  def fromExtension(url: String): Option[String] = {
    if (url == null) return None
    // path = url without scheme/authority/query/fragment
    val noFrag = url.indexOf('#') match { case -1 => url; case k => url.substring(0, k) }
    val noQuery = noFrag.indexOf('?') match { case -1 => noFrag; case k => noFrag.substring(0, k) }
    val schemeEnd = noQuery.indexOf("://")
    val path = if (schemeEnd >= 0) {
      val afterScheme = noQuery.substring(schemeEnd + 3)
      afterScheme.indexOf('/') match { case -1 => ""; case k => afterScheme.substring(k) }
    } else noQuery
    val name = path.substring(path.lastIndexOf('/') + 1)
    val dot = name.lastIndexOf('.')
    if (dot <= 0) None
    else ExtMap.get(name.substring(dot).toLowerCase(Locale.ROOT))
  }
}
