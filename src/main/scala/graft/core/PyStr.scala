package graft.core

/** Python-compatible string primitives, so the ported algorithms (chunker,
  * markdown strip) reproduce the reference byte-for-byte. Python's
  * `str.strip()` strips Unicode whitespace — a superset of Java's
  * `Character.isWhitespace` (NBSP, NNBSP, figure space, NEL).
  */
object PyStr {

  @inline def isPySpace(c: Char): Boolean =
    Character.isWhitespace(c) ||
      c == '\u00a0' || // NBSP
      c == '\u0085' || // NEL
      c == '\u2007' || // figure space
      c == '\u202f'    // narrow NBSP

  /** `s.strip()` */
  def strip(s: String): String = {
    var i = 0
    var j = s.length
    while (i < j && isPySpace(s.charAt(i))) i += 1
    while (j > i && isPySpace(s.charAt(j - 1))) j -= 1
    if (i == 0 && j == s.length) s else s.substring(i, j)
  }

  /** `s.lstrip(chars)` — strip any of `chars` from the left. */
  def lstripChars(s: String, chars: String): String = {
    var i = 0
    while (i < s.length && chars.indexOf(s.charAt(i)) >= 0) i += 1
    if (i == 0) s else s.substring(i)
  }

  /** `s.rfind(sub)` (same as lastIndexOf; -1 if absent). */
  @inline def rfind(s: String, sub: String): Int = s.lastIndexOf(sub)

  /** Human-readable byte size (reference T14, app/utils.py:211-217 —
    * same one-decimal format and unit ladder). */
  def formatBytes(size0: Long): String = {
    var size = size0.toDouble
    for (unit <- Seq("B", "KB", "MB", "GB")) {
      if (size < 1024) return f"$size%.1f $unit"
      size /= 1024
    }
    f"$size%.1f TB"
  }
}
