package graft.html

/** HTML character-reference decoding: numeric (`&#123;` / `&#x1f;`) plus the
  * common named set. Unknown/unterminated references are left literal, like
  * browsers' forgiving handling. `&nbsp;` decodes to a plain space — the
  * extracted-text spec normalizes NBSP to space (Trafilatura-style), keeping
  * the chunker/text pipeline free of invisible whitespace variants.
  */
object Entities {

  private val Named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "mdash" -> "—", "ndash" -> "–", "hellip" -> "…",
    "lsquo" -> "‘", "rsquo" -> "’", "ldquo" -> "“", "rdquo" -> "”",
    "laquo" -> "«", "raquo" -> "»", "times" -> "×", "divide" -> "÷",
    "deg" -> "°", "plusmn" -> "±", "middot" -> "·", "bull" -> "•",
    "dagger" -> "†", "sect" -> "§", "para" -> "¶", "shy" -> "",
    "euro" -> "€", "pound" -> "£", "yen" -> "¥", "cent" -> "¢",
    "eacute" -> "é", "egrave" -> "è", "agrave" -> "à", "acirc" -> "â",
    "uuml" -> "ü", "ouml" -> "ö", "auml" -> "ä", "szlig" -> "ß",
    "ccedil" -> "ç", "ntilde" -> "ñ", "oacute" -> "ó", "iacute" -> "í",
    "uacute" -> "ú", "aacute" -> "á",
  )

  /** Decode all character references in `s`. Single pass, no regex. */
  def decode(s: String): String = {
    var i = s.indexOf('&')
    if (i < 0) return s
    val sb = new StringBuilder(s.length)
    sb.append(s.substring(0, i))
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi - i > 12) { sb.append('&'); i += 1 }
        else {
          val body = s.substring(i + 1, semi)
          val decoded: Option[String] =
            if (body.startsWith("#x") || body.startsWith("#X"))
              parseCp(body.substring(2), 16)
            else if (body.startsWith("#"))
              parseCp(body.substring(1), 10)
            else Named.get(body)
          decoded match {
            case Some(d) => sb.append(d); i = semi + 1
            case None => sb.append('&'); i += 1
          }
        }
      }
    }
    sb.toString
  }

  private def parseCp(digits: String, radix: Int): Option[String] = {
    if (digits.isEmpty || digits.length > 7) return None
    try {
      val cp = Integer.parseInt(digits, radix)
      if (cp <= 0 || cp > 0x10ffff || (cp >= 0xd800 && cp <= 0xdfff)) None
      else Some(new String(Character.toChars(cp)))
    } catch { case _: NumberFormatException => None }
  }
}
