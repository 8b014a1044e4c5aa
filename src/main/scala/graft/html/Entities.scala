package graft.html

/** HTML character-reference decoding: numeric (`&#123;` / `&#x1f;`) plus the
  * common named set. Unknown/unterminated references are left literal, like
  * browsers' forgiving handling. `&nbsp;` decodes to a plain space — the
  * extracted-text spec normalizes NBSP to space (Trafilatura-style), keeping
  * the chunker/text pipeline free of invisible whitespace variants.
  */
object Entities {

  /** The full HTML4 named set (XML + Latin-1 + symbols/Greek from the
    * HTML4 DTD — the stable public list; HTML5's 2k-name extension adds
    * mostly math names real pages never use). */
  private val Named: Map[String, String] = Map(
    // XML core
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    // Latin-1 (ISO 8859-1 160-255); nbsp normalized to plain space, shy dropped
    "nbsp" -> " ", "iexcl" -> "¡", "cent" -> "¢", "pound" -> "£",
    "curren" -> "¤", "yen" -> "¥", "brvbar" -> "¦", "sect" -> "§",
    "uml" -> "¨", "copy" -> "©", "ordf" -> "ª", "laquo" -> "«",
    "not" -> "¬", "shy" -> "", "reg" -> "®", "macr" -> "¯",
    "deg" -> "°", "plusmn" -> "±", "sup2" -> "²", "sup3" -> "³",
    "acute" -> "´", "micro" -> "µ", "para" -> "¶", "middot" -> "·",
    "cedil" -> "¸", "sup1" -> "¹", "ordm" -> "º", "raquo" -> "»",
    "frac14" -> "¼", "frac12" -> "½", "frac34" -> "¾", "iquest" -> "¿",
    "Agrave" -> "À", "Aacute" -> "Á", "Acirc" -> "Â", "Atilde" -> "Ã",
    "Auml" -> "Ä", "Aring" -> "Å", "AElig" -> "Æ", "Ccedil" -> "Ç",
    "Egrave" -> "È", "Eacute" -> "É", "Ecirc" -> "Ê", "Euml" -> "Ë",
    "Igrave" -> "Ì", "Iacute" -> "Í", "Icirc" -> "Î", "Iuml" -> "Ï",
    "ETH" -> "Ð", "Ntilde" -> "Ñ", "Ograve" -> "Ò", "Oacute" -> "Ó",
    "Ocirc" -> "Ô", "Otilde" -> "Õ", "Ouml" -> "Ö", "times" -> "×",
    "Oslash" -> "Ø", "Ugrave" -> "Ù", "Uacute" -> "Ú", "Ucirc" -> "Û",
    "Uuml" -> "Ü", "Yacute" -> "Ý", "THORN" -> "Þ", "szlig" -> "ß",
    "agrave" -> "à", "aacute" -> "á", "acirc" -> "â", "atilde" -> "ã",
    "auml" -> "ä", "aring" -> "å", "aelig" -> "æ", "ccedil" -> "ç",
    "egrave" -> "è", "eacute" -> "é", "ecirc" -> "ê", "euml" -> "ë",
    "igrave" -> "ì", "iacute" -> "í", "icirc" -> "î", "iuml" -> "ï",
    "eth" -> "ð", "ntilde" -> "ñ", "ograve" -> "ò", "oacute" -> "ó",
    "ocirc" -> "ô", "otilde" -> "õ", "ouml" -> "ö", "divide" -> "÷",
    "oslash" -> "ø", "ugrave" -> "ù", "uacute" -> "ú", "ucirc" -> "û",
    "uuml" -> "ü", "yacute" -> "ý", "thorn" -> "þ", "yuml" -> "ÿ",
    // Latin Extended / punctuation / symbols (HTML4 special + symbol sets)
    "OElig" -> "Œ", "oelig" -> "œ", "Scaron" -> "Š", "scaron" -> "š",
    "Yuml" -> "Ÿ", "fnof" -> "ƒ", "circ" -> "ˆ", "tilde" -> "˜",
    "ensp" -> "\u2002", "emsp" -> "\u2003", "thinsp" -> "\u2009",
    "zwnj" -> "\u200c", "zwj" -> "\u200d", "lrm" -> "\u200e", "rlm" -> "\u200f",
    "ndash" -> "–", "mdash" -> "—", "lsquo" -> "‘", "rsquo" -> "’",
    "sbquo" -> "‚", "ldquo" -> "“", "rdquo" -> "”", "bdquo" -> "„",
    "dagger" -> "†", "Dagger" -> "‡", "bull" -> "•", "hellip" -> "…",
    "permil" -> "‰", "prime" -> "′", "Prime" -> "″",
    "lsaquo" -> "‹", "rsaquo" -> "›", "oline" -> "‾", "frasl" -> "⁄",
    "euro" -> "€", "trade" -> "™", "alefsym" -> "ℵ", "weierp" -> "℘",
    "image" -> "ℑ", "real" -> "ℜ",
    "larr" -> "←", "uarr" -> "↑", "rarr" -> "→", "darr" -> "↓",
    "harr" -> "↔", "crarr" -> "↵", "lArr" -> "⇐", "uArr" -> "⇑",
    "rArr" -> "⇒", "dArr" -> "⇓", "hArr" -> "⇔",
    "forall" -> "∀", "part" -> "∂", "exist" -> "∃", "empty" -> "∅",
    "nabla" -> "∇", "isin" -> "∈", "notin" -> "∉", "ni" -> "∋",
    "prod" -> "∏", "sum" -> "∑", "minus" -> "−", "lowast" -> "∗",
    "radic" -> "√", "prop" -> "∝", "infin" -> "∞", "ang" -> "∠",
    "and" -> "∧", "or" -> "∨", "cap" -> "∩", "cup" -> "∪",
    "int" -> "∫", "there4" -> "∴", "sim" -> "∼", "cong" -> "≅",
    "asymp" -> "≈", "ne" -> "≠", "equiv" -> "≡", "le" -> "≤",
    "ge" -> "≥", "sub" -> "⊂", "sup" -> "⊃", "nsub" -> "⊄",
    "sube" -> "⊆", "supe" -> "⊇", "oplus" -> "⊕", "otimes" -> "⊗",
    "perp" -> "⊥", "sdot" -> "⋅", "lceil" -> "⌈", "rceil" -> "⌉",
    "lfloor" -> "⌊", "rfloor" -> "⌋", "lang" -> "〈", "rang" -> "〉",
    "loz" -> "◊", "spades" -> "♠", "clubs" -> "♣", "hearts" -> "♥",
    "diams" -> "♦",
    // Greek (HTML4 symbol set)
    "Alpha" -> "Α", "Beta" -> "Β", "Gamma" -> "Γ", "Delta" -> "Δ",
    "Epsilon" -> "Ε", "Zeta" -> "Ζ", "Eta" -> "Η", "Theta" -> "Θ",
    "Iota" -> "Ι", "Kappa" -> "Κ", "Lambda" -> "Λ", "Mu" -> "Μ",
    "Nu" -> "Ν", "Xi" -> "Ξ", "Omicron" -> "Ο", "Pi" -> "Π",
    "Rho" -> "Ρ", "Sigma" -> "Σ", "Tau" -> "Τ", "Upsilon" -> "Υ",
    "Phi" -> "Φ", "Chi" -> "Χ", "Psi" -> "Ψ", "Omega" -> "Ω",
    "alpha" -> "α", "beta" -> "β", "gamma" -> "γ", "delta" -> "δ",
    "epsilon" -> "ε", "zeta" -> "ζ", "eta" -> "η", "theta" -> "θ",
    "iota" -> "ι", "kappa" -> "κ", "lambda" -> "λ", "mu" -> "μ",
    "nu" -> "ν", "xi" -> "ξ", "omicron" -> "ο", "pi" -> "π",
    "rho" -> "ρ", "sigmaf" -> "ς", "sigma" -> "σ", "tau" -> "τ",
    "upsilon" -> "υ", "phi" -> "φ", "chi" -> "χ", "psi" -> "ψ",
    "omega" -> "ω", "thetasym" -> "ϑ", "upsih" -> "ϒ", "piv" -> "ϖ",
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
