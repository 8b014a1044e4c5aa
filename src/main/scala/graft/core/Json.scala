package graft.core

/** Minimal JSON reader/writer for the manifest/checkpoint layer (no external
  * deps available offline). Supports objects, arrays, strings, longs,
  * doubles, booleans, null — all the manifest schema needs. */
object Json {

  // ------------------------------------------------------------- serialize
  def write(v: Any): String = v match {
    case null => "null"
    case s: String => quote(s)
    case b: Boolean => b.toString
    case i: Int => i.toString
    case l: Long => l.toString
    case d: Double => if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString else d.toString
    case f: Float => write(f.toDouble)
    case m: Map[_, _] =>
      m.map { case (k, vv) => quote(String.valueOf(k)) + ":" + write(vv) }.mkString("{", ",", "}")
    case it: Iterable[_] => it.map(write).mkString("[", ",", "]")
    case other => quote(String.valueOf(other))
  }

  def quote(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
    sb.toString
  }

  // --------------------------------------------------------------- parse
  /** Parse a JSON document. Numbers come back as Double (or Long when
    * integral), objects as Map[String, Any], arrays as List[Any]. */
  def parse(s: String): Any = new P(s).parseValue()

  private final class P(s: String) {
    private var i = 0
    def parseValue(): Any = {
      ws()
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => expect("true"); true
        case 'f' => expect("false"); false
        case 'n' => expect("null"); null
        case _ => num()
      }
    }
    private def ws(): Unit =
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\n' || s.charAt(i) == '\t' || s.charAt(i) == '\r')) i += 1
    private def expect(lit: String): Unit = {
      require(s.regionMatches(i, lit, 0, lit.length), s"expected $lit at $i")
      i += lit.length
    }
    private def obj(): Map[String, Any] = {
      i += 1; ws()
      val b = Map.newBuilder[String, Any]
      if (s.charAt(i) == '}') { i += 1; return b.result() }
      var go = true
      while (go) {
        ws(); val k = str(); ws()
        require(s.charAt(i) == ':', s"expected : at $i"); i += 1
        b += k -> parseValue(); ws()
        if (s.charAt(i) == ',') i += 1 else { require(s.charAt(i) == '}'); i += 1; go = false }
      }
      b.result()
    }
    private def arr(): List[Any] = {
      i += 1; ws()
      val b = List.newBuilder[Any]
      if (s.charAt(i) == ']') { i += 1; return b.result() }
      var go = true
      while (go) {
        b += parseValue(); ws()
        if (s.charAt(i) == ',') i += 1 else { require(s.charAt(i) == ']'); i += 1; go = false }
      }
      b.result()
    }
    private def str(): String = {
      require(s.charAt(i) == '"'); i += 1
      val sb = new StringBuilder
      while (s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          s.charAt(i) match {
            case 'n' => sb.append('\n'); case 't' => sb.append('\t')
            case 'r' => sb.append('\r'); case 'b' => sb.append('\b')
            case 'f' => sb.append('\f'); case '"' => sb.append('"')
            case '\\' => sb.append('\\'); case '/' => sb.append('/')
            case 'u' => sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar); i += 4
            case other => sb.append(other)
          }
        } else sb.append(c)
        i += 1
      }
      i += 1
      sb.toString
    }
    private def num(): Any = {
      val st = i
      while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
      val raw = s.substring(st, i)
      if (raw.contains('.') || raw.contains('e') || raw.contains('E')) raw.toDouble
      else raw.toLong
    }
  }
}
