package graft

/** One-off differential harness main: compares the Scala ports (Chunker,
  * TextExporter) against cases pre-generated from the reference's own Python
  * functions (see SURVEY.md §2.2 T5/T8). Run manually via
  * `sbt "Test/runMain graft.DiffCheck /tmp/diffcheck/cases.json"`.
  * Not part of `sbt test` — the JSON fixture is machine-local.
  */
object DiffCheck {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/diffcheck/cases.json")
    val raw = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    // tiny JSON reader (test scope only; deterministic input we generated)
    val cases = ujsonParse(raw)
    var total = 0
    var failed = 0
    cases.foreach { c =>
      total += 1
      val kind = c("kind").asInstanceOf[String]
      val text = c("text").asInstanceOf[String]
      if (kind == "chunk") {
        val size = c("size").asInstanceOf[Double].toInt
        val ov = c("overlap").asInstanceOf[Double].toInt
        val expected = c("expected").asInstanceOf[List[Any]].map { e =>
          val t = e.asInstanceOf[List[Any]]
          (t(0).asInstanceOf[String], t(1).asInstanceOf[Double].toInt, t(2).asInstanceOf[Double].toInt)
        }
        val actual = graft.chunk.Chunker.chunkText(text, size, ov).map(r => (r.text, r.start, r.end)).toList
        if (actual != expected) {
          failed += 1
          if (failed <= 3) {
            System.err.println(s"CHUNK MISMATCH size=$size ov=$ov text=${text.take(80)}...")
            System.err.println(s"  expected: ${expected.take(3)}")
            System.err.println(s"  actual:   ${actual.take(3)}")
          }
        }
      } else {
        val expected = c("expected").asInstanceOf[String]
        val actual = graft.export.TextExporter.stripMarkdown(text)
        if (actual != expected) {
          failed += 1
          if (failed <= 3) {
            System.err.println(s"STRIP MISMATCH input=${text.replace("\n", "\\n").take(120)}")
            System.err.println(s"  expected: ${expected.replace("\n", "\\n").take(120)}")
            System.err.println(s"  actual:   ${actual.replace("\n", "\\n").take(120)}")
          }
        }
      }
    }
    println(s"diffcheck: $total cases, $failed failures")
    if (failed > 0) sys.exit(1)
  }

  // --- minimal JSON parser (arrays, objects, strings, numbers, bool, null) ---
  private def ujsonParse(s: String): List[Map[String, Any]] = {
    var i = 0
    def ws(): Unit = while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\n' || s.charAt(i) == '\t' || s.charAt(i) == '\r')) i += 1
    def value(): Any = {
      ws()
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => i += 4; true
        case 'f' => i += 5; false
        case 'n' => i += 4; null
        case _ => num()
      }
    }
    def obj(): Map[String, Any] = {
      i += 1; ws()
      val b = Map.newBuilder[String, Any]
      if (s.charAt(i) == '}') { i += 1; return b.result() }
      var go = true
      while (go) {
        ws(); val k = str(); ws(); i += 1 // ':'
        b += (k -> value()); ws()
        if (s.charAt(i) == ',') i += 1 else { i += 1; go = false }
      }
      b.result()
    }
    def arr(): List[Any] = {
      i += 1; ws()
      val b = List.newBuilder[Any]
      if (s.charAt(i) == ']') { i += 1; return b.result() }
      var go = true
      while (go) {
        b += value(); ws()
        if (s.charAt(i) == ',') i += 1 else { i += 1; go = false }
      }
      b.result()
    }
    def str(): String = {
      i += 1
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
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar); i += 4
            case other => sb.append(other)
          }
        } else sb.append(c)
        i += 1
      }
      i += 1
      sb.toString
    }
    def num(): Double = {
      val st = i
      while (i < s.length && "+-0123456789.eE".indexOf(s.charAt(i)) >= 0) i += 1
      s.substring(st, i).toDouble
    }
    value().asInstanceOf[List[Any]].map(_.asInstanceOf[Map[String, Any]])
  }
}
