package graft.util

/** Minimal recursive-descent JSON parser — the offline dependency
  * budget has no JSON library, and [[graft.sources.IcebergRead]] must
  * walk a deeply nested metadata document where the ad-hoc field
  * extractors that suffice for Delta's flat action lines would be
  * fragile. Parses the full grammar into plain Scala values:
  *
  *   object  → Map[String, Any]      number (integral) → Long
  *   array   → List[Any]             number (fraction/exp) → Double
  *   string  → String                true/false → Boolean, null → null
  *
  * No streaming, no error recovery — metadata documents are small by
  * design (table metadata is kilobytes; the scale-bearing structures
  * live in avro manifests and parquet, not here). */
object Json {

  def parse(s: String): Any = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    require(p.eof, s"trailing JSON content at ${p.pos}")
    v
  }

  /** Null-safe nested access: `get(m, "a", "b")` = m("a")("b") or null. */
  def get(v: Any, path: String*): Any =
    path.foldLeft(v) {
      case (m: Map[_, _], k) => m.asInstanceOf[Map[String, Any]].getOrElse(k, null)
      case _ => null
    }

  def str(v: Any, path: String*): Option[String] =
    Option(get(v, path: _*)).collect { case s: String => s }

  def long(v: Any, path: String*): Option[Long] =
    Option(get(v, path: _*)).collect {
      case l: Long => l
      case d: Double => d.toLong
    }

  def list(v: Any, path: String*): List[Any] =
    Option(get(v, path: _*)).collect { case l: List[_] => l }
      .getOrElse(Nil).asInstanceOf[List[Any]]

  /** Render the same value shapes [[parse]] produces back to compact
    * JSON (objects keep insertion order — callers pass ListMap/Vector
    * when field order matters for readability; the spec never does).
    * Strings are escaped per RFC 8259 (the two mandatory classes:
    * quote/backslash and control characters). */
  def render(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case l: Long => l.toString
    case i: Int => i.toString
    case d: Double =>
      require(!d.isNaN && !d.isInfinite, "JSON has no NaN/Infinity")
      d.toString
    case s: String => renderString(s)
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => renderString(k.toString) + ":" + render(x) }
        .mkString("{", ",", "}")
    case xs: Iterable[_] => xs.map(render).mkString("[", ",", "]")
    case other => sys.error(s"unrenderable JSON value: ${other.getClass}")
  }

  private def renderString(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb ++= "\\\""
      case '\\' => sb ++= "\\\\"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c if c < 0x20 => sb ++= f"\\u${c.toInt}%04x"
      case c => sb += c
    }
    sb.append('"').result()
  }

  private final class P(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def ws(): Unit = while (!eof && s(pos).isWhitespace) pos += 1

    private def expect(c: Char): Unit = {
      require(!eof && s(pos) == c, s"expected '$c' at $pos")
      pos += 1
    }

    def value(): Any = {
      ws()
      require(!eof, "unexpected end of JSON")
      s(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => string()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _ => number()
      }
    }

    private def lit(word: String, v: Any): Any = {
      require(s.regionMatches(pos, word, 0, word.length),
        s"bad literal at $pos")
      pos += word.length
      v
    }

    private def obj(): Map[String, Any] = {
      expect('{'); ws()
      val b = Map.newBuilder[String, Any]
      if (!eof && s(pos) == '}') { pos += 1; return b.result() }
      var more = true
      while (more) {
        ws()
        val k = string()
        ws(); expect(':')
        b += (k -> value())
        ws()
        if (!eof && s(pos) == ',') pos += 1
        else { expect('}'); more = false }
      }
      b.result()
    }

    private def arr(): List[Any] = {
      expect('['); ws()
      val b = List.newBuilder[Any]
      if (!eof && s(pos) == ']') { pos += 1; return b.result() }
      var more = true
      while (more) {
        b += value()
        ws()
        if (!eof && s(pos) == ',') pos += 1
        else { expect(']'); more = false }
      }
      b.result()
    }

    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!eof && s(pos) != '"') {
        if (s(pos) == '\\') {
          pos += 1
          require(!eof, "dangling escape")
          s(pos) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'u' =>
              sb += Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar
              pos += 4
            case other => sb += other
          }
          pos += 1
        } else { sb += s(pos); pos += 1 }
      }
      expect('"')
      sb.result()
    }

    private def number(): Any = {
      val start = pos
      if (!eof && s(pos) == '-') pos += 1
      while (!eof && (s(pos).isDigit || "+-.eE".contains(s(pos)))) pos += 1
      val t = s.substring(start, pos)
      require(t.nonEmpty && t != "-", s"bad number at $start")
      if (t.exists(c => c == '.' || c == 'e' || c == 'E')) t.toDouble
      else t.toLong
    }
  }
}
