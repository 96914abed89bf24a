package graft.io

/** Minimal JSON document parser for the small-document geo formats
  * (TopoJSON topologies, ESRIJSON feature sets): parses a whole text into
  * plain Scala values — Map[String, Any] / Vector[Any] / Double / String /
  * Boolean / null. The streaming GeoJSON reader keeps its own incremental
  * parser; these formats are single shared-structure documents (TopoJSON's
  * arcs are referenced globally) so whole-document parsing is the correct
  * granularity. */
object JsonMini {

  def parse(s: String): Any = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    if (p.i < s.length) p.fail("trailing content")
    v
  }

  /** render a parsed value back to its JSON-ish string form (property
    * values surface as strings in the dynamic schema, like GeoJSON:
    * scalars verbatim, nested structures as compact JSON) */
  def scalarString(v: Any): String = v match {
    case null => null
    case s: String => s
    case d: Double => if (d == d.toLong.toDouble && math.abs(d) < 1e15) d.toLong.toString else d.toString
    case b: Boolean => b.toString
    case m: Map[String @unchecked, Any @unchecked] =>
      m.map { case (k, mv) => "\"" + k + "\":" + quoted(mv) }.mkString("{", ",", "}")
    case a: Vector[Any @unchecked] => a.map(quoted).mkString("[", ",", "]")
    case other => other.toString
  }
  private def quoted(v: Any): String = v match {
    case s: String => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    case null => "null"
    case other => scalarString(other)
  }

  private[io] final class P(s: String) {
    var i = 0
    def ws(): Unit = {
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\n' ||
        s.charAt(i) == '\r' || s.charAt(i) == '\t')) i += 1
    }
    def fail(m: String): Nothing =
      throw new IllegalArgumentException(s"invalid JSON at offset $i: $m")
    private def expect(c: Char): Unit = {
      ws()
      if (i >= s.length || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }
    def value(): Any = {
      ws()
      if (i >= s.length) fail("eof")
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => string()
        case 't' => lit("true", java.lang.Boolean.TRUE)
        case 'f' => lit("false", java.lang.Boolean.FALSE)
        case 'n' => lit("null", null)
        case _ => number()
      }
    }
    private def lit(word: String, v: Any): Any = {
      if (!s.regionMatches(i, word, 0, word.length)) fail(s"expected $word")
      i += word.length; v
    }
    private def obj(): Map[String, Any] = {
      expect('{'); ws()
      if (i < s.length && s.charAt(i) == '}') { i += 1; return Map.empty }
      val b = Map.newBuilder[String, Any]
      var done = false
      while (!done) {
        ws()
        val k = string()
        expect(':')
        b += (k -> value())
        ws()
        if (i < s.length && s.charAt(i) == ',') i += 1
        else { expect('}'); done = true }
      }
      b.result()
    }
    private def arr(): Vector[Any] = {
      expect('['); ws()
      if (i < s.length && s.charAt(i) == ']') { i += 1; return Vector.empty }
      val b = Vector.newBuilder[Any]
      var done = false
      while (!done) {
        b += value()
        ws()
        if (i < s.length && s.charAt(i) == ',') i += 1
        else { expect(']'); done = true }
      }
      b.result()
    }
    def string(): String = {
      expect('"')
      val sb = new java.lang.StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (i >= s.length) fail("bad escape")
          s.charAt(i) match {
            case '"' => sb.append('"'); case '\\' => sb.append('\\')
            case '/' => sb.append('/'); case 'b' => sb.append('\b')
            case 'f' => sb.append('\f'); case 'n' => sb.append('\n')
            case 'r' => sb.append('\r'); case 't' => sb.append('\t')
            case 'u' =>
              if (i + 4 >= s.length) fail("bad \\u")
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case other => fail(s"bad escape \\$other")
          }
        } else sb.append(c)
        i += 1
      }
      if (i >= s.length) fail("unterminated string")
      i += 1
      sb.toString
    }
    private def number(): Double = {
      val st = i
      if (i < s.length && (s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
      while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.' ||
        s.charAt(i) == 'e' || s.charAt(i) == 'E' || s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
      if (i == st) fail("expected number")
      try s.substring(st, i).toDouble
      catch { case _: NumberFormatException => fail(s"bad number '${s.substring(st, i)}'") }
    }
  }
}
