package graft.util

import scala.collection.mutable

/** Minimal recursive-descent JSON parser + writer for the engine's own
  * manifests (manifest.json, generations.json) — replaces the earlier
  * regex field-scraping, which silently misread reordered or nested
  * fields. Values map to: Map[String, Any] (object, insertion-ordered),
  * Vector[Any] (array), String, Long (integral), Double, Boolean, null. */
object Json {

  def parse(s: String): Any = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    require(p.eof, s"trailing JSON content at offset ${p.pos}")
    v
  }

  /** Typed helpers over a parsed object. */
  def obj(v: Any): Map[String, Any] = v.asInstanceOf[Map[String, Any]]
  def arr(v: Any): Vector[Any] = v.asInstanceOf[Vector[Any]]
  def long(v: Any): Long = v match {
    case l: Long => l
    case d: Double => d.toLong
    case other => sys.error(s"not a number: $other")
  }
  def double(v: Any): Double = v match {
    case l: Long => l.toDouble
    case d: Double => d
    case other => sys.error(s"not a number: $other")
  }

  /** Serialize the same value shapes back to compact JSON. */
  def write(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case l: Long => l.toString
    case i: Int => i.toString
    case d: Double =>
      if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) d.toLong.toString
      else d.toString
    case s: String => quote(s)
    case m: collection.Map[_, _] =>
      m.map { case (k, x) => s"${quote(k.toString)}:${write(x)}" }
        .mkString("{", ",", "}")
    case xs: collection.Seq[_] => xs.map(write).mkString("[", ",", "]")
    case other => sys.error(s"unwritable JSON value: $other")
  }

  private def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"').toString
  }

  private final class P(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def ws(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      require(!eof && s.charAt(pos) == c,
        s"expected '$c' at offset $pos in JSON")
      pos += 1
    }

    def value(): Any = {
      ws()
      require(!eof, "unexpected end of JSON")
      s.charAt(pos) match {
        case '{' => jobj()
        case '[' => jarr()
        case '"' => jstr()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _ => jnum()
      }
    }

    private def lit(word: String, v: Any): Any = {
      require(s.regionMatches(pos, word, 0, word.length),
        s"bad literal at offset $pos")
      pos += word.length
      v
    }

    private def jobj(): Map[String, Any] = {
      expect('{'); ws()
      val m = mutable.LinkedHashMap.empty[String, Any]
      if (!eof && s.charAt(pos) == '}') { pos += 1 }
      else {
        var done = false
        while (!done) {
          ws()
          val k = jstr()
          ws(); expect(':')
          m(k) = value()
          ws()
          if (!eof && s.charAt(pos) == ',') pos += 1
          else { expect('}'); done = true }
        }
      }
      // ListMap preserves insertion order (manifests re-serialize stably)
      scala.collection.immutable.ListMap.from(m)
    }

    private def jarr(): Vector[Any] = {
      expect('['); ws()
      val b = Vector.newBuilder[Any]
      if (!eof && s.charAt(pos) == ']') { pos += 1; return b.result() }
      var done = false
      while (!done) {
        b += value()
        ws()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      b.result()
    }

    private def jstr(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!eof && s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          require(!eof, "unterminated escape")
          s.charAt(pos) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'u' =>
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 4
            case other => sys.error(s"bad escape \\$other")
          }
          pos += 1
        } else { sb.append(c); pos += 1 }
      }
      expect('"')
      sb.toString
    }

    private def jnum(): Any = {
      val st = pos
      if (!eof && (s.charAt(pos) == '-' || s.charAt(pos) == '+')) pos += 1
      var isDouble = false
      while (!eof && (s.charAt(pos).isDigit || "eE+-.".indexOf(s.charAt(pos)) >= 0)) {
        if (".eE".indexOf(s.charAt(pos)) >= 0) isDouble = true
        pos += 1
      }
      val t = s.substring(st, pos)
      require(t.nonEmpty && t != "-", s"bad number at offset $st")
      if (isDouble) t.toDouble else t.toLong
    }
  }
}
