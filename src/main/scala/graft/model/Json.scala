package graft.model

/** Minimal JSON AST + recursive-descent parser — the request surface
  * of the reference is JSON-over-HTTP DTOs (reference
  * platform/src/http/mod.rs routes → serde; e.g.
  * platform/src/event_segmentation.rs:439-454). The engine ships its
  * own ~150-line parser instead of a dependency: requests are tiny
  * (KBs), so parse cost is irrelevant, and the sandbox resolves no
  * new libraries.
  */
object Json {

  sealed trait JValue {
    def asOpt(field: String): Option[JValue] = this match {
      case JObj(fs) => fs.collectFirst { case (`field`, v) if v != JNull => v }
      case _        => None
    }
    def /(field: String): JValue =
      asOpt(field).getOrElse(throw JsonError(s"missing field '$field' in $render"))
    def str: String = this match {
      case JStr(s) => s
      case other   => throw JsonError(s"expected string, got ${other.render}")
    }
    def num: Double = this match {
      case JNum(d) => d
      case other   => throw JsonError(s"expected number, got ${other.render}")
    }
    def int: Int = num.toInt
    def long: Long = this match {
      case JNum(d) => d.toLong
      case other   => throw JsonError(s"expected number, got ${other.render}")
    }
    def bool: Boolean = this match {
      case JBool(b) => b
      case other    => throw JsonError(s"expected bool, got ${other.render}")
    }
    def arr: Seq[JValue] = this match {
      case JArr(vs) => vs
      case other    => throw JsonError(s"expected array, got ${other.render}")
    }
    def obj: Seq[(String, JValue)] = this match {
      case JObj(fs) => fs
      case other    => throw JsonError(s"expected object, got ${other.render}")
    }
    /** Scalar JSON value → plain Scala value (filter literals). */
    def scalar: Any = this match {
      case JStr(s)  => s
      case JNum(d)  => if (d.isWhole && math.abs(d) < 9.007199254740992e15) d.toLong else d
      case JBool(b) => b
      case JNull    => null
      case other    => throw JsonError(s"expected scalar, got ${other.render}")
    }
    def render: String = this match {
      case JNull    => "null"
      case JBool(b) => b.toString
      case JNum(d)  => if (d.isWhole) d.toLong.toString else d.toString
      case JStr(s)  => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      case JArr(vs) => vs.map(_.render).mkString("[", ",", "]")
      case JObj(fs) => fs.map { case (k, v) => "\"" + k + "\":" + v.render }.mkString("{", ",", "}")
    }
  }
  case object JNull extends JValue
  final case class JBool(value: Boolean) extends JValue
  final case class JNum(value: Double) extends JValue
  final case class JStr(value: String) extends JValue
  final case class JArr(values: Seq[JValue]) extends JValue
  final case class JObj(fields: Seq[(String, JValue)]) extends JValue

  final case class JsonError(message: String) extends IllegalArgumentException(message)

  def parse(input: String): JValue = {
    val p = new Parser(input)
    val v = p.value()
    p.skipWs()
    if (!p.atEnd) throw JsonError(s"trailing content at offset ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def atEnd: Boolean = pos >= s.length
    def skipWs(): Unit =
      while (pos < s.length && (s.charAt(pos) == ' ' || s.charAt(pos) == '\n' ||
        s.charAt(pos) == '\t' || s.charAt(pos) == '\r')) pos += 1
    private def fail(msg: String) = throw JsonError(s"$msg at offset $pos")
    private def expect(c: Char): Unit = {
      if (atEnd || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }
    def value(): JValue = {
      skipWs()
      if (atEnd) fail("unexpected end of input")
      s.charAt(pos) match {
        case '{' => jobject()
        case '[' => jarray()
        case '"' => JStr(string())
        case 't' => literal("true"); JBool(true)
        case 'f' => literal("false"); JBool(false)
        case 'n' => literal("null"); JNull
        case _   => number()
      }
    }
    private def literal(lit: String): Unit = {
      if (!s.startsWith(lit, pos)) fail(s"invalid literal (expected $lit)")
      pos += lit.length
    }
    private def jobject(): JValue = {
      expect('{'); skipWs()
      if (!atEnd && s.charAt(pos) == '}') { pos += 1; return JObj(Nil) }
      val fields = Seq.newBuilder[(String, JValue)]
      var more = true
      while (more) {
        skipWs()
        val k = string()
        skipWs(); expect(':')
        fields += (k -> value())
        skipWs()
        if (!atEnd && s.charAt(pos) == ',') pos += 1
        else { expect('}'); more = false }
      }
      JObj(fields.result())
    }
    private def jarray(): JValue = {
      expect('['); skipWs()
      if (!atEnd && s.charAt(pos) == ']') { pos += 1; return JArr(Nil) }
      val values = Seq.newBuilder[JValue]
      var more = true
      while (more) {
        values += value()
        skipWs()
        if (!atEnd && s.charAt(pos) == ',') pos += 1
        else { expect(']'); more = false }
      }
      JArr(values.result())
    }
    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (!atEnd && s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          if (atEnd) fail("unterminated escape")
          s.charAt(pos) match {
            case '"'  => sb.append('"')
            case '\\' => sb.append('\\')
            case '/'  => sb.append('/')
            case 'b'  => sb.append('\b')
            case 'f'  => sb.append('\f')
            case 'n'  => sb.append('\n')
            case 'r'  => sb.append('\r')
            case 't'  => sb.append('\t')
            case 'u' =>
              if (pos + 4 >= s.length) fail("truncated \\u escape")
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 4
            case other => fail(s"invalid escape \\$other")
          }
        } else sb.append(c)
        pos += 1
      }
      expect('"')
      sb.toString
    }
    private def number(): JValue = {
      val start = pos
      if (!atEnd && (s.charAt(pos) == '-' || s.charAt(pos) == '+')) pos += 1
      while (!atEnd && (s.charAt(pos).isDigit || s.charAt(pos) == '.' ||
        s.charAt(pos) == 'e' || s.charAt(pos) == 'E' ||
        s.charAt(pos) == '-' || s.charAt(pos) == '+')) pos += 1
      if (pos == start) fail(s"unexpected character '${s.charAt(pos)}'")
      try JNum(s.substring(start, pos).toDouble)
      catch { case _: NumberFormatException => fail(s"invalid number '${s.substring(start, pos)}'") }
    }
  }
}
