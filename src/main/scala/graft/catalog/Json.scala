package graft.catalog

import scala.collection.mutable

/** Minimal JSON AST + parser + writer.
  *
  * The reference pipeline exchanges all inter-stage state as JSON artifacts
  * written with Python's `json` module (`1_collect_src_snapshots.py:93-94`,
  * `2_collect_database_schema_info.py:253-254`) and reads them back with
  * `json.load` (`3_create_dst_tables.py:23-31`). Our build runs with zero
  * dependency egress (offline coursier), so instead of pulling a JSON library
  * we carry a ~150-line codec. It is used only for *driver-side metadata* —
  * snapshot logs and stage artifacts, a few KB each — never on the data path,
  * so performance is irrelevant; correctness and stable formatting are what
  * matter.
  */
sealed trait JValue {
  def render: String = Json.write(this)
}
case object JNull extends JValue
final case class JBool(value: Boolean) extends JValue
final case class JNum(value: Double) extends JValue {
  def toLong: Long = value.toLong
}
final case class JStr(value: String) extends JValue
final case class JArr(values: Vector[JValue]) extends JValue
final case class JObj(fields: Vector[(String, JValue)]) extends JValue {
  private lazy val map = fields.toMap
  def apply(key: String): JValue = map.getOrElse(key, JNull)
  def get(key: String): Option[JValue] = map.get(key)
  def str(key: String): String = apply(key) match {
    case JStr(s) => s
    case JNull   => ""
    case other   => Json.write(other)
  }
  def long(key: String): Long = apply(key) match {
    case JNum(n) => n.toLong
    case JStr(s) => s.toLong
    case _       => 0L
  }
  def arr(key: String): Vector[JValue] = apply(key) match {
    case JArr(vs) => vs
    case _        => Vector.empty
  }
  def obj(key: String): JObj = apply(key) match {
    case o: JObj => o
    case _       => JObj(Vector.empty)
  }
  def strMap(key: String): Map[String, String] = apply(key) match {
    case JObj(fs) => fs.map { case (k, v) => k -> (v match {
      case JStr(s) => s
      case JNum(n) => if (n == n.toLong.toDouble) n.toLong.toString else n.toString
      case JBool(b) => b.toString
      case other => Json.write(other)
    }) }.toMap
    case _ => Map.empty
  }
}

object Json {

  // ---- writing ----

  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    sb.append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
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

  private def renderNum(d: Double): String =
    if (d.isWhole && math.abs(d) < 9.007199254740992e15) d.toLong.toString
    else d.toString

  def write(v: JValue): String = v match {
    case JNull        => "null"
    case JBool(b)     => b.toString
    case JNum(n)      => renderNum(n)
    case JStr(s)      => escape(s)
    case JArr(vs)     => vs.map(write).mkString("[", ",", "]")
    case JObj(fields) => fields.map { case (k, x) => escape(k) + ":" + write(x) }.mkString("{", ",", "}")
  }

  /** Pretty writer matching the reference's `json.dump(..., indent=2)` shape. */
  def writePretty(v: JValue, indent: Int = 0): String = {
    val pad  = "  " * indent
    val pad1 = "  " * (indent + 1)
    v match {
      case JArr(vs) if vs.nonEmpty =>
        vs.map(x => pad1 + writePretty(x, indent + 1)).mkString("[\n", ",\n", s"\n$pad]")
      case JObj(fs) if fs.nonEmpty =>
        fs.map { case (k, x) => s"$pad1${escape(k)}: ${writePretty(x, indent + 1)}" }
          .mkString("{\n", ",\n", s"\n$pad}")
      case other => write(other)
    }
  }

  // convenience constructors
  def obj(fields: (String, JValue)*): JObj = JObj(fields.toVector)
  def arr(values: JValue*): JArr = JArr(values.toVector)
  def str(s: String): JValue = if (s == null) JNull else JStr(s)
  def num(n: Long): JNum = JNum(n.toDouble)
  def num(n: Double): JNum = JNum(n)
  def bool(b: Boolean): JBool = JBool(b)
  def fromStrMap(m: Map[String, String]): JObj =
    JObj(m.toVector.sortBy(_._1).map { case (k, v) => k -> JStr(v) })

  // ---- parsing (recursive descent) ----

  def parse(input: String): JValue = {
    val p = new Parser(input)
    val v = p.parseValue()
    p.skipWs()
    require(p.eof, s"trailing characters at offset ${p.pos} in JSON input")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def peek: Char = s.charAt(pos)
    def skipWs(): Unit =
      while (!eof && (peek == ' ' || peek == '\n' || peek == '\t' || peek == '\r')) pos += 1

    def expect(c: Char): Unit = {
      skipWs()
      require(!eof && peek == c, s"expected '$c' at offset $pos")
      pos += 1
    }

    def parseValue(): JValue = {
      skipWs()
      require(!eof, "unexpected end of JSON input")
      peek match {
        case '{' => parseObj()
        case '[' => parseArr()
        case '"' => JStr(parseString())
        case 't' => literal("true"); JBool(true)
        case 'f' => literal("false"); JBool(false)
        case 'n' => literal("null"); JNull
        case _   => parseNum()
      }
    }

    private def literal(lit: String): Unit = {
      require(s.regionMatches(pos, lit, 0, lit.length), s"bad literal at offset $pos")
      pos += lit.length
    }

    private def parseObj(): JObj = {
      expect('{')
      val fields = mutable.ArrayBuffer.empty[(String, JValue)]
      skipWs()
      if (!eof && peek == '}') { pos += 1; return JObj(fields.toVector) }
      var done = false
      while (!done) {
        skipWs()
        val k = parseString()
        expect(':')
        fields += (k -> parseValue())
        skipWs()
        if (!eof && peek == ',') pos += 1
        else { expect('}'); done = true }
      }
      JObj(fields.toVector)
    }

    private def parseArr(): JArr = {
      expect('[')
      val values = mutable.ArrayBuffer.empty[JValue]
      skipWs()
      if (!eof && peek == ']') { pos += 1; return JArr(values.toVector) }
      var done = false
      while (!done) {
        values += parseValue()
        skipWs()
        if (!eof && peek == ',') pos += 1
        else { expect(']'); done = true }
      }
      JArr(values.toVector)
    }

    private def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      while ({ require(!eof, "unexpected end of JSON input inside string"); peek != '"' }) {
        if (peek == '\\') {
          pos += 1
          require(!eof, "unexpected end of JSON input inside escape sequence")
          peek match {
            case '"'  => sb.append('"'); pos += 1
            case '\\' => sb.append('\\'); pos += 1
            case '/'  => sb.append('/'); pos += 1
            case 'b'  => sb.append('\b'); pos += 1
            case 'f'  => sb.append('\f'); pos += 1
            case 'n'  => sb.append('\n'); pos += 1
            case 'r'  => sb.append('\r'); pos += 1
            case 't'  => sb.append('\t'); pos += 1
            case 'u'  =>
              require(pos + 5 <= s.length, "unexpected end of JSON input inside \\u escape")
              sb.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
              pos += 5
            case c => throw new IllegalArgumentException(s"bad escape '\\$c' at offset $pos")
          }
        } else { sb.append(peek); pos += 1 }
      }
      pos += 1
      sb.toString
    }

    private def parseNum(): JNum = {
      val start = pos
      while (!eof && ("+-0123456789.eE".indexOf(peek) >= 0)) pos += 1
      JNum(s.substring(start, pos).toDouble)
    }
  }
}
