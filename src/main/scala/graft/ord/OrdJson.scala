package graft.ord

import com.fasterxml.jackson.databind.JsonNode

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Byte-exact serializer for the reference's JSON sink format —
  * `json.dump(data, f, indent=2, ensure_ascii=False)`
  * (`/root/reference/web_scrpaer_2.py:545-548`, `web_scraper.py:579-581`).
  *
  * A user diffing regenerated output against the checked-in
  * `ord_formatted_data*.json` golden files must see ZERO bytes of
  * difference (OrdByteExactSpec asserts this for all five), which pins:
  *
  *  - indent=2 layout: 2-space nesting, `"key": value`, `,` + newline
  *    separators, empty containers as `{}` / `[]`, no trailing newline;
  *  - ensure_ascii=False string escaping: only `"`, `\` and control
  *    chars are escaped (short forms for \b \t \n \f \r, `\u00XX` for
  *    the rest), all other characters written raw as UTF-8;
  *  - CPython float repr: shortest decimal string that round-trips,
  *    fixed notation for decimal exponent in [-4, 16), scientific with a
  *    signed ≥2-digit exponent outside — NOT Java's `Double.toString`,
  *    which switches to scientific already at 1e-3 (0.000143 would print
  *    `1.43E-4`) and pre-JDK-19 is not always shortest;
  *  - ints print without a decimal point. The normalized model stores
  *    amounts as doubles, so an integral double renders as an int —
  *    correct for every value the reference ever emitted (the scraped
  *    source types integers as JSON ints; no `x.0` lexeme appears in any
  *    golden file).
  */
object OrdJson {

  /** CPython `repr(float)` equivalent for non-integral finite doubles
    * (and signed zeros: Python prints -0.0 as "-0.0"). */
  def pyFloatRepr(v: Double): String = {
    require(!v.isNaN && !v.isInfinite, s"non-finite double unrepresentable in JSON: $v")
    if (v == 0.0)
      return if (java.lang.Double.doubleToRawLongBits(v) != 0L) "-0.0" else "0.0"
    // shortest round-tripping significand: try 1..17 significant digits
    var digits: String = null
    var exp10 = 0
    var p = 1
    while (digits == null && p <= 17) {
      val cand = String.format(java.util.Locale.ROOT, s"%.${p - 1}e", Double.box(v))
      if (cand.toDouble == v) {
        val Array(mant, e) = cand.split("e")
        digits = mant.replace("-", "").replace(".", "")
        // strip trailing zeros the %e formatting may have padded
        while (digits.length > 1 && digits.endsWith("0"))
          digits = digits.substring(0, digits.length - 1)
        exp10 = e.toInt
      }
      p += 1
    }
    val sign = if (java.lang.Double.doubleToRawLongBits(v) < 0L) "-" else ""
    if (exp10 >= -4 && exp10 < 16) {
      // fixed notation (CPython: -4 <= exp < 16)
      if (exp10 >= digits.length - 1) {
        val intPart = digits + "0" * (exp10 - (digits.length - 1))
        s"$sign$intPart.0"
      } else if (exp10 >= 0) {
        s"$sign${digits.substring(0, exp10 + 1)}.${digits.substring(exp10 + 1)}"
      } else {
        s"${sign}0.${"0" * (-exp10 - 1)}$digits"
      }
    } else {
      // scientific: d.ddd e± with at least 2 exponent digits (1e+22 style)
      val mant =
        if (digits.length == 1) digits else s"${digits.head}.${digits.tail}"
      val esign = if (exp10 < 0) "-" else "+"
      val eabs = math.abs(exp10)
      val epad = if (eabs < 10) s"0$eabs" else eabs.toString
      s"$sign${mant}e$esign$epad"
    }
  }

  /** Python `json` string escaping with ensure_ascii=False. */
  private def escape(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\b' => sb.append("\\b")
      case '\t' => sb.append("\\t")
      case '\n' => sb.append("\\n")
      case '\f' => sb.append("\\f")
      case '\r' => sb.append("\\r")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  private def renderNumber(n: JsonNode, sb: StringBuilder): Unit =
    if (n.isIntegralNumber) sb.append(n.asText)
    else {
      val v = n.asDouble
      // integral double → int lexeme (see Scaladoc: matches every golden
      // file; the reference's source JSON types integers as ints).
      // -0.0 is NOT integral-rendered: Python prints it "-0.0".
      // The bound is 2^53 (the exact-integer range of a double), not
      // 1e16: an integral value in [1e16, 2^53) that came from a source
      // int must render as the int lexeme, not pyFloatRepr's "1e+16".
      // Residual ambiguity above 2^53 (and for a true source FLOAT with
      // an integral value) is inherent to storing numbers as doubles.
      val negZero = v == 0.0 && java.lang.Double.doubleToRawLongBits(v) != 0L
      if (!negZero && v == math.rint(v) && math.abs(v) < 9007199254740992.0)
        sb.append(v.toLong.toString)
      else sb.append(pyFloatRepr(v))
    }

  private def render(n: JsonNode, ind: Int, sb: StringBuilder): Unit = n match {
    case o if o.isObject =>
      val fields = o.properties.asScala.toSeq
      if (fields.isEmpty) sb.append("{}")
      else {
        sb.append("{\n")
        fields.zipWithIndex.foreach { case (e, i) =>
          sb.append(" " * (ind + 2))
          escape(e.getKey, sb)
          sb.append(": ")
          render(e.getValue, ind + 2, sb)
          if (i < fields.size - 1) sb.append(',')
          sb.append('\n')
        }
        sb.append(" " * ind).append('}')
      }
    case a if a.isArray =>
      val elems = a.elements.asScala.toSeq
      if (elems.isEmpty) sb.append("[]")
      else {
        sb.append("[\n")
        elems.zipWithIndex.foreach { case (e, i) =>
          sb.append(" " * (ind + 2))
          render(e, ind + 2, sb)
          if (i < elems.size - 1) sb.append(',')
          sb.append('\n')
        }
        sb.append(" " * ind).append(']')
      }
    case s if s.isTextual => escape(s.asText, sb)
    case b if b.isBoolean => sb.append(if (b.asBoolean) "true" else "false")
    case x if x.isNull => sb.append("null")
    case num => renderNumber(num, sb)
  }

  /** Pretty-print exactly as `json.dump(..., indent=2, ensure_ascii=False)`
    * (no trailing newline — json.dump doesn't write one). */
  def prettyPrint(root: JsonNode): String = {
    val sb = new StringBuilder
    render(root, 0, sb)
    sb.toString
  }

  /** Render a file's datasets back to the reference's exact on-disk
    * bytes (OrdFixtures.renderFile rebuilds the nested JSON shape; this
    * adds the byte-exact formatting). */
  def renderBytes(datasets: Seq[OrdDataset]): Array[Byte] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    prettyPrint(OrdFixtures.renderFile(mapper, datasets))
      .getBytes(StandardCharsets.UTF_8)
  }

  /** The sink itself: write one formatted-data JSON file, byte-compatible
    * with the reference's `json.dump` output. */
  def writeFile(path: String, datasets: Seq[OrdDataset]): Unit =
    Files.write(Paths.get(path), renderBytes(datasets))
}
