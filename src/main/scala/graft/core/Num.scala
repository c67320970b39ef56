package graft.core

import java.util.regex.Pattern

/**
 * Locale-aware numeric parsing, mirroring the reference's `_parse_number`
 * (app/pipeline/parser.py:247-281, duplicated 8x there; implemented once here).
 *
 * Semantics (byte-exact with the Python algorithm):
 *  1. str.strip() (Python whitespace set — see [[Py.isPySpace]]);
 *  2. drop every char not in [\d.,\s-] (\d = Unicode Nd; \s = Python's re
 *     whitespace, i.e. Unicode White_Space + U+001C-1F);
 *  3. if both ',' and '.' present -> drop ',' (US 1,234.56);
 *     elif ',' present -> if exactly one ',' and <=2 chars after it, ','->'.'
 *     (RU decimal 1 234,56); else drop ',' (thousands);
 *  4. drop ASCII spaces only (Python `replace(' ', '')` — other whitespace
 *     kept);
 *  5. float(): strips Unicode White_Space (NOT U+001C-1F!) from the ends,
 *     accepts Unicode Nd digits, rejects anything else non-numeric.
 */
object Num {
  private val nonNumeric: Pattern =
    Pattern.compile("[^\\d\\.,\\s\\x1c-\\x1f-]", Pattern.UNICODE_CHARACTER_CLASS)

  /** Unicode White_Space (the float()-stripping set; narrower than
    * Py.isPySpace — excludes U+001C-1F). */
  private def isFloatWs(c: Char): Boolean =
    (c >= '\u0009' && c <= '\u000D') || c == ' ' || c == '\u0085' ||
    c == '\u00A0' || c == '\u1680' || (c >= '\u2000' && c <= '\u200A') ||
    c == '\u2028' || c == '\u2029' || c == '\u202F' || c == '\u205F' || c == '\u3000'

  /** Python float(str): end-strip White_Space, accept Unicode Nd digits,
    * then parse; None on anything float() would reject. */
  private def pyFloat(s: String): Option[Double] = {
    var a = 0
    var b = s.length
    while (a < b && isFloatWs(s.charAt(a))) a += 1
    while (b > a && isFloatWs(s.charAt(b - 1))) b -= 1
    if (a >= b) return None
    // java parseDouble trims any char <= 0x20 — Python float() does not,
    // so remaining boundary controls (e.g. U+001C) must fail here
    if (s.charAt(a) <= ' ' || s.charAt(b - 1) <= ' ') return None
    val sb = new java.lang.StringBuilder(b - a)
    var i = a
    while (i < b) {
      val c = s.charAt(i)
      if (c >= '0' && c <= '9') sb.append(c)
      else if (Character.isDigit(c)) {
        val d = Character.digit(c, 10)
        if (d < 0) return None
        sb.append(('0' + d).toChar)
      } else sb.append(c)
      i += 1
    }
    try Some(java.lang.Double.parseDouble(sb.toString))
    catch { case _: NumberFormatException => None }
  }

  def parse(raw: String): Option[Double] = {
    if (raw == null) return None
    var s = Py.pyStrip(raw)
    s = Patterns.cachedMatcher(nonNumeric, s).replaceAll("")
    val hasComma = s.indexOf(',') >= 0
    val hasDot = s.indexOf('.') >= 0
    if (hasComma && hasDot) {
      s = s.replace(",", "")
    } else if (hasComma) {
      val idx = s.lastIndexOf(',')
      val commaCount = s.count(_ == ',')
      val afterLen = s.length - idx - 1
      if (commaCount == 1 && afterLen <= 2) s = s.replace(',', '.')
      else s = s.replace(",", "")
    }
    s = s.replace(" ", "")
    if (s.isEmpty) None else pyFloat(s)
  }

  def parseOrNull(raw: String): java.lang.Double =
    parse(raw).map(java.lang.Double.valueOf).orNull
}
