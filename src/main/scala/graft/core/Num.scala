package graft.core

import java.util.regex.Pattern

/**
 * Locale-aware numeric parsing, mirroring the reference's `_parse_number`
 * (app/pipeline/parser.py:247-281, duplicated 8x there; implemented once here).
 *
 * Semantics (byte-exact with the Python algorithm):
 *  1. strip the string;
 *  2. drop every char not in [\d.,\s-] (\d and \s Unicode-aware, as in Python 3);
 *  3. if both ',' and '.' present -> drop ',' (US 1,234.56);
 *     elif ',' present -> if exactly one ',' and <=2 chars after it, ','->'.'
 *     (RU decimal 1 234,56); else drop ',' (thousands);
 *  4. drop ASCII spaces only (Python `replace(' ', '')` — other whitespace
 *     kept, which then fails float() -> None, mirrored here);
 *  5. parse as double; unparsable/empty -> None.
 */
object Num {
  private val nonNumeric: Pattern =
    Pattern.compile("[^\\d\\.,\\s-]", Pattern.UNICODE_CHARACTER_CLASS)

  /** Python float() accepts optional sign, decimal, exponent, inf/nan names.
    * After step 2 only digits . , space - survive, so a simple grammar check
    * before Java's parseDouble (which is laxer re 'd'/'f' suffixes, irrelevant
    * here) is enough. */
  def parse(raw: String): Option[Double] = {
    if (raw == null) return None
    var s = raw.strip() // Java 11 strip() = Unicode-aware, like Python str.strip()
    s = nonNumeric.matcher(s).replaceAll("")
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
    if (s.isEmpty) None
    else {
      // Python float() would reject embedded non-ASCII whitespace, multiple
      // dots, misplaced '-'; java parseDouble rejects those too.
      try {
        // Reject things Java accepts but Python would not after our charset
        // filter: nothing of the sort survives ([dDfF] suffixes stripped in
        // step 2), so parseDouble is a faithful float().
        Some(java.lang.Double.parseDouble(s))
      } catch { case _: NumberFormatException => None }
    }
  }

  def parseOrNull(raw: String): java.lang.Double =
    parse(raw).map(java.lang.Double.valueOf).orNull
}
