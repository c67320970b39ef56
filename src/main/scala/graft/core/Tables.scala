package graft.core

import java.util.regex.Pattern

/**
 * Shared text helpers + the embedded-table model.
 *
 * An [[Tab]] mirrors the reference's pandas table: `header` is the first
 * grid row (pandas `columns`), `rows` the rest; the metadata columns
 * `_page` / `_table_id` appended by the extractor
 * (app/pipeline/extractor.py:93-94) are INCLUDED in header/rows — their
 * presence affects column counts and positional layouts (e.g. the >=13
 * layout in precise_table_parser.py:193-203 counts them).
 *
 * Cells are Option[String]: None mirrors pandas NaN (pd.isna true); the
 * reference's `str(cell)` of a missing value yields "None", mirrored by
 * [[Py.pyStr]].
 */
final case class Tab(header: IndexedSeq[Option[String]], rows: IndexedSeq[IndexedSeq[Option[String]]]) {
  def nCols: Int = header.length
}

/** Python-semantics string helpers (Unicode classes, casefolding). */
object Py {
  private val wsRun = Pattern.compile("\\s+", Pattern.UNICODE_CHARACTER_CLASS)
  private val nlRun = Pattern.compile("\\n+")
  private val nonWordSpace = Pattern.compile("[^\\w\\s]", Pattern.UNICODE_CHARACTER_CLASS)

  /** `str(cell)` over an optional cell: missing -> "None" (pandas NaN str). */
  def pyStr(cell: Option[String]): String = cell.getOrElse("None")

  /** Python str.lower(): Locale-independent toLowerCase. */
  def lower(s: String): String = s.toLowerCase(java.util.Locale.ROOT)

  /** Python str.strip(). */
  def strip(s: String): String = s.strip()

  /** `_clean_name` (invoice_parser.py:413-420): \s+ -> ' ', \n+ -> ' ', strip. */
  def cleanName(name: String): String = {
    var n = wsRun.matcher(name).replaceAll(" ")
    n = nlRun.matcher(n).replaceAll(" ")
    n.strip()
  }

  /** Column-name cleanup used by synonym matchers
    * (universal_parser.py:478-479): lower, [^\w\s] -> ' ', collapse spaces. */
  def cleanColName(col: String): String = {
    var s = lower(col).strip()
    s = nonWordSpace.matcher(s).replaceAll(" ")
    s.split("\\s+").filter(_.nonEmpty).mkString(" ")
  }

  /** any(indicator in s for indicator in words) over a lowercase string. */
  def containsAny(sLower: String, words: Seq[String]): Boolean =
    words.exists(sLower.contains)

  /** Collapse \s+ to ' ' then strip (precise_table_parser.py:145,297). */
  def collapseWs(s: String): String = wsRun.matcher(s).replaceAll(" ").strip()
}

/** Compiled regex patterns with Python-equivalent flags. */
object Patterns {
  import graft.rules.Rules

  private def py(p: String): Pattern =
    Pattern.compile(p,
      Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE |
      Pattern.MULTILINE | Pattern.UNICODE_CHARACTER_CLASS)

  // exact-match helpers (Python re.match anchors at start only)
  val digitsOnly: Pattern = Pattern.compile("^\\d+$")
  val allNumericLine: Pattern = py("^[\\d\\s\\.,]+$")
  val hasLetter: Pattern = py("[а-яёa-z]")
  val hasCyr2: Pattern = Pattern.compile("[А-Яа-я]{2,}") // universal_parser.py:406 (no IGNORECASE)
  val hasLetter2: Pattern = py("[а-яёa-z]{2,}")
  val itogoLine: Pattern = py(Rules.itogoLine)
  val hasDigit: Pattern = Pattern.compile("\\d", Pattern.UNICODE_CHARACTER_CLASS)
  val techSpecDim: Pattern = py("\\d+[х×]\\d+")
  val techSpecUnit: Pattern = py("\\d+[кмлшт]")
  /** P6 unit cleanup `[^\w.]` — Python \w is Unicode (keeps Cyrillic). */
  val unitCleanup: Pattern = Pattern.compile("[^\\w\\.]", Pattern.UNICODE_CHARACTER_CLASS)
  val commercialTechPrefix: Pattern =
    Pattern.compile(Rules.commercialTechPrefix, Pattern.UNICODE_CHARACTER_CLASS) // no IGNORECASE in reference
  val startsWithLetter: Pattern = py("^[а-яёa-z]")
  val numericToken: Pattern = Pattern.compile("^[\\d\\.,]+$")

  val textPatterns: Seq[Pattern] = Seq(py(Rules.textP1), py(Rules.textP2), py(Rules.textP3))
  val invoicePatterns: Seq[Pattern] = Seq(py(Rules.invoiceP1))
  val commercialPatterns: Seq[Pattern] = Seq(py(Rules.commercialP1))
  val competitivePatterns: Seq[Pattern] =
    Seq(py(Rules.competitiveP1), py(Rules.competitiveP2), py(Rules.competitiveP3), py(Rules.competitiveP4))
  val universalPatterns: Seq[Pattern] = Seq(py(Rules.universalP1), py(Rules.universalP2))

  val productPatterns: Seq[Pattern] = Rules.productPatterns.map(py)
  val innPatterns: Seq[Pattern] = Rules.innPatterns.map(py)

  /** profile header compat patterns (supplier_profiles.py:298-299 etc.) */
  def profilePattern(p: String): Pattern =
    Pattern.compile(p, Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE | Pattern.UNICODE_CHARACTER_CLASS)

  /** re.search equivalent. */
  def search(p: Pattern, s: String): Boolean = p.matcher(s).find()
  /** re.match equivalent (anchored at start). */
  def matchAt(p: Pattern, s: String): Boolean = p.matcher(s).lookingAt()

  /** Named group or null if absent/unmatched. */
  def group(m: java.util.regex.Matcher, name: String): String =
    try m.group(name) catch { case _: IllegalArgumentException => null }
}
